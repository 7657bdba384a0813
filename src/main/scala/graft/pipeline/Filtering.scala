package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Quality gating — the filter stage a training-data shipping pipeline runs
 * FIRST, before the expensive dedup/decontamination machinery sees a byte:
 * Gopher/C4-style per-document signals ([[TextAnalysis.qualityScore]],
 * [[TextAnalysis.repetitionFraction]], [[TextAnalysis.languageId]]) composed
 * into one keep/drop decision.
 *
 * Physical shape, in cost order: the quality and repetition predicates are
 * per-row scalars folded into ONE codegen'd filter over the scan — zero
 * shuffle, and at 100 TB they do their job exactly where it matters, before
 * anything wide. The language restriction is the one non-scalar signal
 * (marker-token argmax = explode + broadcast join + two-level agg), so it
 * runs ONLY over the scalar-pass survivors and rejoins as a left-semi on the
 * id key — ids-only through the shuffle, never document bytes.
 */
object Filtering {

  /**
   * @param minQuality    keep docs with qualityScore ≥ this (0.0 keeps all)
   * @param maxRepetition keep docs with repetitionFraction(repN) ≤ this
   *                      (1.0 keeps all)
   * @param repN          n-gram order for the repetition signal
   * @param langs         keep docs whose predicted language is in this set;
   *                      empty = no language restriction (languageId never
   *                      runs — the pipeline stays scalar-only)
   * @return the surviving docs, all original columns
   */
  def qualityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.0,
      maxRepetition: Double = 1.0,
      repN: Int = 3,
      langs: Seq[String] = Nil): DataFrame = {
    require(minQuality >= 0.0 && minQuality <= 1.0,
      s"minQuality must be in [0,1], got $minQuality")
    require(maxRepetition >= 0.0 && maxRepetition <= 1.0,
      s"maxRepetition must be in [0,1], got $maxRepetition")
    val text = col(textCol)
    val scalarPass = docs
      .filter(TextAnalysis.qualityScore(text) >= minQuality)
      .filter(TextAnalysis.repetitionFraction(text, repN) <= maxRepetition)
    if (langs.isEmpty) scalarPass
    else {
      val keepIds = TextAnalysis.languageId(scalarPass, idCol, textCol)
        .filter(col("lang_pred").isin(langs.map(lit(_)): _*))
        .select(col(idCol))
      scalarPass.join(keepIds, Seq(idCol), "left_semi")
    }
  }
}
