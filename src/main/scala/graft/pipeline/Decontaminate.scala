package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark/eval-set decontamination: find (and drop) corpus documents that
 * share word n-gram shingles with any document of an evaluation set — the
 * standard n-gram-overlap contamination check a pre-training pipeline runs
 * before the corpus ships. Reuses the dedup ladder's shingle kernel
 * ([[Dedup.docShingles]]) so the contamination gram space is the same one
 * the oracles mirror in SQL.
 *
 * Scale shape: the eval set is TINY relative to the corpus (benchmarks are
 * thousands of rows against 10^12 documents), so its shingles are
 * explicitly `broadcast()` — the corpus side streams through a broadcast
 * hash join straight off its scan with NO shuffle, and only the matching
 * (doc, eval) rows — a vanishing fraction — reach the counting aggregate.
 * The end-cap anti-join ships ids only, never document bytes.
 */
object Decontaminate {

  /** (id, eval_id, common) for corpus docs sharing ≥ `minShared` DISTINCT
    * word `n`-gram shingles with an eval doc (`common` is that count;
    * distinctness is per-doc inside the shingle kernel, so a plain count
    * over the join is already the distinct-intersection size). Corpus rows
    * whose id also appears in the eval set are self-matches, not
    * contamination — pass a corpus already excluding them, or filter the
    * pairs; this function does not assume the id spaces are disjoint. */
  def contaminationPairs(corpus: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int = 3, minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, "minShared must be ≥ 1")
    val corpusSh = Dedup.docShingles(corpus, idCol, textCol, n)
    val evalSh = Dedup.docShingles(eval, evalIdCol, evalTextCol, n)
      .withColumnRenamed("id", "eval_id")
    corpusSh.join(broadcast(evalSh), "shingle")
      .groupBy(col("id"), col("eval_id"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minShared)
  }

  /** The corpus with every contaminated document dropped (left-anti on the
    * contaminated id set — ids only cross the wire). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int = 3, minShared: Long = 1L): DataFrame = {
    val bad = contaminationPairs(corpus, idCol, textCol,
        eval, evalIdCol, evalTextCol, n, minShared)
      .select(col("id")).distinct()
    corpus.join(bad, corpus(idCol) === bad("id"), "left_anti")
  }
}
