package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling and splitting for training-data
 * pipelines. All of it hangs off ONE primitive: a stable bucket derived
 * from the md5 of the row's id rendered as a decimal string. Unlike
 * `df.sample()`/`rand()` (seeded per run and sensitive to partitioning),
 * a row's bucket never changes — across runs, engines, partition layouts,
 * or corpus growth — which is what a 100 TB pipeline needs from its
 * train/val/test split and its corpus-mix ratios: re-running the pipeline
 * after an append re-selects exactly the same prior rows, so downstream
 * caches and eval sets stay valid, and the split can be recomputed
 * anywhere (the DuckDB oracles reproduce it verbatim in SQL).
 *
 * Plan shape: a scalar projection over the scan — no shuffle, no state,
 * codegen'd end-to-end (md5/substring/conv are all built-in expressions);
 * a sample() filter prunes rows at the scan boundary before anything
 * wider runs.
 */
object Sampling {

  /** Number of distinct hash buckets: the first 4 hex chars of the md5. */
  val Buckets = 65536

  /** Stable bucket in [0, of) for an id column: first 4 md5-hex chars of
    * the id's decimal rendering, mod `of`. Mirrors the SQL
    * `CAST('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 4) AS INTEGER)
    * % of` exactly (md5 hex is lowercase in both engines). A non-empty
    * `salt` prefixes the hashed string (`md5('salt' || id)` in SQL) and
    * yields an INDEPENDENT draw — distinct pipeline decisions (the split,
    * each corpus-mix, a debug sample) must each use their own salt, or the
    * "10% sample" is exactly the head of the train split rather than an
    * unbiased draw. */
  def hashBucket(id: Column, of: Int = Buckets, salt: String = ""): Column = {
    require(of > 0 && of <= Buckets, s"of must be in (0, $Buckets]")
    val rendered =
      if (salt.isEmpty) id.cast("string")
      else concat(lit(salt), id.cast("string"))
    (conv(substring(md5(rendered), 1, 4), 16, 10)
      .cast("int") % of).as("bucket")
  }

  /** Keep the deterministic `keep/of` fraction of rows: bucket < keep.
    * Same rows every run and after any append (old rows' membership never
    * changes — new rows just land in their own buckets). */
  def sample(df: DataFrame, idCol: String, keep: Int, of: Int = Buckets): DataFrame = {
    require(keep >= 0 && keep <= of, "keep must be in [0, of]")
    df.where(hashBucket(col(idCol), of) < keep)
  }

  /** Corpus mixing: keep a DIFFERENT deterministic fraction per group —
    * the per-source/per-language down- and up-weighting step of a training
    * mix (e.g. keep all of `en`, half of `de`, none of a blocked source).
    * `keeps` maps group value → kept buckets in [0, of]; unlisted groups
    * get `defaultKeep` (0 = drop, the safe default for an explicit mix).
    * Same determinism contract as [[sample]], and the same plan shape: the
    * keeps map folds into a CASE expression, so the whole mix is one
    * codegen'd filter over the scan — no shuffle, no join, regardless of
    * how many groups the mix names. */
  def sampleByGroup(df: DataFrame, idCol: String, groupCol: String,
      keeps: Map[String, Int], defaultKeep: Int = 0, of: Int = Buckets,
      salt: String = ""): DataFrame = {
    require((defaultKeep +: keeps.values.toSeq).forall(k => k >= 0 && k <= of),
      "every keep must be in [0, of]")
    val keepExpr = keeps.toSeq.sortBy(_._1)
      .foldRight(lit(defaultKeep)) { case ((g, k), rest) =>
        when(col(groupCol) === g, k).otherwise(rest)
      }
    df.where(hashBucket(col(idCol), of, salt) < keepExpr)
  }

  /** Split label from bucket CUT POINTS (explicit, not float weights — the
    * caller owns the rounding): `cuts` are (label, upperBound) pairs over
    * buckets in [0, of), ascending; rows at or past the last cut get
    * `default`. E.g. `splitLabel($"doc_id", Seq("train" -> 52429,
    * "val" -> 58982), "test")` ≈ 80/10/10. */
  def splitLabel(id: Column, cuts: Seq[(String, Int)], default: String,
      of: Int = Buckets): Column = {
    require(cuts.nonEmpty && cuts.map(_._2) == cuts.map(_._2).sorted,
      "cuts must be ascending")
    require(cuts.last._2 <= of, "cut beyond bucket space")
    val b = hashBucket(id, of)
    cuts.foldRight(lit(default)) { case ((label, cut), rest) =>
      when(b < cut, label).otherwise(rest)
    }.as("split")
  }
}
