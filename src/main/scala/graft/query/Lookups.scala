package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.graph.Page

/**
 * Point / prefix / random page lookups (SURVEY.md §2.6 O5–O7).
 *
 * The reference binary-searches a title-sorted mmap index
 * (`SegmentWikiGraphStore.kt:26-79`); Spark-first, the same physical design
 * is "pages persisted sorted by url" so Parquet min/max stats prune the scan
 * and `TakeOrderedAndProject` serves top-K without a global sort. Spark's
 * `UTF8String` ordering is unsigned-bytewise — the same collation as the
 * reference's comparator (`BufferWikiPage.java:134-154`), asserted in tests.
 */
object Lookups {

  /** Exact-url point lookup (O5; `WikiRoutes.kt:89-100`). */
  def point(pages: Dataset[Page], url: String): Option[Page] =
    pages.filter(col("url") === lit(url)).limit(1).collect().headOption

  /** Prefix wildcard top-K by url order (O6; `WikiRoutes.kt:74-87`,
    * UI cap 10 at `Main.kt:323`). Planned as TakeOrderedAndProject;
    * `startsWith` prunes row groups on url-sorted files. */
  def prefixTopK(pages: Dataset[Page], prefix: String, k: Int = 10): Seq[Page] = {
    import pages.sparkSession.implicits._
    pages.filter($"url".startsWith(prefix)).orderBy($"url").limit(k)
      .collect().toSeq
  }

  /** Deterministic pseudo-random page (O7; `WikiRoutes.kt:47-56`, seeded per
    * `Benchmarking.java:15-16`). Hash-order min = a uniform draw that needs
    * no global sort (TakeOrderedAndProject on the hash). */
  def randomPage(pages: Dataset[Page], seed: Long): Option[Page] = {
    import pages.sparkSession.implicits._
    pages.orderBy(xxhash64($"url", lit(seed)), $"url").limit(1)
      .collect().headOption
  }

  /** Benchmark summary statistics (A5; `Benchmarking.java:61-85` /
    * `Main.kt:360-384` Welford): exact built-ins. */
  def summaryStats(values: DataFrame, valueCol: String): DataFrame =
    values.agg(
      count(lit(1)).as("runs"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max"),
      avg(col(valueCol)).as("mean"),
      stddev_samp(col(valueCol)).as("stddev"),
      sum(col(valueCol)).as("sum"))
}
