package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling for hub vertices (north rule; SURVEY.md §4.1).
 * AQE's skew-join splitting is the runtime backstop; these are the
 * plan-level tools for when the skew is KNOWN (power-law web graphs):
 *
 *  - [[saltedCount]]: two-phase count for heavy-hitter keys
 *  - [[skewAwareJoin]]: join a skewed fact side against a per-key-unique
 *    dimension side by routing hub keys through a broadcast join and the
 *    long tail through a normal shuffle join — the hub rows never
 *    concentrate on one reducer
 */
object Skew {

  /** Two-phase (salted) count by `key`: pre-aggregate per (key, salt) shard,
    * then merge. Identical result to a plain groupBy-count; bounds any
    * single task's group size at count/saltBuckets. */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(key)), lit(saltBuckets.toLong)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__c"))
      .groupBy(col(key)).agg(sum("__c").as("cnt"))

  /**
   * Join `fact` (many rows per key, possibly very skewed on `factKey`)
   * against `dim` (exactly one row per `dimKey`):
   *
   *   hubs    = keys whose fact frequency ≥ hubThreshold (tiny set)
   *   fact_h ⋈ broadcast(dim_h)   — hub rows stay put, dim rows replicate
   *   fact_t ⋈ dim_t              — tail takes the normal shuffle path
   *
   * Equivalent to `fact.join(dim, factKey === dimKey)` (inner), verified in
   * tests on the hub fixture.
   */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, hubThreshold: Long = 100000L): DataFrame = {
    val hubs = saltedCount(fact, factKey).filter(col("cnt") >= hubThreshold)
      .select(col(factKey).as("__hub"))
    val factH = fact.join(broadcast(hubs), col(factKey) === col("__hub"), "left_semi")
    val factT = fact.join(broadcast(hubs), col(factKey) === col("__hub"), "left_anti")
    val dimH = dim.join(broadcast(hubs), col(dimKey) === col("__hub"), "left_semi")
    val joined =
      factH.join(broadcast(dimH), col(factKey) === col(dimKey)) // hubs: broadcast
        .unionByName(
          factT.join(dim, col(factKey) === col(dimKey)))        // tail: shuffle
    joined
  }
}
