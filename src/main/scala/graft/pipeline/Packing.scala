package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sequence packing for pre-training pipelines: documents are concatenated
 * into one token stream in a stable order and cut every `budget` tokens
 * (the standard concat-then-chunk packing); a document's pack is the chunk
 * its first token lands in. The primitive under it is a DISTRIBUTED global
 * prefix sum — the naive formulation (`sum over (order by id)` with no
 * partition key) collapses the whole corpus into ONE window task, which is
 * exactly the plan that cannot survive 100 TB. Here it is two-phase, the
 * classic scan-then-offset shape: range-shuffle on the order key, an
 * in-partition running sum (each partition its own window task), then each
 * partition's rows are shifted by the broadcast prefix of the partition
 * totals (at most `shuffle.partitions` longs through the driver). The
 * result is independent of where the range boundaries fall, so it is
 * deterministic even though `repartitionByRange` samples its bounds — and
 * the DuckDB oracle checks it against the single-stream SQL window.
 */
object Packing {

  /** Phase one as a lazy plan — the range shuffle plus a NARROW
    * per-partition running-sum scan (`sortWithinPartitions` + one
    * `mapPartitions` pass; the textbook per-partition imperative case).
    * A keyed-window formulation (`partitionBy(spark_partition_id())`)
    * reads nicer but plans a SECOND full exchange: EnsureRequirements
    * cannot know rows are already co-located by their own partition id,
    * so it hash-shuffles on `_pid` again — at 10^12 rows that doubles the
    * shuffled bytes. This shape has exactly ONE exchange (the range one)
    * and no window operator at all; factored so the plan audit can gate
    * that before [[withCumsum]]'s materialization hides it. */
  private[graft] def localCumsumPlan(df: DataFrame, orderCol: String,
      valueCol: String, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val base = df
      .select(col(orderCol),
        coalesce(col(valueCol).cast("long"), lit(0L)).as(valueCol))
      .repartitionByRange(p, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    if (base.schema.head.dataType == org.apache.spark.sql.types.LongType) {
      // the common case (the order key is an id): primitive tuple encoders
      // keep the per-row conversion codegen'd and cheap — measured ~2× off
      // the scan-phase wall at 50M rows vs the generic Row path below
      base.as[(Long, Long)].mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var acc = 0L
        rows.map { case (o, v) => acc += v; (o, v, pid, acc) }
      }.toDF(orderCol, valueCol, "_pid", "_local")
    } else {
      val outSchema = org.apache.spark.sql.types.StructType(base.schema.fields
        :+ org.apache.spark.sql.types.StructField("_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false)
        :+ org.apache.spark.sql.types.StructField("_local",
          org.apache.spark.sql.types.LongType, nullable = false))
      base.mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var acc = 0L
        rows.map { r =>
          acc += r.getLong(1)
          org.apache.spark.sql.Row(r.get(0), r.getLong(1), pid, acc)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    }
  }

  /**
   * Global running total of `valueCol` in `orderCol` order (inclusive of
   * the current row), as (orderCol, valueCol, `out`) — computed on this
   * narrow projection so the materialization between the two phases never
   * carries document bytes; join the result back on the unique order key
   * if the full rows are needed. `orderCol` must be unique and non-null
   * (it is the tie-break that makes "the" prefix sum well-defined).
   *
   * MEMORY LIFETIME: the phase-one output is persisted (columnar
   * MEMORY_AND_DISK — two separate actions would otherwise re-plan the
   * range exchange and sample DIFFERENT boundaries, desynchronizing the
   * offsets from the rows; an eager row-object localCheckpoint here cost
   * 13.7 s of a 15 s call at 50M rows, the columnar cache ~1 s). The cache
   * stays pinned until the returned frame's last reference drops and the
   * ContextCleaner reclaims it — consume or write the result promptly
   * (measured: two retained 50M-row checkpoints turned a 0.8 s call into
   * 28 s of eviction churn on a 16 g heap).
   */

  def withCumsum(df: DataFrame, orderCol: String, valueCol: String,
      out: String = "cumsum", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one pass computes BOTH the in-partition running sums and (as each
    // partition's max) the totals the offsets need; cached so the two
    // consumers cannot see different range boundaries (the totals collect
    // below forces the materialization)
    val local = localCumsumPlan(df, orderCol, valueCol, partitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = local.groupBy($"_pid").agg(max($"_local").as("t"))
      .as[(Int, Long)].collect().sortBy(_._1) // ≤ p rows — driver-bounded
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offExpr = coalesce(
      element_at(typedLit(offsets), $"_pid"), lit(0L))
    local.withColumn(out, $"_local" + offExpr).drop("_pid", "_local")
  }

  /**
   * Concat-then-chunk pack assignment: (idCol, `out`) where `out` is the
   * zero-based chunk of size `budget` that the document's FIRST token
   * falls in, concatenating documents in ascending `idCol` order. Long
   * documents span chunks (their tail tokens belong to later packs — the
   * pack id is the start chunk, as in stream packing); empty documents
   * inherit the current position. Integral arithmetic end-to-end.
   */
  def packByBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, out: String = "pack_id", partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    withCumsum(df, idCol, tokenCol, "_cum", partitions)
      .select(col(idCol),
        expr(s"(_cum - cast(`$tokenCol` as bigint)) div ${budget}L").as(out))
  }
}
