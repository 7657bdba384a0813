package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Dictionary encoding: unique string keys → dense Long ids `[0, n)` in
 * global sort order of the key.
 *
 * The reference assigns dense int32 ids in first-seen order during its
 * single-threaded parse (`WikiProcessor.kt:36-48`); "first-seen" is not
 * reproducible under parallelism, so our normative order is the *sorted key
 * order* — a pure function of the key set, identical at any parallelism
 * (SURVEY.md §7.4 risk 1).
 *
 * Two implementations with identical output:
 *  - [[assignIdsSmall]]: `row_number() over (orderBy key)` — a single-partition
 *    window; only for tests/oracles.
 *  - [[assignIds]]: the scale path. Range-repartition by key, sort within
 *    partitions, take per-partition counts (tiny driver collect), prefix-sum
 *    offsets, then `id = offset(partition) + local_index`. No global sort
 *    bottleneck, no RDD: local index comes from `monotonically_increasing_id`
 *    (= partitionId << 33 | index) on the sorted partitions.
 */
object Dictionary {

  private val MonoMask = (1L << 33) - 1

  /** Scale path. `df` must have unique values in `key`. Appends `id`.
    * Eager: materializes via localCheckpoint and releases the internal
    * sort cache before returning (callers needing to defer the release —
    * e.g. to commit to a table instead — use [[assignIdsWithHandle]]). */
  def assignIds(df: DataFrame, key: String, idCol: String = "id"): DataFrame = {
    val (out, release) = assignIdsWithHandle(df, key, idCol)
    val res = out.localCheckpoint(true)
    release()
    res
  }

  /** As [[assignIds]], also returning a release hook that unpersists the
    * internal cached sort — call it after the OUTPUT has been materialized
    * (checkpoint/write), or the full keyed table stays cached. Recompute
    * after release is still id-stable: the range partitioner's sampling
    * seed is a deterministic function of the RDD, so re-evaluation
    * reproduces identical bounds and therefore identical ids. */
  def assignIdsWithHandle(df: DataFrame, key: String, idCol: String = "id")
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val local = df
      .repartitionByRange(parts, col(key))
      .sortWithinPartitions(key)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id().cast("long"))
      // one materialization serves both the count pass and the id pass —
      // without this, the range partitioner could re-sample between passes
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts: Array[(Long, Long)] = local.groupBy($"__pid").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    val offsetsDf = broadcast(
      spark.createDataset(offsets.toSeq).toDF("__pid", "__offset"))
    val out = local
      .join(offsetsDf, "__pid")
      .withColumn(idCol, ($"__mono".bitwiseAND(MonoMask)) + $"__offset")
      .drop("__pid", "__mono", "__offset")
    (out, () => { local.unpersist(); () })
  }

  /** Test-scale exact variant: `row_number` window (single partition). */
  def assignIdsSmall(df: DataFrame, key: String, idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(idCol,
      row_number().over(Window.orderBy(col(key))).cast("long") - 1L)
  }
}
