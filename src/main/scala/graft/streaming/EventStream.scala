package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Structured Streaming surface. The reference is strictly batch
 * (SURVEY.md §2.10 — convert once, query a static snapshot), so nothing here
 * is required for parity; this module exists because a web-scale ingest
 * pipeline replays crawl logs incrementally. Same transforms as the batch
 * path: `readStream` over the events/pages_raw schema, watermarked windowed
 * aggregation, and `flatMapGroupsWithState` sessionization.
 */
object EventStream {

  /** Watermarked tumbling-window counts per event type. Works identically
    * over a bounded parquet directory (test) and an unbounded source. */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → event-time type
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  case class SessionState(count: Long, firstTs: Long, lastTs: Long)
  case class SessionOut(user_id: Long, events: Long, durationMs: Long)

  /** Per-user sessionization with processing-timeout state — the custom
    * stateful-operator escape hatch (`flatMapGroupsWithState`). */
  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.getOrElse(SessionState(0, Long.MaxValue, Long.MinValue))
          rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
            if (st.count > 0 && ts - st.lastTs > gapMs) {
              out += SessionOut(user, st.count, st.lastTs - st.firstTs)
              st = SessionState(0, Long.MaxValue, Long.MinValue)
            }
            st = SessionState(st.count + 1, math.min(st.firstTs, ts), math.max(st.lastTs, ts))
          }
          state.update(st)
          out.iterator
      }
  }

  /**
   * Streaming exact dedup over a document stream: the FIRST arrival per
   * content digest survives; later exact duplicates are dropped by the
   * state-backed `dropDuplicatesWithinWatermark`. The streaming counterpart
   * of [[graft.pipeline.Dedup.exact]] — a crawl pipeline dedups segments as
   * they land instead of re-scanning the corpus. The watermark bounds the
   * dedup state (at web scale unbounded digest state would OOM an executor;
   * re-crawls of the same content arrive within the replay horizon).
   */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "24 hours"): DataFrame =
    docs.select(col(idCol), col(tsCol).cast("timestamp").as(tsCol),
        graft.pipeline.TextAnalysis.fingerprintMd5(col(textCol)).as("digest"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Run a bounded streaming query over a parquet dir into a memory sink;
    * returns the collected result (test/demo harness). */
  def runBounded(spark: SparkSession, parquetDir: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(parquetDir).schema
    val stream = spark.readStream.schema(schema).parquet(parquetDir)
    // complete mode: on bounded input the watermark never passes the last
    // window, so append mode would hold every window back
    val q: StreamingQuery = windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
