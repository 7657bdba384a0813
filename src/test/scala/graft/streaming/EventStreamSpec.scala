package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkTestBase {

  test("streaming windowed counts equal the batch aggregation over the same data") {
    import spark.implicits._
    // the file-stream source wants a directory, not a bare parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val streamed = EventStream.runBounded(spark, dir, "evt_counts")
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = EventStream.windowedCounts(spark.read.parquet(dir))
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming exact dedup: one survivor per digest, digest set == batch") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(dir, "documents.parquet"))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id % 60)"))
    val q = EventStream.dedupStream(stream, "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("dedup_docs")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_docs").select($"digest").as[String].collect()
    val batchDigests = spark.read.parquet(dir)
      .select(graft.pipeline.TextAnalysis.fingerprintMd5($"text")).as[String]
      .collect().toSet
    assert(got.toSet == batchDigests)       // every distinct content survives
    assert(got.length == batchDigests.size) // exactly once each
  }

  test("sessionization groups events by gap") {
    import spark.implicits._
    // user 1: two sessions (gap 10_000 > 5_000); user 2: one session
    val events = Seq(
      (1L, 1000L), (1L, 2000L), (1L, 12000L),
      (2L, 500L), (2L, 1500L)).toDS()
    val out = EventStream.sessionize(events, gapMs = 5000L).collect()
    // only CLOSED sessions emit (append semantics): user 1's first session
    assert(out.toSeq == Seq(EventStream.SessionOut(1L, 2, 1000L)))
  }
}
