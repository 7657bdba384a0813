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
