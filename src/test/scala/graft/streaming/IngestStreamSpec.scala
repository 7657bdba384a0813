package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ingest.SynthCorpus
import graft.tables.IcebergLite

/** Streaming link ingest: streamed extraction must equal the batch
  * extraction over the same pages, micro-batch commits must be idempotent,
  * and new input files must land as incremental fast-appends. */
class IngestStreamSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-ingest").toString

  test("streamed == batch extraction; replays skipped; new files appended") {
    import spark.implicits._
    val inputDir = tmp()
    val wh = tmp()
    SynthCorpus.generate(spark, 300, seed = 42L).toDF()
      .write.mode("append").parquet(inputDir)

    val q1 = IngestStream.run(spark, inputDir, wh)
    q1.get.awaitTermination()

    val cat = new IcebergLite(wh)
    def tableRows() = cat.read(spark, "links_raw")
      .selectExpr("url", "coalesce(redirect_to, '∅')",
        "explode_outer(links) as link")
      .as[(String, String, String)].collect().toSet
    val batchRows = IngestStream.extracted(spark.read.parquet(inputDir))
      .selectExpr("url", "coalesce(redirect_to, '∅')",
        "explode_outer(links) as link")
      .as[(String, String, String)].collect().toSet
    assert(tableRows() == batchRows && batchRows.nonEmpty)

    // replay the whole stream: the checkpoint knows every input file is
    // processed — no new snapshot, identical contents
    val snaps = cat.snapshots("links_raw").size
    val q2 = IngestStream.run(spark, inputDir, wh)
    q2.get.awaitTermination()
    assert(cat.snapshots("links_raw").size == snaps)
    assert(tableRows() == batchRows)

    // new crawl segment lands → exactly its rows are appended (fast append:
    // previous files retained in the new manifest)
    SynthCorpus.generate(spark, 80, seed = 7L).toDF()
      .write.mode("append").parquet(inputDir)
    val q3 = IngestStream.run(spark, inputDir, wh)
    q3.get.awaitTermination()
    val after = tableRows()
    val batchAfter = IngestStream.extracted(spark.read.parquet(inputDir))
      .selectExpr("url", "coalesce(redirect_to, '∅')",
        "explode_outer(links) as link")
      .as[(String, String, String)].collect().toSet
    assert(after == batchAfter)
    assert(batchRows.subsetOf(after) && after.size > batchRows.size)
    val cur = cat.currentSnapshot("links_raw").get
    assert(cur.parentId >= 0, "incremental commit must chain to the parent")
  }

  test("auto-compaction folds small files mid-stream; batchId guard survives it") {
    import spark.implicits._
    val inputDir = tmp()
    val wh = tmp()
    val cat = new IcebergLite(wh)
    // six crawl segments drained one at a time: each run() is one
    // fast-append micro-batch, each appending spark.sql.shuffle.partitions-
    // bounded small files — past compactOver the sink folds them in-stream
    val compactOver = 4
    for (seed <- 1 to 6) {
      SynthCorpus.generate(spark, 40, seed = seed.toLong).toDF()
        .write.mode("append").parquet(inputDir)
      IngestStream.run(spark, inputDir, wh, compactOver = compactOver)
        .get.awaitTermination()
    }
    val cur = cat.currentSnapshot("links_raw").get
    assert(cur.files.size <= compactOver + 1,
      s"auto-compaction never fired: ${cur.files.size} files")
    assert(cat.snapshots("links_raw")
      .exists(_.properties.contains("compactedFromSnapshot")))
    // logical state: table == batch extraction over all six segments
    val table = cat.read(spark, "links_raw")
      .selectExpr("url", "coalesce(redirect_to, '∅')", "explode_outer(links) as link")
      .as[(String, String, String)].collect().toSet
    val batch = IngestStream.extracted(spark.read.parquet(inputDir))
      .selectExpr("url", "coalesce(redirect_to, '∅')", "explode_outer(links) as link")
      .as[(String, String, String)].collect().toSet
    assert(table == batch && batch.nonEmpty)
    // the batchId idempotence marker survived compaction: a full replay
    // (fresh files already checkpointed) appends nothing
    val snaps = cat.snapshots("links_raw").size
    IngestStream.run(spark, inputDir, wh, compactOver = compactOver)
      .get.awaitTermination()
    assert(cat.snapshots("links_raw").size == snaps)
    assert(cat.currentSnapshot("links_raw").get.properties.contains("batchId"))
  }

  test("removed checkpoint (batch-id regression) fails loudly on the link sink too") {
    import spark.implicits._
    val inputDir = tmp()
    val wh = tmp()
    for (seed <- 1 to 2) { // batchIds 0 and 1 recorded on the table
      SynthCorpus.generate(spark, 40, seed = seed.toLong).toDF()
        .write.mode("append").parquet(inputDir)
      IngestStream.run(spark, inputDir, wh).get.awaitTermination()
    }
    val cat = new IcebergLite(wh)
    assert(cat.currentSnapshot("links_raw").get.properties("batchId") == "1")
    val ckpt = java.nio.file.Paths.get(wh, "_checkpoints", "links_raw")
    java.nio.file.Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IngestStream.run(spark, inputDir, wh).get.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("batch-id regression"))),
      s"expected a loud batch-id regression failure, got: ${ex.getMessage}")
    assert(cat.currentSnapshot("links_raw").get.properties("batchId") == "1")
  }

  test("empty or missing input dir starts no query and commits nothing") {
    val wh = tmp()
    assert(IngestStream.run(spark, tmp(), wh).isEmpty)           // empty dir
    assert(IngestStream.run(spark, tmp() + "/nope", wh).isEmpty) // missing dir
    assert(new IcebergLite(wh).snapshots("links_raw").isEmpty)
  }
}
