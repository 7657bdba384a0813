package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.pipeline.Dedup
import graft.tables.IcebergLite
import org.apache.spark.sql.functions._

/** Streaming text-dedup-index maintenance: micro-batches shingle at the
  * committed parameters, land as per-table idempotent fast appends, and the
  * incremental pair operators price only their own batch afterwards. */
class DedupStreamSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-dedupstream").toString

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("streamed appends == batch appends across all three pillars; replay skipped") {
    import spark.implicits._
    val wh = tmp()
    val inputDir = tmp()
    val seed = docs.filter($"doc_id" < 250)
    Dedup.buildFingerprintIndex(seed, "doc_id", "text", wh, k = 16, w = 8)
    Dedup.buildShingleIndex(seed, "doc_id", "text", wh, n = 3)
    Dedup.buildMinhashIndex(seed, "doc_id", "text", wh, n = 3, k = 8, bands = 4)
    val cat = new IcebergLite(wh)

    // no input yet: clean no-op
    assert(DedupStream.run(spark, tmp() + "/nope", wh,
      fpTable = "fp_index", shingleTable = "shingle_index",
      minhashTable = "minhash_index").isEmpty)

    // two crawl segments land and stream in, one run per segment
    for (lo <- Seq(250, 375)) {
      docs.filter($"doc_id" >= lo && $"doc_id" < lo + 125)
        .write.mode("append").parquet(inputDir)
      DedupStream.run(spark, inputDir, wh,
        fpTable = "fp_index", shingleTable = "shingle_index",
        minhashTable = "minhash_index").get.awaitTermination()
    }
    for (t <- Seq("fp_index", "shingle_index", "minhash_index",
        "minhash_index_postings"))
      assert(cat.currentSnapshot(t).get.properties("batchId") == "1", t)

    // streamed state == one-shot batch appends of the same rows
    val wh2 = tmp()
    Dedup.buildFingerprintIndex(seed, "doc_id", "text", wh2, k = 16, w = 8)
    Dedup.buildShingleIndex(seed, "doc_id", "text", wh2, n = 3)
    Dedup.buildMinhashIndex(seed, "doc_id", "text", wh2, n = 3, k = 8, bands = 4)
    val rest = docs.filter($"doc_id" >= 250)
    Dedup.appendToFingerprintIndex(rest, "doc_id", "text", wh2)
    Dedup.appendToShingleIndex(rest, "doc_id", "text", wh2)
    Dedup.appendToMinhashIndex(rest, "doc_id", "text", wh2)
    val cat2 = new IcebergLite(wh2)
    def rows(c: IcebergLite, t: String, cols: Seq[String]) =
      c.read(spark, t).select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).toSet
    assert(rows(cat, "fp_index", Seq("id", "fp")) ==
      rows(cat2, "fp_index", Seq("id", "fp")))
    assert(rows(cat, "shingle_index", Seq("id", "shingle")) ==
      rows(cat2, "shingle_index", Seq("id", "shingle")))
    assert(rows(cat, "shingle_index_sizes", Seq("id", "sz")) ==
      rows(cat2, "shingle_index_sizes", Seq("id", "sz")))
    assert(rows(cat, "minhash_index", Seq("id", "bk")) ==
      rows(cat2, "minhash_index", Seq("id", "bk")))
    assert(rows(cat, "minhash_index_postings", Seq("id", "shingle")) ==
      rows(cat2, "minhash_index_postings", Seq("id", "shingle")))

    // replay: checkpoint knows every file — no new snapshots anywhere
    val snapCounts = Seq("fp_index", "shingle_index", "minhash_index")
      .map(t => cat.snapshots(t).size)
    DedupStream.run(spark, inputDir, wh,
      fpTable = "fp_index", shingleTable = "shingle_index",
      minhashTable = "minhash_index").get.awaitTermination()
    assert(Seq("fp_index", "shingle_index", "minhash_index")
      .map(t => cat.snapshots(t).size) == snapCounts)

    // the streamed-in corpus serves the incremental operators exactly: a
    // NEW batch prices only itself and the union matches from-scratch
    val extra = Seq((900001L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val incr = Dedup.jaccardPairsIncremental(extra, "doc_id", "text", wh,
        threshold = 0.2).select($"a", $"b").as[(Long, Long)].collect().toSet
    val scratch = Dedup.jaccardPairs(
        docs.select($"doc_id", $"text").union(extra), "doc_id", "text",
        n = 3, threshold = 0.2)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(incr == scratch.filter(p => p._1 == 900001L || p._2 == 900001L))
  }

  test("removed checkpoint (batch-id regression) fails loudly; per-table guards hold") {
    import spark.implicits._
    val wh = tmp()
    val inputDir = tmp()
    Dedup.buildShingleIndex(docs.filter($"doc_id" < 300), "doc_id", "text", wh, n = 3)
    for (lo <- Seq(300, 400)) {
      docs.filter($"doc_id" >= lo && $"doc_id" < lo + 100)
        .write.mode("append").parquet(inputDir)
      DedupStream.run(spark, inputDir, wh, shingleTable = "shingle_index")
        .get.awaitTermination()
    }
    val cat = new IcebergLite(wh)
    assert(cat.currentSnapshot("shingle_index").get.properties("batchId") == "1")
    val ckpt = java.nio.file.Paths.get(wh, "_checkpoints", "dedup_shingle_index")
    java.nio.file.Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      DedupStream.run(spark, inputDir, wh, shingleTable = "shingle_index")
        .get.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("batch-id regression"))),
      s"expected a loud batch-id regression failure, got: ${ex.getMessage}")
    assert(cat.currentSnapshot("shingle_index").get.properties("batchId") == "1")
  }

  test("streaming housekeeping bounds files and snapshots; postings stay exact") {
    import spark.implicits._
    val wh = tmp()
    val inputDir = tmp()
    Dedup.buildShingleIndex(docs.filter($"doc_id" < 200), "doc_id", "text", wh,
      n = 3, buckets = 4)
    val cat = new IcebergLite(wh)
    for (lo <- Seq(200, 260, 320, 380, 440)) {
      docs.filter($"doc_id" >= lo && $"doc_id" < lo + 60)
        .write.mode("append").parquet(inputDir)
      DedupStream.run(spark, inputDir, wh, shingleTable = "shingle_index",
        compactOver = 6, expireKeep = 2).get.awaitTermination()
    }
    val snap = cat.currentSnapshot("shingle_index").get
    assert(snap.files.size <= 10, s"file growth unbounded: ${snap.files.size}")
    assert(cat.snapshots("shingle_index").size <= 4,
      s"snapshot log unbounded: ${cat.snapshots("shingle_index").size}")
    assert(snap.properties("bucketCol") == "shingle" &&
      snap.properties.contains("batchId"))
    val got = cat.read(spark, "shingle_index").count()
    val want = Dedup.docShingles(docs, "doc_id", "text", 3).count()
    assert(got == want)
  }
}
