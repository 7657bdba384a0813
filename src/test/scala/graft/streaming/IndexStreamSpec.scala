package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.pipeline.Similarity
import graft.tables.IcebergLite
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance: micro-batches assign with the frozen
  * committed quantizer, land as idempotent fast appends, and are probe-able
  * immediately; replays are skipped. */
class IndexStreamSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-idxstream").toString

  test("streamed appends == batch appends; frozen quantizer; replay skipped") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val wh = tmp()
    val inputDir = tmp()

    // seed index over the first 300 vectors
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      wh, nlist = 8)
    val trained = Similarity.trainInvocations.get()
    val cat = new IcebergLite(wh)

    // no input yet: clean no-op
    assert(IndexStream.run(spark, tmp() + "/nope", wh).isEmpty)

    // two crawl segments land and stream in, one run per segment
    emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
      .write.mode("append").parquet(inputDir)
    IndexStream.run(spark, inputDir, wh).get.awaitTermination()
    emb.filter($"vec_id" >= 400)
      .write.mode("append").parquet(inputDir)
    IndexStream.run(spark, inputDir, wh).get.awaitTermination()

    assert(Similarity.trainInvocations.get() == trained,
      "streaming maintenance must never retrain")
    val snap = cat.currentSnapshot("ann_ivf_cells").get
    assert(snap.rowCount == 500 && snap.properties.contains("batchId"))
    assert(snap.properties("nlist") == "8", "build params survive streaming appends")
    assert(snap.fileStats.size == snap.files.size, "stats chain through appends")

    // streamed state == one-shot batch append of the same rows
    val wh2 = tmp()
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      wh2, nlist = 8)
    Similarity.appendToIvfIndex(emb.filter($"vec_id" >= 300), "vec_id", "embedding", wh2)
    val a = new IcebergLite(wh).read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    val b = new IcebergLite(wh2).read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    assert(a == b && a.size == 500)

    // replay: checkpoint knows every file — no new snapshot, same rows
    val snaps = cat.snapshots("ann_ivf_cells").size
    IndexStream.run(spark, inputDir, wh).get.awaitTermination()
    assert(cat.snapshots("ann_ivf_cells").size == snaps)

    // the streamed-in vectors are probe-able through the committed index
    val top = Similarity.ivfTopKIndexed(spark, wh, Seq(450L), k = 3, nprobe = 4)
    assert(top.count() == 3)
  }

  test("removed checkpoint (batch-id regression) fails loudly instead of dropping data") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val wh = tmp()
    val inputDir = tmp()
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      wh, nlist = 8)
    for (lo <- Seq(300, 400)) { // batchIds 0 and 1 recorded on the table
      emb.filter($"vec_id" >= lo && $"vec_id" < lo + 100)
        .write.mode("append").parquet(inputDir)
      IndexStream.run(spark, inputDir, wh).get.awaitTermination()
    }
    val cat = new IcebergLite(wh)
    assert(cat.currentSnapshot("ann_ivf_cells").get.properties("batchId") == "1")
    // checkpoint vanishes while the table keeps its high-water mark: the
    // restarted stream re-reads everything as batch 0 — before the guard,
    // the `>= batchId` skip would silently drop every batch until the new
    // counter caught up
    val ckpt = java.nio.file.Paths.get(wh, "_checkpoints", "ann_ivf")
    java.nio.file.Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IndexStream.run(spark, inputDir, wh).get.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("batch-id regression"))),
      s"expected a loud batch-id regression failure, got: ${ex.getMessage}")
    // and nothing was silently appended by the failed restart
    assert(cat.currentSnapshot("ann_ivf_cells").get.properties("batchId") == "1")
  }

  test("retention knob: snapshots bounded after in-stream compaction; probes and replay survive") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val wh = tmp()
    val inputDir = tmp()
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 200), "vec_id", "embedding",
      wh, nlist = 8)
    val cat = new IcebergLite(wh)
    for (lo <- Seq(200, 250, 300, 350, 400, 450)) {
      emb.filter($"vec_id" >= lo && $"vec_id" < lo + 50)
        .write.mode("append").parquet(inputDir)
      IndexStream.run(spark, inputDir, wh, compactOver = 8, expireKeep = 2)
        .get.awaitTermination()
    }
    val snaps = cat.snapshots("ann_ivf_cells")
    assert(snaps.size <= 4,
      s"retention must bound the snapshot log, got ${snaps.size}")
    // the id sidecar fast-appends in lockstep — its log is bounded too
    assert(cat.snapshots("ann_ivf_ids").size < 7,
      s"sidecar log unbounded: ${cat.snapshots("ann_ivf_ids").size}")
    val cur = cat.currentSnapshot("ann_ivf_cells").get
    assert(cur.rowCount == 500)
    // the guard, the build params, and the stats chain survive expiry
    assert(cur.properties.contains("batchId") && cur.properties("nlist") == "8")
    assert(cur.fileStats.size == cur.files.size)
    // replay after expiry: still a clean no-op, no batch double-appended
    IndexStream.run(spark, inputDir, wh, compactOver = 8, expireKeep = 2)
      .get.awaitTermination()
    assert(cat.currentSnapshot("ann_ivf_cells").get.rowCount == 500)
    // and the index stays probe-able through the pruned path
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(470L), k = 3, nprobe = 4)
      .count() == 3)
  }

  test("in-stream cells compaction keeps stats, batchId guard, and probes") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val wh = tmp()
    val inputDir = tmp()
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 200), "vec_id", "embedding",
      wh, nlist = 8)
    val cat = new IcebergLite(wh)
    for (lo <- Seq(200, 300, 400)) {
      emb.filter($"vec_id" >= lo && $"vec_id" < lo + 100)
        .write.mode("append").parquet(inputDir)
      IndexStream.run(spark, inputDir, wh, compactOver = 8).get.awaitTermination()
    }
    val snap = cat.currentSnapshot("ann_ivf_cells").get
    assert(snap.rowCount == 500)
    assert(snap.files.size <= 10, s"compaction never fired: ${snap.files.size}")
    // stats recomputed through compaction; batchId survives; replay no-op
    assert(snap.fileStats.size == snap.files.size)
    assert(snap.properties.contains("batchId") && snap.properties("nlist") == "8")
    val snaps = cat.snapshots("ann_ivf_cells").size
    IndexStream.run(spark, inputDir, wh, compactOver = 8).get.awaitTermination()
    assert(cat.snapshots("ann_ivf_cells").size == snaps)
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(450L), k = 3, nprobe = 4)
      .count() == 3)
  }
}
