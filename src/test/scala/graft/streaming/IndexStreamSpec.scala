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

  test("continuous SemDeDup: streamed pairs == the incremental contract; crash window converges") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val wh = tmp()
    val inputDir = tmp()
    Similarity.buildIvfIndex(emb.filter($"vec_id" < 400), "vec_id", "embedding",
      wh, nlist = 16)
    val cat = new IcebergLite(wh)
    val thr = 0.45
    def fullPairs(): Set[(Long, Long)] =
      Similarity.embeddingNearDupIvfIndexed(spark, wh, thr)
        .as[(Long, Long)].collect().toSet
    def streamedPairs(): Set[(Long, Long)] =
      cat.read(spark, "ann_ivf_pairs").select($"a", $"b")
        .as[(Long, Long)].collect().toSet
    val prev = fullPairs()

    // segment 1: exact duplicates of committed vectors under shifted ids
    // (guaranteed same-cell pairs regardless of the trained quantizer)
    emb.filter($"vec_id" >= 100 && $"vec_id" < 130)
      .withColumn("vec_id", $"vec_id" + lit(1000L))
      .write.mode("append").parquet(inputDir)
    IndexStream.run(spark, inputDir, wh, neardupThreshold = thr)
      .get.awaitTermination()
    val p1 = streamedPairs()
    assert(p1.nonEmpty && p1.intersect(prev).isEmpty,
      "streamed pairs are new, never a recompute of the committed corpus")
    assert(prev.union(p1) == fullPairs(),
      "pairs table holds exactly the increment: prev ∪ streamed == full")

    // segment 2 composes over the append chain
    val full1 = fullPairs()
    emb.filter($"vec_id" >= 200 && $"vec_id" < 220)
      .withColumn("vec_id", $"vec_id" + lit(2000L))
      .write.mode("append").parquet(inputDir)
    IndexStream.run(spark, inputDir, wh, neardupThreshold = thr)
      .get.awaitTermination()
    val pAll = streamedPairs()
    assert(p1.subsetOf(pAll), "the pairs table accumulates")
    assert(full1.union(pAll.diff(p1)) == fullPairs(), "second segment composes")

    // replay: checkpoint knows every file — no new snapshot on EITHER table
    val cellSnaps = cat.snapshots("ann_ivf_cells").size
    val pairSnaps = cat.snapshots("ann_ivf_pairs").size
    IndexStream.run(spark, inputDir, wh, neardupThreshold = thr)
      .get.awaitTermination()
    assert(cat.snapshots("ann_ivf_cells").size == cellSnaps)
    assert(cat.snapshots("ann_ivf_pairs").size == pairSnaps)

    // crash window: pairs committed, cells not (the pairs-then-cells order's
    // one partial state). Simulate by running ONLY the pairs half for a new
    // batch, then let the replayed micro-batch converge: pairs must NOT
    // double-append, cells must land, union contract must hold at the end.
    val batchId = cat.currentSnapshot("ann_ivf_cells").get
      .properties("batchId").toLong + 1
    val crashBatch = emb.filter($"vec_id" >= 300 && $"vec_id" < 320)
      .withColumn("vec_id", $"vec_id" + lit(3000L))
    val cs = Similarity.committedCentroids(spark, cat, "ann_ivf")
    val crashCells = Similarity.assignCells(crashBatch, "vec_id", "embedding", cs)
      .localCheckpoint(true)
    cat.append(Similarity.embeddingIncrPlan(cat, "ann_ivf", crashCells, thr)
      .localCheckpoint(true), "ann_ivf_pairs", Map("batchId" -> batchId.toString))
    val fullBeforeReplay = fullPairs() // cells never landed: index unchanged
    assert(fullBeforeReplay == fullPairs())
    // the replayed micro-batch (same batchId) converges
    IndexStream.neardupBatch(cat, "ann_ivf", "ann_ivf_pairs", crashBatch,
      "vec_id", "embedding", thr, batchId)
    assert(cat.currentSnapshot("ann_ivf_pairs").get.properties("batchId").toLong
      == batchId, "pairs not double-appended")
    assert(cat.snapshots("ann_ivf_pairs").size == pairSnaps + 1)
    val pFinal = streamedPairs()
    assert(prev.union(pFinal) == fullPairs(),
      "after crash-replay convergence the union contract still holds")
    assert(pFinal.diff(pAll).nonEmpty, "the crash batch's pairs are present once")
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
