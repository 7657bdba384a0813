package graft.pipeline

import java.nio.file.Files

import graft.SparkTestBase
import graft.tables.IcebergLite
import org.apache.spark.sql.functions._

/** Build-once / probe-many ANN index: the committed IVF surface must be
  * row-identical to the retrain-per-call operators, never retrain on probe,
  * and let probes skip data files via the manifest (min, max) stats. */
class AnnIndexSpec extends SparkTestBase {

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(): String =
    Files.createTempDirectory("graft-ann").toString

  test("committed probes == retrain path, with exactly one training run") {
    import spark.implicits._
    val wh = tmp()
    val before = Similarity.trainInvocations.get()
    Similarity.buildIvfIndex(embs, "vec_id", "embedding", wh,
      nlist = 16, seed = 42L, lloydIters = 2)
    assert(Similarity.trainInvocations.get() == before + 1,
      "build must train exactly once")

    val queries = Seq(0L, 1L, 2L)
    val retrain = Similarity.ivfTopK(embs, "vec_id", "embedding", queries,
        k = 5, nlist = 16, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val trainedAfterRetrain = Similarity.trainInvocations.get()
    assert(trainedAfterRetrain > before + 1, "sanity: ivfTopK retrains")

    // two probe calls through the committed index: zero further training
    val p1 = Similarity.ivfTopKIndexed(spark, wh, queries, k = 5, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val p2 = Similarity.ivfTopKIndexed(spark, wh, queries, k = 5, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(Similarity.trainInvocations.get() == trainedAfterRetrain,
      "probing the committed index must not retrain")
    assert(p1 == retrain, "committed probe must equal the retrain path")
    assert(p2 == retrain, "probes must be stable across calls")

    // near-dup through the same committed index
    val ndRetrain = Similarity.embeddingNearDupIvf(embs, "vec_id", "embedding",
        threshold = 0.45, nlist = 16)
      .as[(Long, Long)].collect().sorted.toSeq
    val ndIndexed = Similarity.embeddingNearDupIvfIndexed(spark, wh,
        threshold = 0.45)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(ndIndexed == ndRetrain)
  }

  test("manifest file stats prune a probe's scan to the probed cells") {
    import spark.implicits._
    val wh = tmp()
    Similarity.buildIvfIndex(embs, "vec_id", "embedding", wh, nlist = 16)
    val cat = new IcebergLite(wh)
    val snap = cat.currentSnapshot("ann_ivf_cells").get
    // stats survived the snapshot-json round trip, one range per data file
    assert(snap.properties("statsCol") == "cell")
    assert(snap.fileStats.size == snap.files.size && snap.files.size > 4)
    assert(snap.fileStats.values.forall { case (lo, hi) => lo <= hi })
    // range-clustered layout: probing one occupied cell touches a strict
    // subset of the files (and every surviving file's range admits it)
    val someCell = cat.read(spark, "ann_ivf_cells")
      .agg(min($"cell")).as[Int].head().toLong
    val pruned = cat.pruneFiles(snap, Set(someCell))
    assert(pruned.nonEmpty && pruned.size < snap.files.size,
      s"no pruning: ${pruned.size} of ${snap.files.size}")
    // the pruned read yields exactly the rows the full read has for the cell
    val full = cat.read(spark, "ann_ivf_cells")
      .filter($"cell" === someCell).select($"id").as[Long].collect().sorted.toSeq
    val fast = cat.readPruned(spark, "ann_ivf_cells", Set(someCell))
      .filter($"cell" === someCell).select($"id").as[Long].collect().sorted.toSeq
    assert(fast == full && full.nonEmpty)
    // and the probe path's actual scan reads only the pruned files
    assert(cat.readPruned(spark, "ann_ivf_cells", Set(someCell))
      .inputFiles.length == pruned.size)
  }

  test("incremental append: frozen quantizer, exact pruned probes over the union") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    val first = emb2.filter($"vec_id" < 400)
    val rest = emb2.filter($"vec_id" >= 400)
    Similarity.buildIvfIndex(first, "vec_id", "embedding", wh, nlist = 16)
    val trainedAfterBuild = Similarity.trainInvocations.get()
    val cat = new IcebergLite(wh)

    // append the remaining vectors plus an exact duplicate of vector 0
    val dup = emb2.filter($"vec_id" === 0L)
      .select(lit(9999L).as("vec_id"), $"embedding")
    Similarity.appendToIvfIndex(rest.union(dup), "vec_id", "embedding", wh)
    assert(Similarity.trainInvocations.get() == trainedAfterBuild,
      "append must not retrain the quantizer")

    // the union's assignment equals a fresh assignment under the SAME
    // committed centroids — the appended batch was assigned frozen
    val cs = cat.read(spark, "ann_ivf_centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val stored = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    val expected = Similarity.assignCells(emb2.union(dup).toDF(),
        "vec_id", "embedding", cs)
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    assert(stored == expected && stored.size == 501)

    // appended files carry their own manifest stats: every file has a
    // range and pruning still skips files
    val snap = cat.currentSnapshot("ann_ivf_cells").get
    assert(snap.properties("appendedRows").toLong == 101)
    assert(snap.fileStats.size == snap.files.size)
    val cell0 = stored.find(_._1 == 9999L).get._2.toLong
    assert(cat.pruneFiles(snap, Set(cell0)).size < snap.files.size)

    // probing with the duplicate's original: rank-1 neighbor must be the
    // appended duplicate at cosine 1 (it shares the query's cell by
    // construction — identical vectors assign identically)
    val top = Similarity.ivfTopKIndexed(spark, wh, Seq(0L), k = 3, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().minBy(_._2)
    assert(top._3 == 9999L && top._4 == 1.0, s"got $top")
  }

  test("incremental near-dup: prev ∪ incremental == post-append full, no retrain") {
    import spark.implicits._
    val wh = tmp()
    val old = embs.filter($"vec_id" < 400L)
    // batches are exact duplicates of committed vectors under shifted ids:
    // an identical vector lands in the SAME cell by definition, so each
    // batch is guaranteed within-cell cosine-1.0 pairs regardless of how
    // the trained quantizer happens to split the random fixture
    val batch = embs.filter($"vec_id" >= 100L && $"vec_id" < 130L)
      .withColumn("vec_id", $"vec_id" + lit(1000L))
    val batch2 = embs.filter($"vec_id" >= 200L && $"vec_id" < 220L)
      .withColumn("vec_id", $"vec_id" + lit(2000L))
    Similarity.buildIvfIndex(old, "vec_id", "embedding", wh, nlist = 16)
    val trained = Similarity.trainInvocations.get()
    val thr = 0.45
    def pairsNow(): Set[(Long, Long)] =
      Similarity.embeddingNearDupIvfIndexed(spark, wh, thr)
        .as[(Long, Long)].collect().toSet
    val prev = pairsNow()

    val incr = Similarity.embeddingNearDupIncremental(batch, "vec_id",
        "embedding", wh, thr).as[(Long, Long)].collect().toSet
    assert(Similarity.trainInvocations.get() == trained,
      "the increment must use the frozen quantizer, never retrain")
    val newIds = batch.select($"vec_id").as[Long].collect().toSet
    assert(incr.forall(p => newIds.contains(p._1) || newIds.contains(p._2)),
      "every incremental pair involves >= 1 new vector")
    assert(incr.intersect(prev).isEmpty, "old x old never recomputed")
    val full = pairsNow() // the index now holds old ∪ batch
    assert(prev.union(incr) == full,
      s"union contract: prev ${prev.size} + incr ${incr.size} vs full ${full.size}")
    assert(incr.nonEmpty, "fixture sanity: the batch must produce pairs")

    // second increment composes over the append chain — forced down the
    // big-batch BLOCKED path (broadcastRows = 0), so both bipartite joins
    // are contract-gated
    val incr2 = Similarity.embeddingNearDupIncremental(batch2, "vec_id",
        "embedding", wh, thr, broadcastRows = 0L)
      .as[(Long, Long)].collect().toSet
    assert(incr2.nonEmpty, "fixture sanity: second batch must produce pairs")
    assert(full.union(incr2) == pairsNow(), "second increment composes")
  }

  test("external-vector probe: no index scan for queries, consistent with id probe") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2, "vec_id", "embedding", wh, nlist = 16)
    // an external query carrying corpus vector 0's embedding under a fresh
    // id: identical vector ⇒ identical probe cells ⇒ rank 1 must be the
    // corpus original at cos 1, and the tail must be the id-probe's list
    val ext = emb2.filter($"vec_id" === 0L)
      .select(lit(777000L).as("qid"), $"embedding")
    val got = Similarity.ivfTopKVectors(spark, wh, ext, "qid", "embedding",
        k = 6, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.head == ((777000L, 1, 0L, 1.0)), s"got ${got.head}")
    val viaId = Similarity.ivfTopKIndexed(spark, wh, Seq(0L), k = 5, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.tail.map(r => (r._3, r._4)) == viaId.map(r => (r._3, r._4)))
  }

  test("probe robustness: unknown ids empty; compaction & appends keep pruning + params") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2, "vec_id", "embedding", wh, nlist = 8)
    val cat = new IcebergLite(wh)
    // a probe for an id the index doesn't hold is an empty answer, not a
    // crash (probedCells = ∅ ⇒ fully-pruned read ⇒ empty frame)
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(999999L), k = 3).count() == 0)
    // an append must not erase the index's self-description
    Similarity.appendToIvfIndex(
      emb2.filter($"vec_id" === 0L).select(lit(8888L).as("vec_id"), $"embedding"),
      "vec_id", "embedding", wh)
    assert(cat.currentSnapshot("ann_ivf_cells").get.properties("nlist") == "8")
    // compaction recomputes stats over range-clustered files: pruning
    // SURVIVES the rewrite instead of silently degrading to full scans
    cat.compact(spark, "ann_ivf_cells", targetFiles = 4)
    val snap = cat.currentSnapshot("ann_ivf_cells").get
    assert(snap.properties("statsCol") == "cell")
    assert(snap.files.nonEmpty && snap.fileStats.size == snap.files.size)
    val someCell = cat.read(spark, "ann_ivf_cells")
      .agg(min($"cell")).as[Int].head().toLong
    assert(cat.pruneFiles(snap, Set(someCell)).size < snap.files.size,
      "post-compaction probe must still skip files")
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(0L), k = 3, nprobe = 3)
      .count() == 3)
  }

  test("committed LSH probes == re-bucket path, zero re-bucketing, pruned reads") {
    import spark.implicits._
    val wh = tmp()
    Similarity.buildLshIndex(embs, "vec_id", "embedding", wh,
      planes = 6, seed = 42L)
    val cat = new IcebergLite(wh)
    val snap = cat.currentSnapshot("ann_lsh_buckets").get
    assert(snap.properties("planes") == "6" && snap.properties("dim") == "64")
    assert(snap.properties("statsCol") == "bucket")
    assert(snap.fileStats.size == snap.files.size)

    val queries = Seq(0L, 1L, 2L)
    val rebucket = Similarity.lshTopK(embs, "vec_id", "embedding", queries,
        k = 5, planes = 6, probeHamming = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val bucketedBefore = Similarity.bucketInvocations.get()
    val p1 = Similarity.lshTopKIndexed(spark, wh, queries, k = 5, probeHamming = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val p2 = Similarity.lshTopKIndexed(spark, wh, queries, k = 5, probeHamming = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(Similarity.bucketInvocations.get() == bucketedBefore,
      "probing the committed LSH index must never re-bucket the corpus")
    assert(p1 == rebucket, "committed probe must equal the re-bucket path")
    assert(p2 == rebucket, "probes must be stable across calls")

    // both probe reads are manifest-pruned to file subsets: the bucket
    // table by the probe-bucket set, the id sidecar by the query ids
    val someBucket = cat.read(spark, "ann_lsh_buckets")
      .agg(min($"bucket")).as[Long].head()
    assert(cat.pruneFiles(snap, Set(someBucket)).size < snap.files.size)
    val idsSnap = cat.currentSnapshot("ann_lsh_ids").get
    assert(idsSnap.properties("statsCol") == "id")
    assert(cat.pruneFiles(idsSnap, Set(0L)).size < idsSnap.files.size,
      "query-id lookup must not read the whole sidecar")
    // an unknown member id is an empty answer, not a crash
    assert(Similarity.lshTopKIndexed(spark, wh, Seq(999999L), k = 3).count() == 0)
  }

  test("LSH file granularity: one-file-per-bucket layout prunes to the probe set") {
    import spark.implicits._
    val wh = tmp()
    Similarity.buildLshIndex(embs, "vec_id", "embedding", wh,
      planes = 6, targetFiles = 1 << 6)
    val cat = new IcebergLite(wh)
    val snap = cat.currentSnapshot("ann_lsh_buckets").get
    // at fine granularity each file covers ~1 occupied bucket, so a probe
    // lists at most its probe-set's worth of files — not "almost all"
    val occupied = cat.read(spark, "ann_lsh_buckets")
      .select($"bucket").distinct().as[Long].collect().toSet
    val someBuckets = occupied.take(3)
    val pruned = cat.pruneFiles(snap, someBuckets)
    assert(pruned.size <= someBuckets.size + 1,
      s"fine layout must prune to ~probe set: ${pruned.size} of ${snap.files.size}")
    assert(snap.files.size > 16, s"expected fine-grained files, got ${snap.files.size}")
    // rows are unaffected by layout
    val got = Similarity.lshTopKIndexed(spark, wh, Seq(0L, 1L), k = 5,
        probeHamming = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val ref = Similarity.lshTopK(embs, "vec_id", "embedding", Seq(0L, 1L),
        k = 5, planes = 6, probeHamming = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(got == ref)
  }

  test("LSH append (frozen planes) + external-vector probe, consistent with id probe") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildLshIndex(emb2.filter($"vec_id" < 400), "vec_id", "embedding",
      wh, planes = 6)
    val cat = new IcebergLite(wh)
    // append the rest plus an exact duplicate of vector 0 under a new id
    val dup = emb2.filter($"vec_id" === 0L)
      .select(lit(7777L).as("vec_id"), $"embedding")
    Similarity.appendToLshIndex(emb2.filter($"vec_id" >= 400).union(dup),
      "vec_id", "embedding", wh)
    // stored buckets over the union == fresh bucketing at the committed
    // parameters — the hyperplanes are a pure function of (planes,seed,dim)
    val stored = cat.read(spark, "ann_lsh_buckets")
      .select($"id", $"bucket").as[(Long, Long)].collect().toSet
    val expected = Similarity.lshBucket(emb2.union(dup).toDF(),
        "vec_id", "embedding", planes = 6, seed = 42L, dim = 64)
      .select($"id", $"bucket").as[(Long, Long)].collect().toSet
    assert(stored == expected && stored.size == 501)
    val snap = cat.currentSnapshot("ann_lsh_buckets").get
    assert(snap.properties("planes") == "6", "build params survive appends")
    assert(snap.fileStats.size == snap.files.size, "stats chain through appends")
    // sidecar followed the append
    assert(cat.read(spark, "ann_lsh_ids").as[(Long, Long)].collect().toSet
      == stored)
    // member-id probe finds the appended duplicate at rank 1, cosine 1
    val viaId = Similarity.lshTopKIndexed(spark, wh, Seq(0L), k = 5,
        probeHamming = 1)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(viaId.head._3 == 7777L && viaId.head._4 == 1.0, s"got ${viaId.head}")
    // external probe carrying vector 0's embedding: identical bucket ⇒
    // rank 1 is the corpus original (or its duplicate) at cos 1, and the
    // neighbor list equals the id probe's plus the query row itself
    val ext = emb2.filter($"vec_id" === 0L)
      .select(lit(888000L).as("qid"), $"embedding")
    val got = Similarity.lshTopKVectors(spark, wh, ext, "qid", "embedding",
        k = 6, probeHamming = 1)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.head._4 == 1.0 && Set(0L, 7777L).contains(got.head._3))
    assert(got.map(r => (r._3, r._4)).toSet
      == (viaId.map(r => (r._3, r._4)).toSet + ((0L, 1.0))))
  }

  test("member-id probes prune via the id sidecar; appends keep it in lockstep") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2.filter($"vec_id" < 400), "vec_id", "embedding",
      wh, nlist = 16)
    val cat = new IcebergLite(wh)
    val idsSnap = cat.currentSnapshot("ann_ivf_ids").get
    assert(idsSnap.properties("statsCol") == "id")
    assert(idsSnap.fileStats.size == idsSnap.files.size && idsSnap.files.size > 1)
    // the query-row fetch reads a bounded subset of BOTH tables: sidecar
    // files pruned by query id, cells files pruned by the queries' cells
    assert(cat.pruneFiles(idsSnap, Set(0L)).size < idsSnap.files.size)
    val q0cell = cat.read(spark, "ann_ivf_ids").filter($"id" === 0L)
      .select($"cell").as[Int].head().toLong
    val cellsSnap = cat.currentSnapshot("ann_ivf_cells").get
    assert(cat.pruneFiles(cellsSnap, Set(q0cell)).size < cellsSnap.files.size)

    // append: sidecar follows the cells table row-for-row, and the newly
    // appended member is probe-able through the pruned path
    Similarity.appendToIvfIndex(emb2.filter($"vec_id" >= 400), "vec_id",
      "embedding", wh)
    val cells = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    val sidecar = cat.read(spark, "ann_ivf_ids")
      .as[(Long, Int)].collect().toSet
    assert(sidecar == cells && sidecar.size == 500)
    assert(cat.currentSnapshot("ann_ivf_ids").get.fileStats.nonEmpty)
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(450L), k = 3, nprobe = 4)
      .count() == 3)
  }

  test("quantizer drift signal: same-distribution append healthy, shifted batch trips it") {
    import spark.implicits._
    // a clustered corpus (8 modes + noise) — the setting where a frozen
    // quantizer is meaningful. (The sf fixture's iid-random vectors would
    // make ANY new batch read as drift: in high dim a quantizer trained on
    // an iid sample memorizes it, which is itself the signal working.)
    val rng = new java.util.Random(7)
    val modes = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    def vecOf(id: Int): Array[Float] =
      modes(id % 8).map(x => x + 0.1f * rng.nextGaussian().toFloat)
    val corpus = (0 until 600).map(i => (i.toLong, vecOf(i)))
      .toDF("vec_id", "embedding")
    val wh = tmp()
    Similarity.buildIvfIndex(corpus.filter($"vec_id" < 400), "vec_id",
      "embedding", wh, nlist = 8)
    val cat = new IcebergLite(wh)
    // the build recorded its per-cell mean-sim reference on the quantizer
    val ref = cat.currentSnapshot("ann_ivf_centroids").get
      .properties("cellMeanSim")
    assert(ref.split(",").forall(_.matches("-?\\d+:-?[0-9.]+")))

    // same modes: roughly half of any same-distribution batch sits below
    // its cell's build-time mean
    Similarity.appendToIvfIndex(corpus.filter($"vec_id" >= 400 && $"vec_id" < 500),
      "vec_id", "embedding", wh)
    val healthy = cat.currentSnapshot("ann_ivf_cells").get
      .properties("driftFraction").toDouble
    assert(healthy > 0.05 && healthy < 0.95, s"healthy batch read $healthy")

    // shifted distribution (negated vectors): best-cell similarity collapses
    // ⇒ nearly every appended row falls below its cell's build-time mean
    val shifted = corpus.filter($"vec_id" >= 500)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => -x).as("embedding"))
    Similarity.appendToIvfIndex(shifted, "vec_id", "embedding", wh)
    val drifted = cat.currentSnapshot("ann_ivf_cells").get
      .properties("driftFraction").toDouble
    assert(drifted > 0.9, s"shifted batch must trip the signal, read $drifted")
    assert(drifted > healthy)
    // the signal is per-append: it must not leak into inherited properties
    // of the NEXT append as a stale reading
    Similarity.appendToIvfIndex(corpus.filter($"vec_id" >= 400 && $"vec_id" < 450)
        .select(($"vec_id" + 200000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding", wh)
    val third = cat.currentSnapshot("ann_ivf_cells").get
      .properties("driftFraction").toDouble
    assert(third < 0.95, s"stale drift reading inherited: $third")
  }

  test("batch append chain with auto-compaction: files and snapshots bounded, probes exact") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2.filter($"vec_id" < 100), "vec_id", "embedding",
      wh, nlist = 8)
    val cat = new IcebergLite(wh)
    // 8 batch appends with the housekeeping knobs on: a naive chain would
    // accumulate ~8 files and one snapshot per append forever
    for (b <- 0 until 8) {
      val lo = 100 + b * 50; val hi = lo + 50
      Similarity.appendToIvfIndex(
        emb2.filter($"vec_id" >= lo && $"vec_id" < hi), "vec_id", "embedding",
        wh, compactOver = 12, expireKeep = 2)
    }
    val cellsSnap = cat.currentSnapshot("ann_ivf_cells").get
    assert(cellsSnap.files.size <= 12 + 8,
      s"file growth must be bounded, got ${cellsSnap.files.size}")
    assert(cat.snapshots("ann_ivf_cells").size <= 2 + 12,
      s"snapshot log must be bounded, got ${cat.snapshots("ann_ivf_cells").size}")
    // the compactions preserved the index's self-description and pruning
    assert(cellsSnap.properties("nlist") == "8" &&
      cellsSnap.properties("statsCol") == "cell")
    assert(cellsSnap.fileStats.size == cellsSnap.files.size)
    val someCell = cat.read(spark, "ann_ivf_cells").agg(min($"cell")).as[Int].head()
    assert(cat.pruneFiles(cellsSnap, Set(someCell.toLong)).size < cellsSnap.files.size)
    // probes over the chained-and-compacted index: with every cell probed
    // the ranking is assignment-invariant, so the result must equal brute
    // force over the full union (compaction is layout, not logic; the
    // quantizer stayed frozen on the seed corpus by design)
    val all = emb2.filter($"vec_id" < 500)
    val brute = Similarity.bruteForceTopK(all, "vec_id", "embedding",
        Seq(7L, 123L, 456L), k = 5)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val probed = Similarity.ivfTopKIndexed(spark, wh, Seq(7L, 123L, 456L),
        k = 5, nprobe = 8)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(probed == brute)
    // sidecar stayed in lockstep through heals + compactions + expiry
    val cells = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    assert(cat.read(spark, "ann_ivf_ids").as[(Long, Int)].collect().toSet == cells)
  }

  test("sidecar self-heals after a crash between the cells append and the sidecar append") {
    import spark.implicits._
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2.filter($"vec_id" < 400), "vec_id", "embedding",
      wh, nlist = 16)
    val cat = new IcebergLite(wh)
    assert(cat.currentSnapshot("ann_ivf_ids").get.properties("syncedTo") ==
      cat.currentSnapshot("ann_ivf_cells").get.snapshotId.toString)
    // simulate the crash window: the CELLS append lands (with its batchId
    // marker, as the streaming sink would write it), the sidecar append
    // never runs
    val cs = cat.read(spark, "ann_ivf_centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val orphanBatch = Similarity.assignCells(
      emb2.filter($"vec_id" >= 400 && $"vec_id" < 450), "vec_id", "embedding", cs)
    cat.append(orphanBatch, "ann_ivf_cells",
      cat.currentSnapshot("ann_ivf_cells").get.properties - "appendedRows" +
        ("batchId" -> "7"),
      statsCol = Some("cell"))
    val lagging = cat.read(spark, "ann_ivf_ids").count()
    assert(lagging == 400, "sidecar must be lagging after the simulated crash")
    // the streaming replay-skip path calls healSidecar directly — the gap
    // closes without re-appending the batch
    Similarity.healSidecar(spark, cat, "ann_ivf_cells", "ann_ivf_ids")
    val cells = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    val sidecar = cat.read(spark, "ann_ivf_ids")
      .as[(Long, Int)].collect().toSet
    assert(sidecar == cells && sidecar.size == 450)
    // healing is idempotent (already level ⇒ no new snapshot)
    val sidBefore = cat.currentSnapshot("ann_ivf_ids").get.snapshotId
    Similarity.healSidecar(spark, cat, "ann_ivf_cells", "ann_ivf_ids")
    assert(cat.currentSnapshot("ann_ivf_ids").get.snapshotId == sidBefore)
    // a NORMAL append after the crash also heals first (two deltas land)
    val cellsSnapA = cat.currentSnapshot("ann_ivf_cells").get.snapshotId
    cat.append(Similarity.assignCells(
        emb2.filter($"vec_id" >= 450 && $"vec_id" < 460), "vec_id", "embedding", cs),
      "ann_ivf_cells",
      cat.currentSnapshot("ann_ivf_cells").get.properties - "appendedRows",
      statsCol = Some("cell"))
    Similarity.appendToIvfIndex(emb2.filter($"vec_id" >= 460 && $"vec_id" < 470),
      "vec_id", "embedding", wh)
    val sidecar2 = cat.read(spark, "ann_ivf_ids").as[(Long, Int)].collect().toSet
    val cells2 = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    assert(sidecar2 == cells2 && sidecar2.size == 470)
    assert(cat.currentSnapshot("ann_ivf_ids").get.properties("syncedTo").toLong >
      cellsSnapA)
    // the healed member-id probe path actually sees the orphaned batch
    assert(Similarity.ivfTopKIndexed(spark, wh, Seq(420L), k = 3, nprobe = 4)
      .count() == 3)
  }

  test("drift-triggered rebuild: retrain-and-swap restores the fit; unchanged data probe-identical") {
    import spark.implicits._
    // clustered corpus — same construction rationale as the drift test
    val rng = new java.util.Random(11)
    val modes = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    def vecOf(id: Int): Array[Float] =
      modes(id % 8).map(x => x + 0.1f * rng.nextGaussian().toFloat)
    val corpus = (0 until 400).map(i => (i.toLong, vecOf(i)))
      .toDF("vec_id", "embedding").cache()
    val wh = tmp()
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", wh, nlist = 8)
    val cat = new IcebergLite(wh)

    // (a) rebuild over UNCHANGED data: training is bit-deterministic, so
    // probes are row-identical across the swap, and every table advanced
    // by full-replacement snapshots (old snapshots still time-travelable)
    val qs = Seq(3L, 77L, 200L)
    val before = Similarity.ivfTopKIndexed(spark, wh, qs, k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val sidsBefore = Seq("ann_ivf_cells", "ann_ivf_centroids", "ann_ivf_ids")
      .map(t => cat.currentSnapshot(t).get.snapshotId)
    assert(!Similarity.maybeRebuildIvfIndex(spark, wh), // no drift recorded
      "no-drift index must not rebuild")
    Similarity.rebuildIvfIndex(spark, wh)
    val after = Similarity.ivfTopKIndexed(spark, wh, qs, k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(after == before, "rebuild over unchanged data must be probe-identical")
    Seq("ann_ivf_cells", "ann_ivf_centroids", "ann_ivf_ids")
      .zip(sidsBefore).foreach { case (t, s) =>
        assert(cat.currentSnapshot(t).get.snapshotId > s, s"$t must advance") }

    // (b) the DRIFT consumer: append a shifted batch (negated vectors — the
    // same trip wire as the drift-signal test), maybeRebuild fires, and the
    // retrained quantizer describes the new mixture: a fresh append from
    // the shifted distribution now reads healthy instead of ~1.0
    val shifted = corpus.filter($"vec_id" < 200)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => -x).as("embedding")).cache()
    Similarity.appendToIvfIndex(shifted, "vec_id", "embedding", wh)
    val tripped = cat.currentSnapshot("ann_ivf_cells").get
      .properties("driftFraction").toDouble
    assert(tripped > 0.9, s"shifted batch must trip the signal, read $tripped")
    assert(Similarity.maybeRebuildIvfIndex(spark, wh), "drift must trigger rebuild")
    val shifted2 = corpus.filter($"vec_id" >= 200 && $"vec_id" < 300)
      .select(($"vec_id" + 200000L).as("vec_id"),
        transform($"embedding", x => -x).as("embedding"))
    Similarity.appendToIvfIndex(shifted2, "vec_id", "embedding", wh)
    val recovered = cat.currentSnapshot("ann_ivf_cells").get
      .properties("driftFraction").toDouble
    assert(recovered < 0.9, s"retrained quantizer must fit the shifted data, read $recovered")
    // rebuild rebuilt the sidecar too: lockstep over the whole union
    val cells = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect().toSet
    val sidecar = cat.read(spark, "ann_ivf_ids").as[(Long, Int)].collect().toSet
    assert(sidecar == cells && sidecar.size == 700)
    corpus.unpersist(); shifted.unpersist()
  }

  test("centroid table holds the bit-deterministic quantizer (rebuild-stable)") {
    import spark.implicits._
    val wh1 = tmp(); val wh2 = tmp()
    Similarity.buildIvfIndex(embs, "vec_id", "embedding", wh1, nlist = 8)
    Similarity.buildIvfIndex(embs.repartition(13), "vec_id", "embedding", wh2,
      nlist = 8)
    val cat1 = new IcebergLite(wh1); val cat2 = new IcebergLite(wh2)
    def centroids(cat: IcebergLite) =
      cat.read(spark, "ann_ivf_centroids")
        .as[(Int, Array[Float])].collect().sortBy(_._1)
        .map { case (c, v) => (c, v.toSeq) }.toSeq
    assert(centroids(cat1) == centroids(cat2),
      "quantizer must be identical at any input partitioning")
    assert(cat1.currentSnapshot("ann_ivf_centroids").get.rowCount == 8)
  }

  test("sidecar heal recommits when the syncedTo parent manifest is expired") {
    import spark.implicits._
    // same out-of-band-expire window as the Dedup sizes-sidecar test: the
    // chain looks contiguous but the syncedTo parent's manifest is gone, so
    // a delta walk would re-append every old id (readAppended degrades to
    // the whole snapshot) — the heal must recommit instead
    val wh = tmp()
    val emb2 = embs.select($"vec_id", $"embedding")
    Similarity.buildIvfIndex(emb2.filter($"vec_id" < 400), "vec_id", "embedding",
      wh, nlist = 16)
    val cat = new IcebergLite(wh)
    val cs = cat.read(spark, "ann_ivf_centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    for ((lo, hi) <- Seq((400L, 430L), (430L, 450L)))
      cat.append(Similarity.assignCells(
          emb2.filter($"vec_id" >= lo && $"vec_id" < hi), "vec_id", "embedding", cs),
        "ann_ivf_cells",
        cat.currentSnapshot("ann_ivf_cells").get.properties - "appendedRows",
        statsCol = Some("cell"))
    cat.expireSnapshots("ann_ivf_cells", keepLast = 2)
    Similarity.healSidecar(spark, cat, "ann_ivf_cells", "ann_ivf_ids")
    val cells = cat.read(spark, "ann_ivf_cells")
      .select($"id", $"cell").as[(Long, Int)].collect()
    val sidecar = cat.read(spark, "ann_ivf_ids").as[(Long, Int)].collect()
    assert(sidecar.length == cells.length,
      s"heal duplicated sidecar rows: ${sidecar.length} vs ${cells.length}")
    assert(sidecar.toSet == cells.toSet)
  }
}
