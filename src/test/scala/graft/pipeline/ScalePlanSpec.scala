package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-shape tests for the pipeline operators: each rewritten plan must be
 * (a) result-identical to the naive formulation it replaced and (b) free of
 * the scale anti-pattern it was rewritten to avoid (asserted on the actual
 * executed plan string, not by inspection).
 */
class ScalePlanSpec extends SparkTestBase {

  private lazy val embs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // -------------------------------------------------------------------------
  // LSH multi-probe: equi-join candidates ≡ bit_count filter candidates
  // -------------------------------------------------------------------------
  test("lshCandidates equi-join = bit_count-filter candidate set; no NLJ in plan") {
    import spark.implicits._
    val queries = (0L until 8L).toSeq
    val bucketed = Similarity.lshBucket(embs, "vec_id", "embedding", planes = 6)
      .cache()
    val cand = Similarity.lshCandidates(bucketed, queries, planes = 6, probeHamming = 2)
    val got = cand.select($"q", $"id").as[(Long, Long)].collect().toSet
    // naive reference: score every (query, corpus) pair, keep Hamming ≤ 2
    val all = bucketed.select($"id", $"bucket").as[(Long, Long)].collect()
    val qb = all.filter(x => queries.contains(x._1)).toMap
    val want = (for {
      q <- queries
      (id, b) <- all if id != q
      if java.lang.Long.bitCount(qb(q) ^ b) <= 2
    } yield (q, id)).toSet
    assert(got == want)
    val plan = planOf(cand)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"probe join must be a hash equi-join:\n$plan")
    assert(Similarity.probeMasks(6, 2).size == 1 + 6 + 15) // C(6,0)+C(6,1)+C(6,2)
    bucketed.unpersist()
  }

  // -------------------------------------------------------------------------
  // IVF: min_by assignment ≡ driver argmax; no Window over the corpus
  // -------------------------------------------------------------------------
  test("ivfIndex assignment = driver argmax over centroids; no Window in plan") {
    import spark.implicits._
    val nlist = 16
    val lazyIndexed = Similarity.ivfIndex(embs, "vec_id", "embedding", nlist = nlist)
    val plan = planOf(lazyIndexed)
    assert(!plan.contains("Window"),
      s"assignment must not window over N x nlist rows:\n$plan")
    assert(!plan.contains("Exchange"),
      s"assignment is a narrow projection — no shuffle expected:\n$plan")
    // the Lloyd SEED is still the reproducible hash pick: iteration 0
    // must equal the independently recomputed lowest-xxhash64(id, 42) rows
    val hashed = embs.select($"vec_id", xxhash64($"vec_id", lit(42L)).as("h"),
        $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    val hashPick = hashed.sortBy(x => (x._2, x._1)).take(nlist)
      .zipWithIndex.map { case ((_, _, v), i) => (i + 1, v) }
    val seed0 = Similarity.trainCentroids(embs, "vec_id", "embedding",
      nlist = nlist, lloydIters = 0)
    assert(seed0.map(_._1) == hashPick.map(_._1).toSeq)
    seed0.zip(hashPick).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq, "lloydIters=0 must be the raw hash pick") }
    // each vector's assigned cell is the true argmax over the TRAINED
    // centroids (the quantizer ivfIndex defaults to)
    val trained = Similarity.trainCentroids(embs, "vec_id", "embedding",
      nlist = nlist)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = lazyIndexed.select($"id", $"cell").as[(Long, Long)].collect().toMap
    assert(got.size == hashed.length)
    for ((id, _, v) <- hashed) {
      val best = trained.map { case (c, cv) => (cos(v, cv), -c) }.max
      assert(got(id) == -best._2.toLong, s"vector $id assigned to wrong cell")
    }
  }

  test("NearestCell kernel ≡ literal-inlined argmax formulation (hostile rows too)") {
    import spark.implicits._
    val cs = Similarity.trainCentroids(embs, "vec_id", "embedding", nlist = 16)
    val withNullElem = Seq(9003L).toDF("vec_id").select($"vec_id",
      array((0 until 64).map(i =>
        if (i == 5) lit(null).cast("float") else lit(1.0f)): _*).as("embedding"))
    val hostile = Seq(
        (9001L, Array.fill(64)(0.0f)),            // zero vector
        (9002L, null.asInstanceOf[Array[Float]]), // null vector
        (9004L, Array.fill(3)(1.0f)))             // ragged length
      .toDF("vec_id", "embedding")
      .union(withNullElem)
    val base = embs.select($"vec_id", $"embedding").union(hostile)
    def cellsOf(df: DataFrame) =
      df.select($"id", $"cell").as[(Long, Int)].collect().toSet
    val fast = cellsOf(Similarity.assignCells(base, "vec_id", "embedding", cs))
    val ref = cellsOf(Similarity.assignCellsPortable(base, "vec_id", "embedding", cs))
    assert(fast == ref, s"kernel diverged: ${(fast -- ref).take(3)} vs ${(ref -- fast).take(3)}")
    // the degenerate rows are all assigned (totality) — to the lowest cell
    val minCell = cs.map(_._1).min
    assert(Seq(9001L, 9002L, 9003L, 9004L).forall(id =>
      fast.contains((id, minCell))))
    // and the kernel's plan stays a narrow codegen'd projection
    val plan = planOf(Similarity.assignCells(base, "vec_id", "embedding", cs))
    assert(plan.contains("nearest_cell") && !plan.contains("Exchange"))
  }

  test("NearestCell NaN contract: NaN sims skipped, order-independent (documented divergence from portable)") {
    import spark.implicits._
    // a NaN CENTROID (e.g. a quantizer trained over corrupt data) makes that
    // cell's similarity NaN against every query while the other cells stay
    // finite — the one shape where NaN competes with finite sims
    val nanCentroid = Array.fill(4)(Float.NaN)
    val good1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val good2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val vecs = Seq((1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.1f, 0.9f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    def kernelCells(cs: Seq[(Int, Array[Float])]) =
      Similarity.assignCells(vecs, "vec_id", "embedding", cs)
        .select($"id", $"cell").as[(Long, Int)].collect().toMap
    // kernel skips the NaN sim wherever the NaN centroid sits in the scan
    val nanFirst = kernelCells(Seq(1 -> nanCentroid, 2 -> good1, 3 -> good2))
    val nanLast = kernelCells(Seq(2 -> good1, 3 -> good2, 1 -> nanCentroid))
    assert(nanFirst == Map(1L -> 2, 2L -> 3), s"got $nanFirst")
    assert(nanLast == Map(1L -> 2, 2L -> 3), s"got $nanLast")
    // the portable struct-ordering formulation ranks NaN above any finite
    // sim and would crown the NaN cell — the divergence the kernel's
    // scaladoc declares; pin it so the contract can't drift silently
    val portable = Similarity.assignCellsPortable(vecs, "vec_id", "embedding",
        Seq(1 -> nanCentroid, 2 -> good1, 3 -> good2))
      .select($"id", $"cell").as[(Long, Int)].collect().toMap
    assert(portable.values.forall(_ == 1), s"portable NaN ordering changed: $portable")
    // a NaN ELEMENT in the query vector: NaN sim against every same-length
    // centroid ⇒ no defined similarity ⇒ totality fallback to the lowest cell
    val nanVec = Seq((9L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val fallback = Similarity.assignCells(nanVec, "vec_id", "embedding",
        Seq(5 -> good1, 7 -> good2))
      .select($"cell").as[Int].head()
    assert(fallback == 5)
  }

  test("skew-bounded cellPairs ≡ unblocked within-cell join; hot cell spreads over tasks") {
    import spark.implicits._
    val indexed = Similarity.ivfIndex(embs, "vec_id", "embedding", nlist = 8)
      .cache()
    def pairsOf(df: DataFrame) =
      df.select($"a", $"b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.cellPairs(indexed, threshold = 0.45, blocks = 4)
    val got = pairsOf(blocked)
    assert(got == pairsOf(Similarity.cellPairsUnblocked(indexed, 0.45)))
    assert(got.nonEmpty && got.forall { case (a, b) => a < b })
    // the join key is the composite (cell, bi, bj) — an equi-join, never a
    // cartesian/NLJ, so no single task can hold a whole hot cell
    val plan = planOf(blocked)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"blocked cellPairs must stay an equi-join:\n$plan")
    assert(plan.contains("bi") && plan.contains("bj"),
      s"join must carry the block-pair key:\n$plan")

    // ONE-MODE-HEAVY corpus: every vector in a single quantizer cell. The
    // unblocked join would put all candidate pairs in ONE task; the blocked
    // key must spread them across B(B+1)/2 = 10 key groups ⇒ >1 partition
    val hot = indexed.select($"id", $"vec", lit(3).as("cell"))
    val hotPairs = Similarity.cellPairs(hot, threshold = -1.0, blocks = 4)
    assert(pairsOf(hotPairs) == pairsOf(Similarity.cellPairsUnblocked(hot, -1.0)))
    // the pinned repartition(P, keys) must hold even under AQE: this
    // operator's groups are compute-quadratic but byte-light, and byte-based
    // partition coalescing would pack them back into one task — the pin is
    // what stops that, so assert the spread with AQE at its defaults
    val parts = Similarity.cellPairs(hot, threshold = -1.0, blocks = 4)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1, s"hot cell still lands in one task: $parts partition(s)")
    indexed.unpersist()
  }

  test("Lloyd training is bit-deterministic at any parallelism") {
    // per-dimension means are summed in decimal (order-independent), so the
    // trained quantizer must reproduce bit-for-bit under different
    // partitionings of the same data
    val a = Similarity.trainCentroids(embs.repartition(3), "vec_id", "embedding")
    val b = Similarity.trainCentroids(embs.repartition(17), "vec_id", "embedding")
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca == cb)
      assert(va.length == vb.length && va.length > 0)
      va.zip(vb).foreach { case (x, y) =>
        assert(java.lang.Float.floatToIntBits(x) ==
          java.lang.Float.floatToIntBits(y), s"cell $ca differs") }
    }
    // and training MOVED the centroids off the seed vectors
    val seed0 = Similarity.trainCentroids(embs, "vec_id", "embedding",
      lloydIters = 0)
    assert(a.zip(seed0).exists { case ((_, t), (_, s)) => t.toSeq != s.toSeq })
  }

  test("ANN rankers use the bounded-heap aggregate — no Window in the plan") {
    import spark.implicits._
    val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      Seq(0L, 1L, 2L), k = 5)
    val plan = planOf(bf)
    assert(!plan.contains("Window"),
      s"ranking must not window one query's candidates onto one reducer:\n$plan")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("topk_by"),
      s"expected the TypedImperativeAggregate heap in the plan:\n$plan")
    assert(plan.contains("partial_topk_by"),
      s"map-side partial aggregation must be present:\n$plan")
  }

  test("lshBucket with dim passed skips the sniff job and matches exactly") {
    import spark.implicits._
    val dim = embs.select(size($"embedding")).as[Int].head()
    val sniffed = Similarity.lshBucket(embs, "vec_id", "embedding", planes = 6)
      .select($"id", $"bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val passed = Similarity.lshBucket(embs, "vec_id", "embedding", planes = 6,
        dim = dim)
      .select($"id", $"bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(sniffed == passed)
  }

  // -------------------------------------------------------------------------
  // Exact near-dup: blocked equi-join ≡ naive theta join; no cartesian op
  // -------------------------------------------------------------------------
  test("blocked exact near-dup = naive theta-join pairs; no cartesian in plan") {
    import spark.implicits._
    val blocked = Similarity.embeddingNearDupPairs(embs, "vec_id", "embedding",
      threshold = 0.45, blocks = 8)
    val got = blocked.as[(Long, Long)].collect().toSet
    // naive oracle, driver-side
    val vecs = embs.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
      if BigDecimal(cos(va, vb)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.45
    } yield (a, b)).toSet
    assert(got == want)
    val plan = planOf(blocked)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"exact near-dup must be a block-partitioned equi-join:\n$plan")
  }

  // -------------------------------------------------------------------------
  // IVF-celled near-dup (SemDeDup shape): exact-verified subset, measured recall
  // -------------------------------------------------------------------------
  test("IVF-celled near-dup ⊆ exact pairs; recall measured; equi-join plan") {
    import spark.implicits._
    val exact = Similarity.embeddingNearDupPairs(embs, "vec_id", "embedding",
      threshold = 0.35, blocks = 8).as[(Long, Long)].collect().toSet
    val celled = Similarity.embeddingNearDupIvf(embs, "vec_id", "embedding",
      threshold = 0.35, nlist = 16)
    val got = celled.as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact)) // exact in-cell verify ⇒ no false positives
    assert(exact.size > 100, s"fixture too thin: ${exact.size} exact pairs")
    val recall = got.size.toDouble / exact.size
    // cluster-scoped comparison trades recall for N²→N²/nlist work; the
    // floor documents what the quantizer captures on this corpus —
    // measured 0.226 with the raw hash pick, 0.292 after 2 Lloyd rounds
    assert(recall >= 0.25, s"IVF-celled recall $recall")
    val plan = planOf(celled)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"cell-scoped near-dup must be an equi-join on cell:\n$plan")
  }

  // -------------------------------------------------------------------------
  // Stop-shingle cut: bounded candidates under a corpus-ubiquitous shingle
  // -------------------------------------------------------------------------
  test("winnowPairs postings join: no cartesian, no Window, partial count agg") {
    import spark.implicits._
    // the pre-checkpoint pipeline winnowPairs composes (the operator itself
    // materializes eagerly, which hides its plan)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 16, w = 8)
      .select($"id", $"fp".as("shingle"))
    val pairs = Dedup.jaccardCandidates(fps).filter($"common" >= 2)
    val plan = planOf(pairs)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"shared-passage candidates must come from the postings equi-join:\n$plan")
    assert(!plan.contains("Window"), s"no window over pair sets:\n$plan")
    assert(plan.contains("partial_count"),
      s"pair counting must combine map-side:\n$plan")
    // and the operator output equals the composed pipeline it audits
    val got = Dedup.winnowPairs(docs, "doc_id", "text", k = 16, w = 8,
        minShared = 2).as[(Long, Long, Long)].collect().sorted.toSeq
    val composed = pairs.select($"a", $"b", $"common")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == composed && got.nonEmpty)
  }

  test("jaccardCandidates: ubiquitous shingle bounded by maxPostings cut") {
    import spark.implicits._
    // every doc shares the trigram "alpha beta gamma"; all other shingles
    // are unique per doc
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta gamma u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val ds = Dedup.docShingles(docs, "doc_id", "text", n = 3)
    val unbounded = Dedup.jaccardCandidates(ds, maxPostings = 0L).count()
    assert(unbounded == 40L * 39L / 2L) // the hub shingle pairs everyone
    val bounded = Dedup.jaccardCandidates(ds, maxPostings = 5L).count()
    assert(bounded == 0L) // hub dropped; unique shingles pair nothing
    // and the VERIFIED pair set at a useful threshold is identical (the cut
    // only removes candidates whose Jaccard is dominated by hub shingles)
    val p0 = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
      maxPostings = 0L).count()
    val p1 = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
      maxPostings = 5L).count()
    assert(p0 == 0L && p1 == 0L)
  }

  // -------------------------------------------------------------------------
  // Native cosine kernel: null semantics match the portable formulation
  // -------------------------------------------------------------------------
  test("cosine kernel: unequal lengths and null elements yield NULL like zip_with") {
    import spark.implicits._
    // exclude the rewrite so "portable" really is the zip_with formulation
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.CosineRewrite")
    try nullSemanticsParity()
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def nullSemanticsParity(): Unit = {
    import spark.implicits._
    val mism = spark.range(1).select(
      array(lit(1f), lit(2f)).as("a"),
      array(lit(1f), lit(2f), lit(3f)).as("b"))
    val r1 = mism.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosinePortable($"a", $"b").as("portable")).head()
    assert(r1.isNullAt(0) && r1.isNullAt(1))
    val withNull = spark.range(1).select(
      array(lit(1f), lit(null).cast("float")).as("a"),
      array(lit(1f), lit(2f)).as("b"))
    val r2 = withNull.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosinePortable($"a", $"b").as("portable")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  // -------------------------------------------------------------------------
  // Multimodal: dimensions parsed from real header bytes
  // -------------------------------------------------------------------------
  test("media dimensions come from PNG IHDR / JPEG SOF0 bytes, not metadata") {
    import spark.implicits._
    // roundtrip: synthetic payloads carry genuine headers
    for (id <- 0L until 60L) {
      val payload = Multimodal.fakePayload(id, s"text $id")
      val parsed = Multimodal.parseDimensions(payload)
      val wantFmt = if (id % 3 == 0) "png" else "jpeg"
      val wantW = 64 + (id % 8).toInt * 16
      val wantH = 64 + (id % 5).toInt * 16
      assert(parsed.contains((wantFmt, wantW, wantH)), s"doc $id: $parsed")
    }
    // malformed payloads parse to None, not garbage
    assert(Multimodal.parseDimensions(Array[Byte]()) == None)
    assert(Multimodal.parseDimensions("not an image".getBytes) == None)
    assert(Multimodal.parseDimensions(Array(0xFF, 0xD8, 0x00, 0x01).map(_.toByte)) == None)
    // end-to-end through the Dataset plumbing
    val docs = Seq((7L, "seven"), (9L, "nine")).toDF("doc_id", "text")
    val metas = Multimodal.withMedia(docs, "doc_id", "text")
      .collect().map(r => r.doc_id -> r.meta).toMap
    assert(metas(7L) == MediaMeta("jpeg", 64 + 7 * 16, 64 + 2 * 16,
      Multimodal.fakePayload(7L, "seven").length.toLong))
    assert(metas(9L).format == "png" && metas(9L).width == 64 + 16 && metas(9L).height == 64 + 4 * 16)
  }

  // -------------------------------------------------------------------------
  // Incremental dedup layout: the committed postings arrive bucketed — the
  // batch-vs-corpus joins must shuffle ONLY the batch (the O(corpus-bytes)
  // shuffle term the round-5 soak measured as the incremental path's
  // dominant cost is gone BY LAYOUT, not by tuning)
  // -------------------------------------------------------------------------

  /** Violations of the corpus-side contract in `root`: every scan of the
    * committed index (under `wh`) must be a bucketed scan, and no Shuffle/
    * Broadcast Exchange may sit between it and the join that consumes it. */
  private def corpusSideViolations(
      root: org.apache.spark.sql.execution.SparkPlan, wh: String,
      requireBucketed: Boolean = true): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    def isCorpus(s: FileSourceScanExec): Boolean =
      s.relation.location.rootPaths.exists(_.toString.contains(wh))
    // exposed = subtree holds a corpus scan no join has consumed yet
    def exposed(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        if (isCorpus(s) && requireBucketed && !s.bucketedScan)
          bad += s"corpus scan is not bucketed: ${s.nodeName}"
        isCorpus(s)
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.children.foreach(exposed); false
      case e: ShuffleExchangeExec =>
        if (e.children.map(exposed).exists(identity))
          bad += "corpus scan shuffled before reaching its join"
        false
      case e: BroadcastExchangeExec =>
        if (e.children.map(exposed).exists(identity))
          bad += "corpus side broadcast (impossible at scale)"
        false
      case o => o.children.map(exposed).exists(identity)
    }
    exposed(root)
    bad.toSeq
  }

  test("incremental postings joins: corpus side bucketed, never shuffled or broadcast") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldDocs = docs.filter($"doc_id" <= 250L)
    val newDocs = docs.filter($"doc_id" > 250L)
    val wh = java.nio.file.Files.createTempDirectory("graft-bkplan").toString
    Dedup.buildShingleIndex(oldDocs, "doc_id", "text", wh, n = 3)
    Dedup.buildFingerprintIndex(oldDocs, "doc_id", "text", wh, k = 16, w = 8)
    val cat = new graft.tables.IcebergLite(wh)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // AQE off so the full physical tree is walkable; broadcast off so the
      // plan under test is the big-against-big one a 100 TB corpus forces
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shBatch = Dedup.batchShingles(newDocs, "doc_id", "text",
        cat.currentSnapshot("shingle_index").get)
      for (cut <- Seq(0L, 64L)) {
        val plan = Dedup.jaccardIncrPlan(cat, "shingle_index", shBatch,
          threshold = 0.5, maxPostings = cut).queryExecution.executedPlan
        val v = corpusSideViolations(plan, wh)
        assert(v.isEmpty, s"jaccard maxPostings=$cut: ${v.mkString("; ")}\n$plan")
      }
      val fpBatch = Dedup.batchFps(newDocs, "doc_id", "text",
        cat.currentSnapshot("fp_index").get)
      for (cut <- Seq(0L, 64L)) {
        val plan = Dedup.winnowIncrPlan(cat, "fp_index", fpBatch,
          minShared = 2L, maxPostings = cut).queryExecution.executedPlan
        val v = corpusSideViolations(plan, wh)
        assert(v.isEmpty, s"winnow maxPostings=$cut: ${v.mkString("; ")}\n$plan")
      }
      // sanity: the walk actually saw corpus scans (≥ postings + sizes)
      val probe = Dedup.jaccardIncrPlan(cat, "shingle_index", shBatch,
        threshold = 0.5, maxPostings = 0L).queryExecution.executedPlan
      val corpusScans = probe.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(wh)) => s
      }
      assert(corpusScans.size >= 3, s"expected postings + 2 sizes scans, got ${corpusScans.size}")
      assert(corpusScans.forall(_.bucketedScan))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql(s"DROP TABLE IF EXISTS `${cat.catalogName("shingle_index")}`")
      spark.sql(s"DROP TABLE IF EXISTS `${cat.catalogName("shingle_index_sizes")}`")
      spark.sql(s"DROP TABLE IF EXISTS `${cat.catalogName("fp_index")}`")
    }
  }

  test("embedding increment: small batch broadcast, corpus cells never shuffled; big batch blocked") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val wh = java.nio.file.Files.createTempDirectory("graft-annplan").toString
    Similarity.buildIvfIndex(embs.filter($"vec_id" < 400L), "vec_id",
      "embedding", wh, nlist = 16)
    val cat = new graft.tables.IcebergLite(wh)
    val cs = cat.read(spark, "ann_ivf_centroids").select($"cell", $"cvec")
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val batch = Similarity.assignCells(embs.filter($"vec_id" >= 400L),
      "vec_id", "embedding", cs).localCheckpoint(true)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // AQE off so the tree is walkable; auto-broadcast off so the only
      // BroadcastExchange in the plan is the operator's EXPLICIT batch hint
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val small = Similarity.embeddingIncrPlan(cat, "ann_ivf", batch,
        threshold = 0.45).queryExecution.executedPlan
      // corpus side: scanned (pruned), consumed by its join with NO exchange
      // in between — the text pillars' corpus-never-shuffles invariant
      // (requireBucketed off: the cells table is range-clustered, not bucketed)
      val v = corpusSideViolations(small, wh, requireBucketed = false)
      assert(v.isEmpty, s"${v.mkString("; ")}\n$small")
      assert(small.collect { case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(wh)) => s
        }.nonEmpty, s"walk saw no corpus scan\n$small")
      // batch side: exactly the explicit broadcast carries it to the join
      assert(small.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        s"expected the explicit batch broadcast\n$small")
      // big-batch path (broadcastRows = 0): blocked-shuffle join — both sides
      // exchange on the composite block-pair key, still no cartesian
      val big = Similarity.embeddingIncrPlan(cat, "ann_ivf", batch,
        threshold = 0.45, broadcastRows = 0L).queryExecution.executedPlan
      val planStr = big.toString
      assert(!planStr.contains("CartesianProduct") &&
        !planStr.contains("BroadcastNestedLoopJoin"), s"cartesian in\n$big")
      assert(big.collect { case e: ShuffleExchangeExec => e }.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("incremental joins stay corpus-shuffle-free AFTER appends; all three pillars") {
    // The fresh-build gate above could pass while the layout silently degrades
    // on the first real increment (appended files breaking the bucketed scan):
    // run one full incremental cycle per pillar — which APPENDS through the
    // bucketed writer — then re-assert the plan property for the NEXT batch
    // over the grown tables, minhash included.
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldDocs = docs.filter($"doc_id" <= 200L)
    val batch1 = docs.filter($"doc_id" > 200L && $"doc_id" <= 350L)
    val batch2 = docs.filter($"doc_id" > 350L)
    val wh = java.nio.file.Files.createTempDirectory("graft-bkgrown").toString
    Dedup.buildShingleIndex(oldDocs, "doc_id", "text", wh, n = 3)
    Dedup.buildFingerprintIndex(oldDocs, "doc_id", "text", wh, k = 16, w = 8)
    // minhash on its OWN postings substrate: the single-pillar incremental
    // calls below each append their batch, and a shared substrate would be
    // double-appended (the documented hazard ladderIncremental exists for)
    Dedup.buildMinhashIndex(oldDocs, "doc_id", "text", wh)
    // one incremental cycle each — these append batch1 into the committed state
    Dedup.jaccardPairsIncremental(batch1, "doc_id", "text", wh, threshold = 0.5)
    Dedup.winnowPairsIncremental(batch1, "doc_id", "text", wh, minShared = 2L)
    Dedup.minhashLshPairsIncremental(batch1, "doc_id", "text", wh,
      verifyThreshold = 0.5)
    val cat = new graft.tables.IcebergLite(wh)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shBatch = Dedup.batchShingles(batch2, "doc_id", "text",
        cat.currentSnapshot("shingle_index").get)
      val jPlan = Dedup.jaccardIncrPlan(cat, "shingle_index", shBatch,
        threshold = 0.5, maxPostings = 64L).queryExecution.executedPlan
      assert(corpusSideViolations(jPlan, wh).isEmpty,
        s"jaccard after append: ${corpusSideViolations(jPlan, wh).mkString("; ")}\n$jPlan")
      val fpBatch = Dedup.batchFps(batch2, "doc_id", "text",
        cat.currentSnapshot("fp_index").get)
      val wPlan = Dedup.winnowIncrPlan(cat, "fp_index", fpBatch,
        minShared = 2L, maxPostings = 64L).queryExecution.executedPlan
      assert(corpusSideViolations(wPlan, wh).isEmpty,
        s"winnow after append: ${corpusSideViolations(wPlan, wh).mkString("; ")}\n$wPlan")
      val mhSnap = cat.currentSnapshot("minhash_index").get
      val mhBk = Dedup.bandBuckets(shBatch,
        mhSnap.properties("k").toInt, mhSnap.properties("bands").toInt)
      val cPlan = Dedup.minhashCandPlan(cat, "minhash_index", mhBk)
        .queryExecution.executedPlan
      assert(corpusSideViolations(cPlan, wh).isEmpty,
        s"minhash candidates after append: ${corpusSideViolations(cPlan, wh).mkString("; ")}\n$cPlan")
      // verify pass: its postings scan is BROADCAST-RESTRICTED (candidate
      // ids), so nothing downstream exploits the bucketing and Spark's
      // DisableUnnecessaryBucketedScan may read it plain — acceptable; the
      // property scale needs here is no corpus-side shuffle/broadcast
      val vPlan = Dedup.minhashIncrPlan(cat, "minhash_index", shBatch, mhBk,
        mhSnap.properties("k").toInt, mhSnap.properties("bands").toInt,
        verifyThreshold = 0.5).queryExecution.executedPlan
      val vViol = corpusSideViolations(vPlan, wh)
        .filterNot(_.startsWith("corpus scan is not bucketed"))
      assert(vViol.isEmpty,
        s"minhash verify after append: ${vViol.mkString("; ")}\n$vPlan")
      // the walk saw real bucketed corpus scans on the GROWN tables (multiple
      // files per bucket now) — and every one of them still bucketedScan
      val corpusScans = Seq(jPlan, wPlan, cPlan).flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(wh)) => s
      })
      assert(corpusScans.size >= 3)
      assert(corpusScans.forall(_.bucketedScan))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      for (t <- Seq("shingle_index", "shingle_index_sizes", "fp_index",
          "minhash_index", "minhash_index_postings",
          "minhash_index_postings_sizes"))
        spark.sql(s"DROP TABLE IF EXISTS `${cat.catalogName(t)}`")
    }
  }

  test("global cumsum: one range shuffle, no window operator, narrow scan phase") {
    // the naive `sum over (order by id)` formulation collapses the corpus
    // into ONE window task, and even a partition-keyed window re-shuffles
    // on the partition id (EnsureRequirements can't see the co-location);
    // the operator must plan EXACTLY one exchange — the range partitioning
    // — and no window at all (the running sum is a narrow mapPartitions)
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"n_chars")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Packing.localCumsumPlan(docs, "doc_id", "n_chars", 0)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"window operator in the cumsum plan:\n$plan")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 1, s"expected exactly one exchange:\n$plan")
    assert(shuffles.head.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
      s"the one exchange must be the range partitioning:\n$plan")
  }

  test("scalar-only quality filter is shuffle-free; lang gate joins ids-only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // quality + repetition predicates fold into the scan: zero exchanges
    val scalarPlan = Filtering.qualityFilter(docs, "doc_id", "text",
        minQuality = 0.8, maxRepetition = 0.05, repN = 2)
      .queryExecution.executedPlan
    assert(scalarPlan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"scalar-only filter must not shuffle:\n$scalarPlan")
    // with the lang gate the rejoin is a left-semi on the id key — document
    // bytes never enter the langid aggregation's shuffles
    val gated = Filtering.qualityFilter(docs, "doc_id", "text",
      minQuality = 0.8, maxRepetition = 0.05, repN = 2, langs = Seq("en"))
    // optimized logical plan: AQE hides the physical join until execution
    val semi = gated.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j }
    assert(semi.nonEmpty, "lang gate must rejoin as a left-semi on ids")
  }

  test("mixing is a shuffle-free filter; decontamination never shuffles the corpus side") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // per-group mix: however many groups the keeps map names, the whole mix
    // is one codegen'd filter over the scan — zero exchanges
    val mixPlan = Sampling.sampleByGroup(docs, "doc_id", "lang",
        Map("en" -> 65536, "de" -> 32768), salt = "mix1:")
      .queryExecution.executedPlan
    assert(mixPlan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"mix must not shuffle:\n$mixPlan")
    // decontamination: the tiny eval side is broadcast, so the corpus
    // streams into the join with NO exchange beneath it — the only shuffle
    // is the post-join count aggregate over the matched sliver
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Decontaminate.contaminationPairs(
          docs.where($"doc_id" % 17 =!= 0), "doc_id", "text",
          docs.where($"doc_id" % 17 === 0), "doc_id", "text",
          n = 3, minShared = 2L).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"eval side must broadcast:\n$plan")
    val beneath = bhj.flatMap(_.children)
      .flatMap(_.collect { case e: ShuffleExchangeExec => e })
    assert(beneath.isEmpty, s"corpus side shuffled before the join:\n$plan")
  }

  test("resize caps the longer side, preserves aspect, dims re-parsed from bytes") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val media = Multimodal.withMedia(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, maxDim = 100).collect()
    assert(resized.length == 40)
    for (r <- resized) {
      // metadata must round-trip through the rewritten header bytes
      val parsed = Multimodal.parseDimensions(r.payload)
      assert(parsed.contains((r.meta.format, r.meta.width, r.meta.height)),
        s"doc ${r.doc_id}")
      assert(math.max(r.meta.width, r.meta.height) <= 100, s"doc ${r.doc_id}")
      // aspect preserved within rounding
      val (ow, oh) = (64 + (r.doc_id % 8).toInt * 16, 64 + (r.doc_id % 5).toInt * 16)
      if (math.max(ow, oh) <= 100) {
        assert((r.meta.width, r.meta.height) == ((ow, oh))) // untouched
      } else {
        val s = 100.0 / math.max(ow, oh)
        assert(r.meta.width == math.max(1, math.round(ow * s).toInt))
        assert(r.meta.height == math.max(1, math.round(oh * s).toInt))
      }
    }
  }
}
