package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.algo.PageRank
import graft.graph.GraphBuilder
import graft.ingest.{SynthCorpus, SynthGraph}
import graft.query.{Lookups, Routes}

/**
 * Benchmark main (driver-run per round → BENCH_r{N}.json).
 *
 * Emits ONE JSON line:
 *   - `queries`: wall seconds per headline query on SPARK_GRAFT_SF_DIR
 *   - `scaling`: the north-rule two-cluster-size evidence — the SAME
 *     PageRank job on the SAME synthetic edge table at local[N] and
 *     local[4N], sessions interleaved N,4N,N,4N, per-side throughput =
 *     edges / min superstep wall time across that side's sessions, and
 *     efficiency = throughput(4N) / (4 × throughput(N))  (target ≥ 0.8;
 *     sandbox protocol per BASELINE.md — no real cluster here)
 *   - `route_ms`: seeded route-latency stats mirroring the reference's
 *     `query --benchmark` (Benchmarking.java:14-34: seeded pairs,
 *     min/max/mean over wall ms)
 */
object Bench {

  /** Representative subset of SparkEntry.queries for per-round timing. */
  private val Headline = Seq(
    "g_edges", "g_degrees", "g_adjacency", "g_triangles", "g_cc", "g_bfs",
    "g_pagerank", "g_ppr", "g_hits", "g_anf", "g_condense", "g_walks",
    "g_kcore",
    "q1_agg", "q_join_revenue", "q_window_events",
    "d_exact", "d_jaccard", "d_minhash_lsh", "d_minhash_incr",
    "d_clusters", "d_clusters_warm", "d_passages", "d_passages_incr",
    "t_langid", "s_ann_topk", "s_neardup", "x_neardup_incr",
    "x_simhash_pairs", "p_pack", "p_filter")

  /** Fixed single-thread CPU spin (2e8 xorshift steps), timed — the
    * CALIBRATION scalar: it has no I/O, no JVM-warmup sensitivity beyond
    * the first call, and a known quiet-box cost, so a polluted benchmark
    * window shows up as an inflated spin in the artifact itself instead of
    * needing cross-referenced reruns (the round-3 driver artifact was ~3×
    * inflated and only six local artifacts proved it environmental). */
  private def spinSeconds(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 200000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    if (x == 0L) System.err.println("") // keep the loop live
    (System.nanoTime() - t0) / 1e9
  }

  private def session(cores: Int): SparkSession = {
    val s = GraftSession.builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One scaling-evidence session at `cores`: small-graph JIT warmup, then
    * `iters` measured PageRank supersteps on the full graph. Returns the
    * per-superstep wall seconds. Setup (edge gen, weight join, persist) is
    * one-time cost and excluded. Throughput is edges / MIN step across all
    * of a side's sessions: superstep noise (GC, page cache, co-tenant load)
    * is strictly one-sided, so the min estimates steady-state capability —
    * the same statistic on both sides of the efficiency ratio. */
  private def pagerankSteps(cores: Int, vertices: Long, edgeCount: Long,
      iters: Int): (Long, Seq[Double]) = {
    val spark = session(cores)
    try {
      import spark.implicits._
      val wEdges = SynthGraph.edges(spark, vertices / 16, edgeCount / 16, seed = 7L)
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      PageRank.run(spark.range(vertices / 16).toDF("id"), wEdges, tol = 0.0, maxIter = 2)
      wEdges.unpersist()
      val edges = SynthGraph.edges(spark, vertices, edgeCount)
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val e = edges.count() // materialize outside the timed region
      val verts = spark.range(vertices).toDF("id")
      val res = PageRank.run(verts, edges, tol = 0.0, maxIter = iters)
      edges.unpersist()
      (e, res.metrics.map(_.wallMs / 1e3))
    } finally {
      spark.stop()
      // the next session shares this JVM: collect this one's garbage now so
      // its GC debt doesn't bill the next measurement
      System.gc()
      Thread.sleep(500)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- scaling evidence: same job, same input, N vs 4N cores.
    // Pair = local[2] vs local[8] (BASELINE.md sandbox protocol): on this
    // 32-vCPU single box, local[32] conflates executor threads with the
    // driver/scheduler and the shared memory subsystem, so the clean
    // multi-executor proxy is the pair that leaves the machine unsaturated.
    // Sessions are INTERLEAVED (N, 4N, N, 4N) and each side's throughput is
    // edges / min step across both of its sessions: a load spike localized
    // in time (the round-1 artifact caught one — 0.706 vs 0.86+ on a quiet
    // box) then hits both sides symmetrically instead of sinking one.
    // Sample sizes (round-3 hardening): the min-step statistic needs just ONE
    // clean window per side, and the short (~1.5 s) 4N steps are the ones
    // co-tenant load pollutes — r1/r2 driver runs never caught a clean 4N
    // minimum with 2 sessions × 5 steps (quiet-box efficiency measures 0.98,
    // ScalingProbe). 3 interleaved sessions per side, 8 measured supersteps
    // per session ON BOTH SIDES — the sample count must be symmetric: min of
    // more draws sits closer to the true minimum, so more 4N samples than N
    // samples would bias the efficiency ratio upward under noise.
    val vertices = 1000000L
    val edgeCount = 16000000L
    val sessionsPerSide = 3
    val itersN = 8
    val iters4N = 8
    val coresN = 2
    val cores4N = 8
    val stepsN = scala.collection.mutable.ArrayBuffer[Double]()
    val steps4N = scala.collection.mutable.ArrayBuffer[Double]()
    var distinctEdges = 0L
    for (_ <- 0 until sessionsPerSide) {
      val (e1, s1) = pagerankSteps(coresN, vertices, edgeCount, itersN)
      stepsN ++= s1
      val (_, s2) = pagerankSteps(cores4N, vertices, edgeCount, iters4N)
      steps4N ++= s2
      distinctEdges = e1
    }
    val thrN = distinctEdges.toDouble / stepsN.min
    val thr4N = distinctEdges.toDouble / steps4N.min
    val efficiency = thr4N / (4.0 * thrN)

    // --- headline queries + route latency at full cores ---
    val spinScaling = spinSeconds() // calibrates the scaling window above
    val spark = session(cpus)
    import spark.implicits._
    val spinStart = spinSeconds()
    // BEST-OF-2 per query: each runs twice back-to-back and reports the
    // min — the same min-statistic argument as the scaling supersteps
    // (noise from co-tenant load, GC, and cold page cache is strictly
    // one-sided), and it retires the recurring cold-start-inflation class
    // (x_simhash_pairs read 3.9-5.0 s in three driver artifacts, 0.7-0.9 s
    // warm). Both runs are recorded so the artifact shows the spread.
    val results: Seq[(String, Seq[Double])] = Headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}") }
          val secs = (System.nanoTime() - t0) / 1e9
          // queries are independent; drop their internal persists so one
          // query's leftover cache can't evict-churn the next.
          // clearCache() alone is NOT enough: localCheckpoint blocks are
          // plain persistent RDDs freed only when the driver GCs the RDD
          // object, so the checkpoint-heavy queries' residue accumulates
          // in the block manager and uniformly inflates everything after
          // them (measured: the like-for-like-19 subtotal grew 21.3 →
          // 30.3 s as the headline set grew 21 → 30 queries, quiet spins
          // throughout) — unpersist every tracked RDD explicitly
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          secs
        }
        name -> runs
      }
    }
    val spinEnd = spinSeconds()

    // route latency: deterministic corpus + seeded pairs (0xcafebabe,
    // mirroring Benchmarking.java:15)
    val corpus = SynthCorpus.generate(spark, 10000, avgDeg = 8)
    val tEtl0 = System.nanoTime()
    val graph = GraphBuilder.build(corpus.toDF())
    graph.edges.count()
    val etlSecs = (System.nanoTime() - tEtl0) / 1e9
    val routes = new Routes(graph)
    routes.pages.count(); routes.edgesOut.count(); routes.edgesIn.count()
    val rng = new java.util.Random(0xcafebabeL)
    val pageUrls = routes.pages.orderBy("url").collect().map(_.url)
    def pair(): (String, String) =
      (pageUrls(rng.nextInt(pageUrls.length)), pageUrls(rng.nextInt(pageUrls.length)))
    val warm = pair(); routes.findRoute(warm._1, warm._2) // build adjacency cache
    val routeMs = (0 until 50).map { _ =>
      val (a, b) = pair()
      val t0 = System.nanoTime()
      routes.findRoute(a, b) // interactive path (graph under threshold)
      (System.nanoTime() - t0) / 1e6
    }
    val routeDistMs = (0 until 5).map { _ =>
      val (a, b) = pair()
      val t0 = System.nanoTime()
      routes.findRouteDistributed(a, b)
      (System.nanoTime() - t0) / 1e6
    }

    // committed ANN index: build ONCE over the sf embeddings, probe twice —
    // the probe-vs-build economics the committed index exists for (probes
    // must not pay the corpus-sized train/assign cost)
    val annWh = java.nio.file.Files.createTempDirectory("bench-ann").toString
    val annEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ta0 = System.nanoTime()
    graft.pipeline.Similarity.buildIvfIndex(annEmb, "vec_id", "embedding", annWh)
    val annBuild = (System.nanoTime() - ta0) / 1e9
    val annProbes = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.ivfTopKIndexed(spark, annWh,
        Seq(0L, 1L, 2L), k = 10, nprobe = 4).count()
      (System.nanoTime() - t0) / 1e9
    }

    // committed LSH index: same build-once/probe-many economics for the
    // bucket-table path, vs lshTopK's re-bucket-the-corpus-per-call
    val tl0 = System.nanoTime()
    graft.pipeline.Similarity.buildLshIndex(annEmb, "vec_id", "embedding",
      annWh, planes = 8)
    val lshBuild = (System.nanoTime() - tl0) / 1e9
    val lshProbes = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.lshTopKIndexed(spark, annWh,
        Seq(0L, 1L, 2L), k = 10, probeHamming = 1).count()
      (System.nanoTime() - t0) / 1e9
    }
    val tl1 = System.nanoTime()
    graft.pipeline.Similarity.lshTopK(annEmb, "vec_id", "embedding",
      Seq(0L, 1L, 2L), k = 10, planes = 8, probeHamming = 1).count()
    val lshRebucket = (System.nanoTime() - tl1) / 1e9

    val qs = results.map { case (k, v) => "\"" + k + f"\":${v.min}%.3f" }
      .mkString("{", ",", "}")
    val qruns = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(s => f"$s%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","best_of":2,""" +
      f""""queries":$qs,"query_runs":$qruns,""" +
      f""""calibration":{"spin_iters":200000000,"quiet_spin_s":"~0.42-0.48",""" +
      f""""spin_s":[$spinScaling%.3f,$spinStart%.3f,$spinEnd%.3f]},"sf":"$sfDir",""" +
      f""""scaling":{"cores_n":$coresN,"cores_4n":$cores4N,"vertices":$vertices,"edges":${distinctEdges},""" +
      f""""sessions_per_side":$sessionsPerSide,"supersteps_n":$itersN,"supersteps_4n":$iters4N,""" +
      f""""throughput_n":$thrN%.0f,"throughput_4n":$thr4N%.0f,""" +
      f""""unit":"edges/sec/superstep","efficiency":$efficiency%.3f,""" +
      s""""steps_n":[${stepsN.map(s => f"$s%.2f").mkString(",")}],""" +
      s""""steps_4n":[${steps4N.map(s => f"$s%.2f").mkString(",")}]},""" +
      f""""ann_index":{"build_s":$annBuild%.2f,"probe1_s":${annProbes(0)}%.2f,""" +
      f""""probe2_s":${annProbes(1)}%.2f},""" +
      f""""lsh_index":{"build_s":$lshBuild%.2f,"probe1_s":${lshProbes(0)}%.2f,""" +
      f""""probe2_s":${lshProbes(1)}%.2f,"rebucket_per_call_s":$lshRebucket%.2f},""" +
      f""""route_ms":{"runs":${routeMs.size},"min":${routeMs.min}%.2f,"max":${routeMs.max}%.2f,""" +
      f""""mean":${routeMs.sum / routeMs.size}%.2f},""" +
      f""""route_distributed_ms":{"runs":${routeDistMs.size},"min":${routeDistMs.min}%.1f,""" +
      f""""max":${routeDistMs.max}%.1f,"mean":${routeDistMs.sum / routeDistMs.size}%.1f},""" +
      f""""etl":{"pages":10000,"seconds":$etlSecs%.1f}}"""
    println(json)
    spark.stop()
  }
}
