package graft

import org.apache.spark.sql.functions._

import graft.graph.{GraphBuilder, GraphTables}
import graft.ingest.SynthCorpus
import graft.query.{Interactive, Lookups, MissingBoth, MissingEnd, MissingStart, Routes}

/**
 * Command-line surface mirroring the reference's `Main.kt` subcommands so a
 * wikilinks user can switch 1:1:
 *
 *   convert  --input <pages_raw parquet dir|synth:N> --output <warehouse>
 *            (reference: dump → graph snapshot, `Main.kt:60-102`)
 *   query    --input <warehouse> [--from URL --to URL]
 *            (with --from/--to: one route per invocation; without: the
 *             reference's interactive stdin mode, `Main.kt:283-339`,
 *             via [[graft.query.Interactive]])
 *   benchmark --input <warehouse> [--measurements N | --test]
 *            (reference: `query --benchmark`, 50 seeded pairs,
 *             `Main.kt:32,341-384`; --test runs the frozen golden
 *             route-length table, `Benchmarking.java:87-138` analog)
 *   search   --input <warehouse> --prefix P [--limit K]
 *            (reference: wildcard lookup, `Main.kt:323`)
 *   ingest   --input <pages_raw dir> --output <warehouse> [--compact-over N]
 *            (beyond the reference: continuous convert — drains new crawl
 *             files into idempotent fast-append commits; re-run to tail)
 *   analyze  --input <warehouse> --algo pagerank|hits|cc|lpa|triangles|bfs|anf
 *            [--state DIR] [--iters N] [--start URL]
 *            (beyond the reference: the north-rule iterative algorithms as
 *             a spark-submit entrypoint; with --state every superstep
 *             commits to Iceberg-lite and a re-run resumes mid-algorithm)
 *   analyze  --algo ann-index --input <warehouse> [--vectors <parquet>]
 *            [--query 0,1,2] [--nlist N] [--k K] [--nprobe P]
 *            [--append-vectors <parquet> [--neardup <threshold>]]
 *            [--stream-vectors <dir>]
 *            (build-once/probe-many ANN: --vectors trains + commits the IVF
 *             index; --query probes the committed index without retraining;
 *             --append-vectors fast-appends at the frozen quantizer, and
 *             with --neardup also emits the batch's incremental near-dup
 *             pairs — the committed corpus is never re-paired;
 *             --stream-vectors drains a growing directory through the
 *             streaming sink, with --neardup as continuous SemDeDup)
 *   pipeline --docs <parquet> --output <dir> [--min-quality Q]
 *            [--max-repetition R [--rep-ngram N]] [--langs en,de]
 *            [--decontam <eval parquet>
 *            [--ngram N] [--min-shared K]] [--mix-col C --mix g=frac,...
 *            [--mix-default F]] [--sample F] [--split 0.8,0.1,0.1]
 *            [--pack <tokenBudget>] [--id-col doc_id] [--text-col text]
 *            [--salt S]
 *            (beyond the reference: the training-data shipping pipeline as
 *            one entrypoint — quality gate, eval-set decontamination,
 *            per-group mix, deterministic sample, split labels, sequence
 *            packing — stages applied in that order, per-stage row counts
 *            printed)
 *   dedup    --input <warehouse> --docs <parquet> [--seed | --stream]
 *            (beyond the reference: the incremental text-dedup ladder as an
 *             entrypoint — --seed builds the committed fp/shingle/MinHash
 *             indexes over a seed corpus (MinHash sharing the shingle
 *             postings substrate); default runs ONE batch through
 *             [[graft.pipeline.Dedup.ladderIncremental]] and prints each
 *             pillar's ≥1-new pair count; --stream drains new files via
 *             [[graft.streaming.DedupStream]])
 */
object Cli {

  /** Argument-validation failure: surfaces as one line + exit 2. A dedicated
    * type so genuine runtime bugs (NumberFormatException, NPEs, Spark errors)
    * still propagate with their stack traces instead of being swallowed. */
  final case class UsageError(message: String) extends RuntimeException(message)

  private def usageError(message: String): Nothing = throw UsageError(message)

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  private def intArg(args: Array[String], name: String): Option[Int] =
    arg(args, name).map { v =>
      try v.toInt
      catch { case _: NumberFormatException => usageError(s"--$name expects an integer, got '$v'") }
    }

  private def doubleArg(args: Array[String], name: String): Option[Double] =
    arg(args, name).map { v =>
      try v.toDouble
      catch { case _: NumberFormatException => usageError(s"--$name expects a number, got '$v'") }
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      run(spark, args)
    } catch {
      // user-input failures only (bad args, not-a-warehouse paths) surface
      // as one line + exit 2 — anything else keeps its stack trace
      case e: UsageError =>
        System.err.println(s"error: ${e.getMessage}")
        sys.exit(2)
      case e: graft.tables.NoSuchTable =>
        System.err.println(s"error: ${e.getMessage} — is --input a graft warehouse?")
        sys.exit(2)
    } finally spark.stop()
  }

  private def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    {
      args.headOption match {
        case Some("convert") =>
          val input = arg(args, "input").getOrElse("synth:2000")
          val output = arg(args, "output").getOrElse(usageError("--output required"))
          val raw =
            if (input.startsWith("synth:"))
              SynthCorpus.generate(spark, input.stripPrefix("synth:").toLong).toDF()
            else spark.read.parquet(input)
          val t0 = System.nanoTime()
          val graph = GraphBuilder.build(raw)
          GraphTables.build(graph, output, buildId = s"convert-${raw.count()}")
          val b = graph.statsBefore; val a = graph.statsAfter
          println(f"Converted in ${(System.nanoTime() - t0) / 1e9}%.1f s")
          println(s"Before cleanup: articles=${b.articleCount} redirects=${b.redirectCount} links=${b.linkCount}")
          println(f"After cleanup:  articles=${a.articleCount} redirects=${a.redirectCount} links=${a.linkCount} dangling=${a.nullLinkCount} links/article=${a.linksPerArticle}%.2f")

        case Some("query") =>
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val routes = new Routes(GraphTables.open(spark, wh))
          (arg(args, "from"), arg(args, "to")) match {
            case (Some(from), Some(to)) =>
              val t0 = System.nanoTime()
              try {
                val route = routes.findRoute(from, to)
                val ms = (System.nanoTime() - t0) / 1e6
                if (route.isEmpty)
                  println(f"""No route found from "$from" to "$to" (in $ms%.0f ms)""")
                else
                  println(f"""Route: ${route.map("\"" + _ + "\"").mkString(" -> ")} (in $ms%.0f ms)""")
              } catch {
                // the failure-mode trio of BadRouteException.java:5-46
                case MissingBoth(s, e) =>
                  println(s"""Neither start page "$s" nor end page "$e" exists""")
                case MissingStart(u) => println(s"""Start page "$u" does not exist""")
                case MissingEnd(u) => println(s"""End page "$u" does not exist""")
              }
            case _ =>
              // no --from/--to: the reference's interactive mode
              // (`Main.kt:283-339`): stdin loop with wildcard + random pick
              Interactive.run(routes,
                new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
                System.out)
          }

        case Some("benchmark") if args.contains("--test") =>
          // reference `Benchmarking.runBenchmarksAndTest` analog: the frozen
          // golden (start, end, expectedRouteSize) table over the
          // deterministic synth:2000 corpus, per-route OK/FAIL + stats
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val routes = new Routes(GraphTables.open(spark, wh))
          routes.pages.count(); routes.edgesOut.count(); routes.edgesIn.count()
          val failures =
            try graft.query.GoldenRoutes.run(routes, System.out)
            catch {
              case _: MissingStart | _: MissingEnd => usageError(
                s"golden table is frozen for the ${graft.query.GoldenRoutes.CorpusSpec} " +
                  "corpus — build the warehouse with " +
                  s"`convert --input ${graft.query.GoldenRoutes.CorpusSpec}`")
            }
          if (failures > 0) usageError(s"$failures golden route(s) FAILED")

        case Some("benchmark") =>
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val n = intArg(args, "measurements").getOrElse(50)
          val routes = new Routes(GraphTables.open(spark, wh))
          routes.pages.count(); routes.edgesOut.count(); routes.edgesIn.count()
          // warm the lazy driver caches (url index + interactive adjacency)
          // outside the measured loop, without consuming the seeded rng
          for (a <- routes.randomUrl(0L); b <- routes.randomUrl(1L))
            routes.findRoute(a, b)
          val rng = new java.util.Random(0xcafebabeL) // Benchmarking.java:15
          val times = (0 until n).map { _ =>
            val a = routes.randomUrl(rng.nextLong()).get
            val b = routes.randomUrl(rng.nextLong()).get
            val t0 = System.nanoTime()
            routes.findRoute(a, b)
            (System.nanoTime() - t0) / 1e6
          }
          val mean = times.sum / times.size
          val std = math.sqrt(times.map(t => (t - mean) * (t - mean)).sum /
            math.max(times.size - 1, 1))
          println(f"Runs=${times.size} Min=${times.min}%.1f Max=${times.max}%.1f " +
            f"Mean=$mean%.1f StdDev=$std%.1f Sum=${times.sum}%.1f (ms)")

        case Some("search") =>
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val prefix = arg(args, "prefix").getOrElse("")
          val k = intArg(args, "limit").getOrElse(10)
          val routes = new Routes(GraphTables.open(spark, wh))
          Lookups.prefixTopK(routes.pages, prefix, k).foreach(p =>
            println(s"${p.id}\t${p.url}${if (p.isRedirect) "\t(redirect)" else ""}"))

        case Some("ingest") =>
          // continuous convert: drain new pages_raw files into the warehouse
          // as fast-append commits (idempotent across re-runs/crashes)
          val input = arg(args, "input").getOrElse(usageError("--input required"))
          val output = arg(args, "output").getOrElse(usageError("--output required"))
          val compactOver = intArg(args, "compact-over").getOrElse(64)
          val expireKeep = intArg(args, "expire-keep").getOrElse(0)
          // compaction is AUTO: the sink folds small files mid-stream once
          // the manifest exceeds the threshold (batchId guard survives —
          // compact inherits snapshot properties); --expire-keep N also
          // expires history past N snapshots after each compaction
          graft.streaming.IngestStream.run(spark, input, output,
              compactOver = compactOver, expireKeep = expireKeep)
            .foreach(_.awaitTermination())
          val cat = new graft.tables.IcebergLite(output)
          cat.currentSnapshot("links_raw") match {
            case Some(s) =>
              println(
                s"links_raw at snapshot ${s.snapshotId}: ${s.rowCount} pages, " +
                  s"${s.files.size} data files, lastBatch=${s.properties.getOrElse("batchId", "?")}")
            case None => println("no input files found; nothing committed")
          }

        case Some("dedup") =>
          // the incremental text-dedup ladder, operable end-to-end: seed the
          // committed indexes once, then feed batches (or a stream) — each
          // batch prices only itself, the corpus is never re-shingled
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val docsPath = arg(args, "docs").getOrElse(usageError("--docs required"))
          val idCol = arg(args, "id-col").getOrElse("doc_id")
          val textCol = arg(args, "text-col").getOrElse("text")
          val n = intArg(args, "n").getOrElse(3)
          val threshold = doubleArg(args, "threshold").getOrElse(0.8)
          val minShared = intArg(args, "min-shared").getOrElse(2).toLong
          val verifyThreshold =
            doubleArg(args, "verify-threshold").getOrElse(threshold)
          val maxPostings = intArg(args, "max-postings").getOrElse(0).toLong
          val compactOver = intArg(args, "compact-over").getOrElse(64)
          val expireKeep = intArg(args, "expire-keep").getOrElse(0)
          val cat = new graft.tables.IcebergLite(wh)
          if (args.contains("--seed")) {
            val docs = spark.read.parquet(docsPath)
            val t0 = System.nanoTime()
            graft.pipeline.Dedup.buildFingerprintIndex(docs, idCol, textCol, wh,
              k = intArg(args, "fp-k").getOrElse(8),
              w = intArg(args, "fp-w").getOrElse(6))
            graft.pipeline.Dedup.buildShingleIndex(docs, idCol, textCol, wh, n = n)
            // MinHash shares the shingle postings substrate — one copy of the
            // corpus's shingles serves both the Jaccard and MinHash pillars
            graft.pipeline.Dedup.buildMinhashIndex(docs, idCol, textCol, wh,
              n = n, k = intArg(args, "sig-k").getOrElse(8),
              bands = intArg(args, "bands").getOrElse(4),
              postingsTable = "shingle_index")
            println(f"seeded dedup indexes in ${(System.nanoTime() - t0) / 1e9}%.1f s")
            for (t <- Seq("fp_index", "shingle_index", "minhash_index"); s <- cat.currentSnapshot(t))
              println(s"  $t: ${s.rowCount} rows, ${s.files.size} data files")
          } else if (args.contains("--stream")) {
            // shingle_index is maintained THROUGH the MinHash path (it is the
            // index's postings substrate) — naming it separately would
            // double-append the shared table
            graft.streaming.DedupStream.run(spark, docsPath, wh,
                idCol, textCol, fpTable = "fp_index",
                minhashTable = "minhash_index",
                compactOver = compactOver, expireKeep = expireKeep)
              .fold(println("no input files found; nothing committed"))(
                _.awaitTermination())
            for (t <- Seq("fp_index", "shingle_index", "minhash_index"); s <- cat.currentSnapshot(t))
              println(s"$t at snapshot ${s.snapshotId}: ${s.rowCount} rows, " +
                s"${s.files.size} data files, lastBatch=${s.properties.getOrElse("batchId", "?")}")
          } else {
            val batch = spark.read.parquet(docsPath)
            val t0 = System.nanoTime()
            val inc = graft.pipeline.Dedup.ladderIncremental(batch, idCol,
              textCol, wh, minShared = minShared, threshold = threshold,
              verifyThreshold = verifyThreshold, maxPostings = maxPostings,
              compactOver = compactOver, expireKeep = expireKeep)
            val nDocs = batch.count()
            def show(label: String, pairs: Option[org.apache.spark.sql.DataFrame]): Unit =
              pairs.foreach { p =>
                val c = p.count()
                println(s"  $label: $c pair(s) involving a new doc")
                if (args.contains("--show-pairs"))
                  p.orderBy("a", "b").limit(20).collect()
                    .foreach(r => println(s"    ${r.getLong(0)} <-> ${r.getLong(1)}"))
              }
            println(f"ladder increment: $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
            show("passages", inc.passagePairs)
            show("jaccard ", inc.jaccardPairs)
            show("minhash ", inc.minhashPairs)
            arg(args, "pairs-out").foreach { out =>
              for ((name, p) <- Seq("passages" -> inc.passagePairs,
                  "jaccard" -> inc.jaccardPairs, "minhash" -> inc.minhashPairs);
                  df <- p)
                df.write.mode("overwrite").parquet(s"$out/$name")
              println(s"pair tables written under $out")
            }
          }

        case Some("analyze") if arg(args, "algo").contains("ann-index") =>
          // build-once/probe-many ANN index: with --vectors, train + commit
          // the IVF index into the warehouse; with --query, probe the
          // COMMITTED index (no retraining — a second invocation without
          // --vectors probes the same snapshot)
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val nlist = intArg(args, "nlist").getOrElse(16)
          val kTop = intArg(args, "k").getOrElse(5)
          val nprobe = intArg(args, "nprobe").getOrElse(4)
          val idCol = arg(args, "id-col").getOrElse("vec_id")
          val vecCol = arg(args, "vec-col").getOrElse("embedding")
          val cat = new graft.tables.IcebergLite(wh)
          arg(args, "vectors") match {
            case Some(p) =>
              val t0 = System.nanoTime()
              graft.pipeline.Similarity.buildIvfIndex(
                spark.read.parquet(p), idCol, vecCol, wh, nlist = nlist)
              val s = cat.currentSnapshot("ann_ivf_cells").get
              println(f"built ann_ivf: ${s.rowCount} vectors, ${s.files.size} " +
                f"data files, nlist=$nlist%d, in ${(System.nanoTime() - t0) / 1e9}%.1f s")
            case None =>
              val s = cat.currentSnapshot("ann_ivf_cells").getOrElse(usageError(
                "no committed ann_ivf index under --input; pass --vectors to build one"))
              println(s"reusing committed ann_ivf snapshot ${s.snapshotId} " +
                s"(${s.rowCount} vectors, nlist=${s.properties.getOrElse("nlist", "?")})")
          }
          // incremental maintenance: assign a new batch with the committed
          // (frozen) quantizer and fast-append it — no retraining. With
          // --neardup <threshold>, the append also emits the batch's
          // incremental near-dup pairs (new-vs-corpus + new-vs-new, the
          // committed corpus never re-paired) BEFORE the index mutates.
          arg(args, "append-vectors").foreach { p =>
            val batch = spark.read.parquet(p)
            arg(args, "neardup") match {
              case Some(thr) =>
                val t0 = System.nanoTime()
                val pairs = graft.pipeline.Similarity.embeddingNearDupIncremental(
                  batch, idCol, vecCol, wh, threshold = thr.toDouble).collect()
                println(f"incremental near-dup: ${pairs.length} pair(s) " +
                  f"involving the batch in ${(System.nanoTime() - t0) / 1e9}%.2f s")
                pairs.foreach(r => println(s"  ${r.getLong(0)} ~ ${r.getLong(1)}"))
              case None =>
                graft.pipeline.Similarity.appendToIvfIndex(batch, idCol, vecCol, wh)
            }
            val s = cat.currentSnapshot("ann_ivf_cells").get
            println(s"appended ${s.properties("appendedRows")} vectors " +
              s"(snapshot ${s.snapshotId}, ${s.rowCount} total)")
          }
          // continuous maintenance: drain a growing embeddings directory
          // through the streaming sink (AvailableNow trigger); with
          // --neardup each micro-batch's incremental pairs land in
          // ann_ivf_pairs before its cells append
          arg(args, "stream-vectors").foreach { dir =>
            val thr = arg(args, "neardup").map(_.toDouble).getOrElse(Double.NaN)
            graft.streaming.IndexStream.run(spark, dir, wh,
              idCol, vecCol, neardupThreshold = thr) match {
              case Some(q) =>
                q.awaitTermination()
                val s = cat.currentSnapshot("ann_ivf_cells").get
                println(s"streamed to snapshot ${s.snapshotId} (${s.rowCount} vectors total)")
                if (!thr.isNaN) {
                  val ps = cat.currentSnapshot("ann_ivf_pairs")
                  println(s"near-dup pairs table: ${ps.map(_.rowCount).getOrElse(0L)} pair(s)")
                }
              case None => println(s"no input under $dir — nothing streamed")
            }
          }
          def printProbe(label: String, t0: Long,
              rows: Array[org.apache.spark.sql.Row]): Unit = {
            println(f"$label in ${(System.nanoTime() - t0) / 1e9}%.2f s")
            rows.foreach(r => println(
              f"  q=${r.getLong(0)} rank=${r.getInt(1)} neighbor=${r.getLong(2)} cos=${r.getDouble(3)}%.6f"))
          }
          arg(args, "query").foreach { q =>
            val ids = q.split(",").toSeq.map(_.trim.toLong)
            val t0 = System.nanoTime()
            printProbe(s"probed ${ids.size} corpus-member queries", t0,
              graft.pipeline.Similarity.ivfTopKIndexed(
                spark, wh, ids, k = kTop, nprobe = nprobe).collect())
          }
          // the production probe shape: EXTERNAL query vectors from a
          // parquet table (no index scan for the query side at all)
          arg(args, "query-vectors").foreach { p =>
            val t0 = System.nanoTime()
            printProbe("probed external query vectors", t0,
              graft.pipeline.Similarity.ivfTopKVectors(
                spark, wh, spark.read.parquet(p), idCol, vecCol,
                k = kTop, nprobe = nprobe).collect())
          }

        case Some("analyze") =>
          val wh = arg(args, "input").getOrElse(usageError("--input required"))
          val algo = arg(args, "algo").getOrElse(usageError("--algo required"))
          val iters = intArg(args, "iters").getOrElse(10)
          val graph = GraphTables.open(spark, wh)
          import spark.implicits._
          val verts = graph.pages.select($"id").toDF("id")
          def log() = arg(args, "state").map(new graft.state.Supersteps(_, algo, spark))
          def printSteps(ms: Seq[graft.algo.SuperstepMetric]): Unit =
            ms.foreach(m => println(
              f"superstep ${m.superstep}%3d  rows=${m.rowsOut}%-9d wall=${m.wallMs} ms"))
          algo match {
            case "pagerank" =>
              // --warm: seed from the state dir's last committed ranks and
              // iterate to tolerance (the post-ingest reconvergence loop:
              // ingest → analyze --warm → repeat); the reconverged ranks are
              // committed back so the next cycle chains
              val warm = args.contains("--warm")
              val res = (log(), warm) match {
                case (Some(l), true) if l.lastCompleted.nonEmpty =>
                  val prev = l.lastCompleted.get
                  val r = graft.algo.PageRank.warmStart(verts, graph.edges,
                    l.readState(), maxIter = iters)
                  println(s"warm-started from superstep $prev: reconverged " +
                    s"in ${r.iterations} supersteps")
                  l.commit(prev + r.iterations, r.ranks,
                    r.metrics.lastOption.getOrElse(
                      graft.algo.SuperstepMetric("pagerank", prev, 0L, 0L, 0L, -1.0)))
                  r
                case (Some(_), true) =>
                  // an empty state dir must not silently degrade to a cold
                  // run — a typo'd --state path would cost the full cold
                  // superstep count the user passed --warm to avoid
                  usageError("--warm: no committed ranks under --state " +
                    s"${arg(args, "state").getOrElse("")}")
                case (Some(l), _) =>
                  graft.algo.PageRank.runResumable(verts, graph.edges, l, maxIter = iters)
                case (None, true) =>
                  usageError("--warm needs --state with previously committed ranks")
                case (None, _) =>
                  graft.algo.PageRank.run(verts, graph.edges, tol = 0.0, maxIter = iters)
              }
              printSteps(res.metrics)
              println("top pages by rank:")
              res.ranks.join(graph.pages, "id").orderBy($"rank".desc, $"id").limit(10)
                .select($"url", org.apache.spark.sql.functions.round($"rank", 6).as("rank"))
                .collect().foreach(r => println(f"  ${r.getDouble(1)}%.6f  ${r.getString(0)}"))
            case "cc" =>
              // --warm: seed from the state dir's last committed star
              // forest and feed the warehouse's CURRENT edges (a superset
              // of the true delta — correct for any growth since edge
              // appends only merge components); reconverges in fewer
              // rounds than cold and recommits so the next cycle chains
              val warmCc = args.contains("--warm")
              val res = (log(), warmCc) match {
                case (Some(l), true) if l.lastCompleted.nonEmpty =>
                  val prev = l.lastCompleted.get
                  val stars = l.readState().toDF("id", "component")
                  val r = graft.algo.ConnectedComponents.warmStart(
                    verts, graph.edges, stars)
                  println(s"warm-started from superstep $prev: reconverged " +
                    s"in ${r.rounds} rounds")
                  l.commit(prev + r.rounds, r.components.toDF("u", "v"),
                    r.metrics.lastOption.getOrElse(
                      graft.algo.SuperstepMetric("cc", prev, 0L, 0L, 0L, -1.0)))
                  r
                case (Some(_), true) =>
                  usageError("--warm: no committed cc state under --state " +
                    s"${arg(args, "state").getOrElse("")}")
                case (None, true) =>
                  usageError("--warm needs --state with a previously committed cc run")
                case (Some(l), _) =>
                  graft.algo.ConnectedComponents.runResumable(verts, graph.edges, l)
                case (None, _) =>
                  graft.algo.ConnectedComponents.run(verts, graph.edges)
              }
              printSteps(res.metrics)
              val sizes = res.components.groupBy($"component").count()
                .orderBy($"count".desc, $"component").limit(5).collect()
              println("largest components:")
              sizes.foreach(r => println(s"  component ${r.getLong(0)}: ${r.getLong(1)} vertices"))
            case "lpa" =>
              val res = log() match {
                case Some(l) => graft.algo.LabelPropagation.runResumable(verts, graph.edges, l, maxIter = iters)
                case None => graft.algo.LabelPropagation.run(verts, graph.edges, maxIter = iters)
              }
              printSteps(res.metrics)
              println(s"communities: ${res.labels.select($"label").distinct().count()}")
            case "triangles" =>
              val res = graft.algo.TriangleCount.run(verts, graph.edges)
              println(s"triangles: ${res.globalCount}")
            case "kcore" =>
              // dense-nucleus extraction: --k explicit, or adaptive
              // 0.75 x avg undirected degree; --rounds 0 = run to fixpoint
              val und = graph.edges.toDF()
                .select($"src".as("u"), $"dst".as("v"))
                .union(graph.edges.toDF().select($"dst".as("u"), $"src".as("v")))
                .distinct()
              val k = intArg(args, "k").getOrElse(
                math.max(1, math.floor(0.75 *
                  (und.count().toDouble / verts.count())).toInt))
              val rounds = intArg(args, "rounds").getOrElse(0)
              val res = graft.algo.KCore.run(verts, graph.edges, k, rounds)
              printSteps(res.metrics)
              println(s"$k-core after ${res.rounds} round(s): " +
                s"${res.members.count()} of ${verts.count()} vertices")
            case "walks" =>
              // deterministic hash-seeded walks (reproducible walk corpus);
              // --steps hops from every page, --seed decorrelates epochs
              val steps = intArg(args, "steps").getOrElse(4)
              val seed = arg(args, "seed").getOrElse("walk")
              val trace = graft.algo.RandomWalks.deterministic(
                verts, graph.edges, steps, seed).persist()
              val walks = trace.groupBy($"start")
                .agg(org.apache.spark.sql.functions.max($"step").as("len"))
              walks.groupBy($"len").count().orderBy($"len").collect()
                .foreach(r => println(s"walks of length ${r.getInt(0)}: ${r.getLong(1)}"))
              println(s"sample walks (seed=$seed):")
              trace.filter($"start" < 3).orderBy($"start", $"step")
                .collect().groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach {
                  case (st, rows) => println(
                    s"  $st: " + rows.sortBy(_.getInt(1)).map(_.getLong(2)).mkString(" -> "))
                }
              trace.unpersist()
            case "ppr" =>
              // personalized PageRank: proximity to the seed set (related
              // pages / seed-expanded crawl); teleport + dangling mass go
              // to the sources
              val sources = arg(args, "sources").getOrElse(usageError(
                "--sources id[,id...] required for --algo ppr"))
                .split(",").toSeq.map(_.trim.toLong)
              val res = graft.algo.PageRank.personalized(verts, graph.edges,
                sources, maxIter = iters)
              printSteps(res.metrics)
              println(s"top pages by proximity to ${sources.mkString(",")}:")
              res.ranks.join(graph.pages, "id")
                .orderBy($"rank".desc, $"id").limit(10)
                .select($"url",
                  org.apache.spark.sql.functions.round($"rank", 6).as("rank"))
                .collect().foreach(r => println(f"  ${r.getDouble(1)}%.6f  ${r.getString(0)}"))
            case "hits" =>
              // hubs & authorities; with --state every superstep commits
              // and a re-run resumes mid-algorithm like pagerank
              val res = log() match {
                case Some(l) =>
                  graft.algo.Hits.runResumable(verts, graph.edges, l, maxIter = iters)
                case None =>
                  graft.algo.Hits.run(verts, graph.edges, maxIter = iters)
              }
              printSteps(res.metrics)
              println("top pages by authority:")
              res.scores.join(graph.pages, "id")
                .orderBy($"auth".desc, $"id").limit(10)
                .select($"url",
                  org.apache.spark.sql.functions.round($"auth", 6).as("auth"))
                .collect().foreach(r => println(f"  ${r.getDouble(1)}%.6f  ${r.getString(0)}"))
            case "anf" =>
              // neighborhood function / effective diameter; --approx runs
              // the HyperBall sketch path (the web-scale one), default the
              // exact pair-frontier BFS
              val maxT = intArg(args, "max-t").getOrElse(8)
              val res =
                if (args.contains("--approx"))
                  graft.algo.Neighborhood.hyperBall(verts, graph.edges, maxT,
                    intArg(args, "log2m").getOrElse(6))
                else graft.algo.Neighborhood.exact(verts, graph.edges, maxT)
              res.counts.orderBy($"t").collect().foreach { r =>
                val c = r.get(1) match {
                  case l: java.lang.Long => l.toString
                  case d: java.lang.Double => f"${d.doubleValue}%.1f"
                }
                println(s"  N(${r.getInt(0)}) = $c")
              }
              println(f"effective diameter (q=0.9): " +
                f"${graft.algo.Neighborhood.effectiveDiameter(res.counts, 0.9)}%.2f")
            case "bfs" =>
              val startUrl = arg(args, "start").getOrElse(usageError("--start required for bfs"))
              val start = Lookups.point(graph.pages, startUrl)
                .getOrElse(usageError(s"no page $startUrl")).id
              val visited = log() match {
                case Some(l) => graft.algo.Bfs.distancesResumable(graph.edges, start, l)
                case None => graft.algo.Bfs.distances(graph.edges, start)
              }
              println(s"reachable from $startUrl: ${visited.count()} pages; by depth:")
              visited.groupBy($"dist").count().orderBy($"dist").collect()
                .foreach(r => println(s"  depth ${r.getInt(0)}: ${r.getLong(1)}"))
            case other => usageError(s"unknown --algo $other")
          }

        case Some("pipeline") =>
          import graft.pipeline.{Decontaminate, Packing, Sampling}
          val docsPath = arg(args, "docs").getOrElse(usageError("--docs required"))
          val output = arg(args, "output").getOrElse(usageError("--output required"))
          val idCol = arg(args, "id-col").getOrElse("doc_id")
          val textCol = arg(args, "text-col").getOrElse("text")
          val salt = arg(args, "salt").getOrElse("")
          def buckets(frac: Double): Int = {
            if (frac < 0.0 || frac > 1.0) usageError(s"fraction $frac not in [0,1]")
            math.round(frac * Sampling.Buckets).toInt
          }
          var df = spark.read.parquet(docsPath)
          println(s"input: ${df.count()} rows")
          // quality gate FIRST: the scalar predicates run inside the scan,
          // shrinking everything downstream (decontam/mix/pack) sees
          val minQ = doubleArg(args, "min-quality")
          val maxRep = doubleArg(args, "max-repetition")
          val langs = arg(args, "langs").map(_.split(',').toSeq).getOrElse(Nil)
          if (minQ.isDefined || maxRep.isDefined || langs.nonEmpty) {
            val repN = intArg(args, "rep-ngram").getOrElse(2)
            df = graft.pipeline.Filtering.qualityFilter(df, idCol, textCol,
              minQ.getOrElse(0.0), maxRep.getOrElse(1.0), repN, langs)
            println(s"after quality filter (min-quality=${minQ.getOrElse(0.0)}, " +
              s"max-repetition=${maxRep.getOrElse(1.0)}, rep-ngram=$repN" +
              (if (langs.nonEmpty) s", langs=${langs.mkString("/")}" else "") +
              s"): ${df.count()} rows")
          }
          for (evalPath <- arg(args, "decontam")) {
            val n = intArg(args, "ngram").getOrElse(3)
            val minShared = intArg(args, "min-shared").getOrElse(2).toLong
            df = Decontaminate.decontaminate(df, idCol, textCol,
              spark.read.parquet(evalPath),
              arg(args, "eval-id-col").getOrElse(idCol),
              arg(args, "eval-text-col").getOrElse(textCol), n, minShared)
            println(s"after decontam (n=$n, min-shared=$minShared): ${df.count()} rows")
          }
          for (mixSpec <- arg(args, "mix")) {
            val mixCol = arg(args, "mix-col").getOrElse(usageError("--mix needs --mix-col"))
            val keeps = mixSpec.split(',').map { kv =>
              kv.split('=') match {
                case Array(g, f) =>
                  g -> buckets(try f.toDouble catch {
                    case _: NumberFormatException => usageError(s"bad mix fraction '$f'") })
                case _ => usageError(s"--mix expects g=frac[,g=frac...], got '$kv'")
              }
            }.toMap
            val dflt = buckets(doubleArg(args, "mix-default").getOrElse(0.0))
            df = Sampling.sampleByGroup(df, idCol, mixCol, keeps, dflt, salt = salt)
            println(s"after mix over $mixCol: ${df.count()} rows")
          }
          for (frac <- doubleArg(args, "sample")) {
            df = Sampling.sample(df, idCol, buckets(frac))
            println(s"after sample $frac: ${df.count()} rows")
          }
          for (splitSpec <- arg(args, "split")) {
            val fs = splitSpec.split(',').map(f => try f.toDouble catch {
              case _: NumberFormatException => usageError(s"bad split fraction '$f'") })
            if (fs.length != 3) usageError("--split expects train,val,test fractions")
            if (math.abs(fs.sum - 1.0) > 1e-9) usageError("--split fractions must sum to 1")
            val cuts = Seq("train" -> buckets(fs(0)), "val" -> buckets(fs(0) + fs(1)))
            df = df.withColumn("split", Sampling.splitLabel(col(idCol), cuts, "test"))
          }
          for (budget <- arg(args, "pack")) {
            val b = try budget.toLong catch {
              case _: NumberFormatException => usageError(s"bad --pack budget '$budget'") }
            val toks = graft.pipeline.TextAnalysis.tokenCount(col(textCol)).as("_tc")
            val packs = Packing.packByBudget(
              df.select(col(idCol), toks), idCol, "_tc", b)
            df = df.join(packs, Seq(idCol))
          }
          df.write.mode("overwrite").parquet(output)
          val out = spark.read.parquet(output)
          println(s"wrote ${out.count()} rows, columns [${out.columns.mkString(", ")}] to $output")

        case other =>
          System.err.println(s"unknown command: ${other.getOrElse("")}")
          System.err.println("usage: convert|query|benchmark|search|ingest|analyze|dedup|pipeline --input ... [options]")
          sys.exit(2)
      }
    }
  }
}
