package graft.query

import graft.SparkTestBase
import graft.graph.GraphBuilder
import graft.ingest.SynthCorpus

/**
 * Expected-hops differential harness — the analog of the reference's dormant
 * (start, end, expectedHops) table (`Benchmarking.java:87-138`; unreachable
 * encoded as -1). An INDEPENDENT driver-side implementation of the whole
 * chain (redirect-chain elimination → live-link adjacency → BFS) recomputes
 * every expected length; the engine's distributed build + route must agree
 * on deterministic seeded pairs end-to-end.
 */
class GoldenRoutesSpec extends SparkTestBase {

  private lazy val corpus = SynthCorpus.generateLocal(200, avgDeg = 5)

  private lazy val oracleAdj: Map[String, Seq[String]] = {
    // driver-side rebuild of the same graph semantics for freezing new goldens
    val redirects = corpus.flatMap { p =>
      graft.ingest.Extract.extractRedirect(p.html, p.url).map(p.url -> _)
    }.toMap
    val urls = corpus.map(_.url).toSet
    def endsSomewhere(u: String, seen: Set[String]): Boolean =
      redirects.get(u) match {
        case None => urls.contains(u)
        case Some(t) =>
          if (seen.contains(u)) false else endsSomewhere(t, seen + u)
      }
    val live = corpus.filter(p => !redirects.contains(p.url) ||
      endsSomewhere(p.url, Set.empty)).map(_.url).toSet
    corpus.filter(p => live.contains(p.url)).map { p =>
      val targets = redirects.get(p.url) match {
        case Some(t) => Seq(t)
        case None => graft.ingest.Extract.extractLinks(p.html, p.url)
      }
      p.url -> targets.filter(live.contains).distinct
    }.toMap
  }

  private def oracleHops(a: String, b: String): Int = {
    if (a == b) return 0
    val dist = scala.collection.mutable.Map(a -> 0)
    val q = scala.collection.mutable.Queue(a)
    while (q.nonEmpty) {
      val v = q.dequeue()
      for (w <- oracleAdj.getOrElse(v, Nil) if !dist.contains(w)) {
        dist(w) = dist(v) + 1; q.enqueue(w)
      }
    }
    dist.getOrElse(b, -1)
  }

  test("frozen 50-pair golden table reproduces exactly on the synth:2000 build") {
    // the operational harness behind `Cli benchmark --test`: the engine's
    // distributed build must reproduce every frozen expected route size
    // (computed once by the independent driver oracle and checked into
    // GoldenRoutes.Table, like the reference's static ROUTES array)
    val routes = new Routes(graft.graph.GraphBuilder.build(
      SynthCorpus.generate(spark, 2000).toDF(), smallIds = true))
    val sink = new java.io.ByteArrayOutputStream()
    val failures = GoldenRoutes.run(routes, new java.io.PrintStream(sink))
    assert(failures == 0, sink.toString.linesIterator
      .filter(_.contains("FAIL")).take(5).mkString("\n"))
    assert(GoldenRoutes.Table.size == 50)
    assert(GoldenRoutes.Table.exists(_._3 == 0), "table must cover unreachable")
  }

  test("golden route lengths on the frozen seed-42 corpus (Benchmarking.java:87-138 analog)") {
    val routes = new Routes(GraphBuilder.build(
      SynthCorpus.toDF(spark, corpus).toDF(), smallIds = true))
    val urls = corpus.map(_.url).sorted
    val rng = new java.util.Random(0xcafebabeL)
    val pairs = (0 until 8).map { _ =>
      (urls(rng.nextInt(urls.length)), urls(rng.nextInt(urls.length)))
    }
    for ((a, b) <- pairs) {
      val want = oracleHops(a, b)
      val got = try {
        val r = routes.findRoute(a, b)
        if (r.isEmpty) -1 else r.length - 1
      } catch {
        // a pair endpoint can be a DROPPED redirect: distinct error outcome
        case _: MissingStart | _: MissingEnd => -2
      }
      if (got != -2)
        assert(got == want, s"route($a, $b): got $got want $want")
    }
  }
}
