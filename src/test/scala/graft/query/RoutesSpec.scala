package graft.query

import graft.SparkTestBase
import graft.graph.GraphBuilder
import graft.ingest.SynthCorpus

/** Golden-route integration tests mirroring `RouteIntegrationTest.kt:37-63`
  * and `SegmentGraphIntegrationTest.kt:19-78`, on the synthetic fixtures. */
class RoutesSpec extends SparkTestBase {

  private def routesOf(pages: Seq[graft.ingest.RawPage]): Routes =
    new Routes(GraphBuilder.build(SynthCorpus.toDF(spark, pages).toDF(), smallIds = true))

  private def u(slug: String): String = SynthCorpus.urlOf(slug)
  private def slugs(route: Seq[String]): Seq[String] =
    route.map(_.stripPrefix("https://synth.example/wiki/"))

  test("chain3: route(A,C) = [A,B,C] (SegmentGraphIntegrationTest.kt:48-78)") {
    val r = routesOf(SynthCorpus.chain3)
    assert(slugs(r.findRoute(u("A"), u("C"))) == Seq("A", "B", "C"))
  }

  test("direct link: route = [Gdansk, Polska] (RouteIntegrationTest.kt:39-42)") {
    val r = routesOf(SynthCorpus.direct)
    assert(slugs(r.findRoute(u("Gdansk"), u("Polska"))) == Seq("Gdansk", "Polska"))
  }

  test("route passes through a redirect node (RouteIntegrationTest.kt:53-56)") {
    val r = routesOf(SynthCorpus.viaRedirect)
    assert(slugs(r.findRoute(u("Polska"), u("Baltycke-Morze"))) ==
      Seq("Polska", "Polsko", "Baltycke-Morze"))
  }

  test("start == end: singleton route") {
    val r = routesOf(SynthCorpus.chain3)
    assert(slugs(r.findRoute(u("B"), u("B"))) == Seq("B"))
  }

  test("no route across components is empty, missing pages throw (BadRouteException.java)") {
    val r = routesOf(SynthCorpus.disconnected)
    assert(r.findRoute(u("Island-A1"), u("Island-B2")).isEmpty)
    // reverse direction within B: B2 has no out-edges
    assert(r.findRoute(u("Island-B2"), u("Island-B1")).isEmpty)
    intercept[MissingStart](r.findRoute(u("Nope"), u("Island-A1")))
    intercept[MissingEnd](r.findRoute(u("Island-A1"), u("Nope")))
  }

  test("interactive and distributed paths return identical routes") {
    import graft.graph.{Edge, GraphBuilder}
    // fixture goldens through BOTH paths
    val r = routesOf(SynthCorpus.viaRedirect)
    assert(r.findRoute(u("Polska"), u("Baltycke-Morze")) ==
      r.findRouteDistributed(u("Polska"), u("Baltycke-Morze")))
    // random graph: same path, not just same length (tie-breaks must align)
    val corpus = SynthCorpus.generateLocal(150, avgDeg = 4)
    val routes = new Routes(GraphBuilder.build(
      SynthCorpus.toDF(spark, corpus).toDF(), smallIds = true))
    val urls = routes.pages.collect().map(_.url).sorted
    val rng = new java.util.Random(5)
    for (_ <- 0 until 5) {
      val a = urls(rng.nextInt(urls.length))
      val b = urls(rng.nextInt(urls.length))
      assert(routes.findRoute(a, b) == routes.findRouteDistributed(a, b),
        s"paths diverge for $a -> $b")
    }
  }

  test("lookups: point, prefix top-K, deterministic random (O5-O7)") {
    val r = routesOf(SynthCorpus.direct)
    assert(Lookups.point(r.pages, u("Gdansk")).exists(!_.isRedirect))
    assert(Lookups.point(r.pages, u("Zzz")).isEmpty)
    val top = Lookups.prefixTopK(r.pages, u("Noise"), 10).map(_.url)
    assert(top == Seq(u("Noise-1"), u("Noise-2")))
    val k1 = Lookups.prefixTopK(r.pages, u(""), 3)
    assert(k1.size == 3 && k1.map(_.url) == k1.map(_.url).sorted)
    val rnd1 = Lookups.randomPage(r.pages, seed = 7)
    val rnd2 = Lookups.randomPage(r.pages, seed = 7)
    assert(rnd1 == rnd2 && rnd1.nonEmpty)
  }
}
