package graft.query

import graft.SparkTestBase
import graft.graph.GraphBuilder
import graft.ingest.SynthCorpus

/**
 * End-to-end unicode robustness: non-ASCII page names (Latin-extended,
 * CJK, and a supplementary-plane emoji slug) through the WHOLE chain —
 * extraction, dictionary encoding, parquet, routing, prefix search —
 * where the kernels are property-tested individually but the seams
 * (Spark's UTF8String vs JVM Strings vs parquet bytes) are not.
 */
class UnicodeSpec extends SparkTestBase {

  private def u(slug: String): String = SynthCorpus.urlOf(slug)

  private lazy val routes: Routes = {
    val pages = Seq(
      SynthCorpus.page("Żółć", Seq("東京")),
      SynthCorpus.page("東京", Seq("😀-page")),
      SynthCorpus.page("😀-page", Nil),
      SynthCorpus.page("plain", Seq("Żółć")))
    new Routes(GraphBuilder.build(SynthCorpus.toDF(spark, pages).toDF(),
      smallIds = true))
  }

  test("routes traverse unicode page names byte-exactly") {
    assert(routes.findRoute(u("plain"), u("😀-page")) ==
      Seq(u("plain"), u("Żółć"), u("東京"), u("😀-page")))
    // interactive and distributed paths agree on the unicode graph
    assert(routes.findRoute(u("Żółć"), u("😀-page")) ==
      routes.findRouteDistributed(u("Żółć"), u("😀-page")))
  }

  test("prefix search and point lookups agree across driver index and Spark") {
    for (p <- Seq(u("Ż"), u("東"), u("😀"), u(""), "zzz"))
      assert(routes.prefixSearch(p, 10) ==
        Lookups.prefixTopK(routes.pages, p, 10).map(_.url), s"prefix '$p'")
    assert(routes.hasPage(u("東京")))
    assert(!routes.hasPage(u("東京").dropRight(1)))
  }

  test("dictionary ids are the unsigned-bytewise rank of the unicode urls") {
    val got = routes.pages.collect().sortBy(_.id).map(_.url).toSeq
    val want = got.sortWith((a, b) => Routes.utf8Compare(a, b) < 0)
    assert(got == want, "id order must be the utf8-bytewise url order")
  }
}
