package graft.graph

import java.nio.file.Files

import graft.SparkTestBase
import graft.ingest.SynthCorpus
import graft.query.Routes

class GraphTablesSpec extends SparkTestBase {

  test("build commits all tables; open round-trips; rebuild with same buildId is a no-op") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-wh").toString
    val g = GraphBuilder.build(
      SynthCorpus.toDF(spark, SynthCorpus.allFixtures).toDF(), smallIds = true)
    val snaps = GraphTables.build(g, wh, buildId = "b1")
    assert(snaps.keySet == GraphTables.Tables.toSet)

    val reopened = GraphTables.open(spark, wh)
    assert(reopened.pages.collect().map(p => (p.id, p.url, p.isRedirect)).sorted.toSeq ==
      g.pages.collect().map(p => (p.id, p.url, p.isRedirect)).sorted.toSeq)
    assert(reopened.edges.collect().map(e => (e.src, e.dst)).sorted.toSeq ==
      g.edges.collect().map(e => (e.src, e.dst)).sorted.toSeq)
    assert(reopened.statsAfter == g.statsAfter)

    // adjacency tables match direct packs
    val cat = new graft.tables.IcebergLite(wh)
    val adjOut = cat.read(spark, "adjacency_out").as[Adjacency]
      .collect().map(a => a.src -> a.dsts.toSeq).toMap
    val direct = EdgeTable.packAdjacency(g.edges)
      .collect().map(a => a.src -> a.dsts.toSeq).toMap
    assert(adjOut == direct)

    // idempotent resume: same buildId ⇒ nothing recommitted
    val again = GraphTables.build(g, wh, buildId = "b1")
    assert(again.isEmpty)
    // new buildId ⇒ new snapshots, old still readable (time travel)
    val b2 = GraphTables.build(g, wh, buildId = "b2")
    assert(b2.nonEmpty)
    assert(cat.snapshots("edges_by_src").size == 2)

    // queries run against the reopened graph
    val routes = new Routes(reopened)
    assert(routes.findRoute(SynthCorpus.urlOf("A"), SynthCorpus.urlOf("C")).size == 3)
  }
}
