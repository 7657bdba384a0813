package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.{IcebergLite, Snapshot}

/**
 * The persisted physical design — the Spark analog of the reference's
 * segment-store build (`SegmentWikiGraphSerialization.kt:67-219`, S9):
 *
 *   pages_by_url    url-sorted node table (the "name index": point/prefix
 *                   lookups prune row groups via parquet min/max)
 *   pages_by_id     id-sorted node table (the "id index" for route joins)
 *   edges_by_src    range-partitioned src-sorted edge table (out-CSR analog)
 *   edges_by_dst    the materialized transpose (in-CSR analog — one build
 *                   shuffle buys shuffle-free backward BFS forever)
 *   adjacency_out/in packed CSR rows (salted two-phase pack for hub skew)
 *   stats           A1 statistics before/after cleanup
 *
 * All committed through Iceberg-lite so downstream jobs read a consistent
 * snapshot and the build itself is resumable (re-running skips tables whose
 * snapshot already carries the same `buildId`).
 */
object GraphTables {

  val Tables: Seq[String] = Seq("pages_by_url", "pages_by_id", "edges_by_src",
    "edges_by_dst", "adjacency_out", "adjacency_in", "stats")

  /** Build + commit every physical table; returns snapshots per table. */
  def build(graph: LinkGraph, warehouse: String, buildId: String,
      saltBuckets: Int = 16): Map[String, Snapshot] = {
    val spark = graph.pages.sparkSession
    import spark.implicits._
    val cat = new IcebergLite(warehouse)
    val parts = spark.sessionState.conf.numShufflePartitions
    val props = Map("buildId" -> buildId)

    def done(table: String): Boolean =
      cat.currentSnapshot(table).exists(_.properties.get("buildId").contains(buildId))

    val out = scala.collection.mutable.Map[String, Snapshot]()
    if (!done("pages_by_url"))
      out("pages_by_url") = cat.commit(
        graph.pages.repartitionByRange(parts, $"url").sortWithinPartitions("url").toDF(),
        "pages_by_url", props)
    if (!done("pages_by_id"))
      out("pages_by_id") = cat.commit(
        graph.pages.repartitionByRange(parts, $"id").sortWithinPartitions("id").toDF(),
        "pages_by_id", props)
    if (!done("edges_by_src"))
      out("edges_by_src") = cat.commit(
        EdgeTable.bySrc(graph.edges, parts).toDF(), "edges_by_src", props)
    if (!done("edges_by_dst"))
      out("edges_by_dst") = cat.commit(
        EdgeTable.bySrc(graph.reversed, parts).toDF(), "edges_by_dst", props)
    if (!done("adjacency_out"))
      out("adjacency_out") = cat.commit(
        EdgeTable.packAdjacencySalted(graph.edges, saltBuckets).toDF(),
        "adjacency_out", props)
    if (!done("adjacency_in"))
      out("adjacency_in") = cat.commit(
        EdgeTable.packAdjacencySalted(graph.reversed, saltBuckets).toDF(),
        "adjacency_in", props)
    if (!done("stats")) {
      val s = Seq(
        ("before", graph.statsBefore.articleCount, graph.statsBefore.redirectCount,
          graph.statsBefore.linkCount, graph.statsBefore.nullLinkCount),
        ("after", graph.statsAfter.articleCount, graph.statsAfter.redirectCount,
          graph.statsAfter.linkCount, graph.statsAfter.nullLinkCount))
        .toDF("phase", "articles", "redirects", "links", "null_links")
      out("stats") = cat.commit(s, "stats", props)
    }
    out.toMap
  }

  /** Reopen the committed tables as a query-ready [[LinkGraph]]. */
  def open(spark: SparkSession, warehouse: String): LinkGraph = {
    import spark.implicits._
    val cat = new IcebergLite(warehouse)
    val pages = cat.read(spark, "pages_by_url").as[Page]
    val edges = cat.read(spark, "edges_by_src").as[Edge]
    // the committed transpose: backward BFS reads this scan directly
    // instead of re-shuffling edges_by_src at query time
    val reversed = cat.read(spark, "edges_by_dst").as[Edge]
    val statRows = cat.read(spark, "stats")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def gs(k: String) = statRows.get(k)
      .map(r => GraphStats(r._2, r._3, r._4, r._5))
      .getOrElse(GraphStats(0, 0, 0, 0))
    LinkGraph(pages, edges, gs("before"), gs("after"), Some(reversed))
  }
}
