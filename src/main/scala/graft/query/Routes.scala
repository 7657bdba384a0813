package graft.query

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

import graft.algo.Bfs
import graft.graph.{Edge, LinkGraph, Page}

/** Distinct route-failure modes, mirroring `BadRouteException.java:5-46`
  * (missing start / missing end are errors; no-route is an empty result). */
sealed trait RouteError extends Exception
final case class MissingStart(url: String) extends RouteError
final case class MissingEnd(url: String) extends RouteError

/**
 * Url-level shortest-route API over a built [[LinkGraph]] — the analog of
 * `WikiRoutes.findRoute` / `SegmentWikiRoutes.findRoute`
 * (`WikiRoutes.kt:37-67`, `SegmentWikiRoutes.kt:12-21`).
 *
 * Holds both edge orientations persisted (the reference materializes the
 * transpose eagerly for backward expansion, `WikiRoutes.kt:126-162`).
 */
class Routes(graph: LinkGraph, tooBig: Long = Bfs.DefaultTooBig) {

  val pages: Dataset[Page] =
    graph.pages.persist(StorageLevel.MEMORY_AND_DISK)
  val edgesOut: Dataset[Edge] =
    graph.edges.persist(StorageLevel.MEMORY_AND_DISK)
  val edgesIn: Dataset[Edge] =
    graph.reversed.persist(StorageLevel.MEMORY_AND_DISK)

  def resolve(url: String): Option[Page] = Lookups.point(pages, url)

  /** Shortest route as urls, start..end inclusive; empty = no route
    * (distinct from the missing-page errors). */
  @throws[MissingStart]
  @throws[MissingEnd]
  def findRoute(startUrl: String, endUrl: String): Seq[String] = {
    val start = resolve(startUrl).getOrElse(throw MissingStart(startUrl))
    val end = resolve(endUrl).getOrElse(throw MissingEnd(endUrl))
    Bfs.shortestPath(edgesOut, edgesIn, start.id, end.id, tooBig) match {
      case None => Nil
      case Some(ids) => urlsOf(ids)
    }
  }

  /** Route-id → url lookup (J3: tiny-side join against the pages table). */
  private def urlsOf(ids: Seq[Long]): Seq[String] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val byId = pages
      .join(org.apache.spark.sql.functions.broadcast(
        ids.zipWithIndex.toDF("id", "pos")), "id")
      .select($"pos", $"url").as[(Int, String)]
      .collect().toMap
    ids.indices.map(byId)
  }
}
