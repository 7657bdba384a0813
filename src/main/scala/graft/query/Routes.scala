package graft.query

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

import graft.algo.Bfs
import graft.graph.{Edge, LinkGraph, Page}

/** Distinct route-failure modes, mirroring `BadRouteException.java:5-46`
  * (missing start / missing end / both are errors with their own messages;
  * no-route is an empty result). */
sealed trait RouteError extends Exception
final case class MissingStart(url: String) extends RouteError
final case class MissingEnd(url: String) extends RouteError
final case class MissingBoth(startUrl: String, endUrl: String) extends RouteError

/**
 * Url-level shortest-route API over a built [[LinkGraph]] — the analog of
 * `WikiRoutes.findRoute` / `SegmentWikiRoutes.findRoute`
 * (`WikiRoutes.kt:37-67`, `SegmentWikiRoutes.kt:12-21`).
 *
 * Holds both edge orientations persisted (the reference materializes the
 * transpose eagerly for backward expansion, `WikiRoutes.kt:126-162`).
 *
 * Two execution paths, chosen by graph size (the reference is ONLY the
 * first; we add the second for graphs that don't fit one machine):
 *  - interactive: edge count ≤ `interactiveMaxEdges` ⇒ collect packed
 *    adjacency into driver arrays once (the analog of the reference's mmap
 *    `LeanPageMapper`, `WikiRoutes.kt:106-124`) and answer routes in-memory
 *    at sub-millisecond superstep cost
 *  - distributed: Dataset-superstep bidirectional BFS ([[Bfs]])
 *
 * The driver url↔page index is gated SEPARATELY on `urlIndexMaxPages`:
 * pages ≪ edges (enwiki: ~7M urls vs ~1G links; the reference holds its
 * whole 12M-entry title map in a 2 GB JVM, `WikiProcessor.kt:33`), so REPL
 * prompt validation, `#` wildcard listing and `<` random pick stay
 * job-free driver lookups even when the EDGE set is past the interactive
 * threshold and each route runs as distributed supersteps. The 2M default
 * is sized for Spark's DEFAULT 1g driver heap (~2M Page rows ≈ 300 MB with
 * JVM string overhead); raise it when the driver has the reference's 2 GB+
 * (enwiki's 7M pages fit there, per the reference's own design point).
 */
class Routes(graph: LinkGraph, tooBig: Long = Bfs.DefaultTooBig,
    interactiveMaxEdges: Long = 5000000L,
    urlIndexMaxPages: Long = 2000000L) {

  val pages: Dataset[Page] =
    graph.pages.persist(StorageLevel.MEMORY_AND_DISK)
  val edgesOut: Dataset[Edge] =
    graph.edges.persist(StorageLevel.MEMORY_AND_DISK)
  val edgesIn: Dataset[Edge] =
    graph.reversed.persist(StorageLevel.MEMORY_AND_DISK)

  def resolve(url: String): Option[Page] = Lookups.point(pages, url)

  /** Driver-side adjacency cache for the interactive path (built lazily,
    * once). None when the graph is above the interactive threshold. */
  private lazy val interactive: Option[InMemoryBfs] = {
    val e = edgesOut.count()
    if (e > interactiveMaxEdges) None
    else Some(InMemoryBfs.fromEdges(
      edgesOut.collect().map(ed => (ed.src, ed.dst))))
  }

  /** Driver-side url↔page index — the analog of the reference's mmap'd
    * name/id indexes (`SegmentWikiGraphStore.kt:240-258`): without it every
    * route would pay two distributed point-lookup jobs. Gated on PAGE count
    * (not edge count): it serves the REPL even over graphs whose edges are
    * past the interactive threshold. */
  private lazy val urlIndex: Option[(java.util.HashMap[String, Page],
                                     java.util.HashMap[Long, String])] = {
    if (pages.count() > urlIndexMaxPages) None
    else Some {
      val byUrl = new java.util.HashMap[String, Page]()
      val byId = new java.util.HashMap[Long, String]()
      pages.collect().foreach { p => byUrl.put(p.url, p); byId.put(p.id, p.url) }
      (byUrl, byId)
    }
  }

  /** Point lookup through the driver index when present (no job), else a
    * distributed pushed-filter lookup. */
  private def lookupPage(url: String): Option[Page] = urlIndex match {
    case Some((byUrl, _)) => Option(byUrl.get(url))
    case None => resolve(url)
  }

  /** Fail with the error matching which endpoints are missing — BOTH missing
    * is its own mode (`BadRouteException.java:25-31`; reference renders
    * "Neither start point X or end point Y do exist", `Main.kt:296-301`). */
  private def require2(startUrl: String, start: Option[Page],
      endUrl: String, end: Option[Page]): (Page, Page) = (start, end) match {
    case (Some(s), Some(e)) => (s, e)
    case (None, None) => throw MissingBoth(startUrl, endUrl)
    case (None, _) => throw MissingStart(startUrl)
    case _ => throw MissingEnd(endUrl)
  }

  /** Does a page with this exact url exist? (interactive prompt validation,
    * `Main.kt:333` `routes.hasPage`). */
  def hasPage(url: String): Boolean = lookupPage(url).isDefined

  import Routes.utf8Compare

  /** url array in unsigned-bytewise order — the driver analog of the
    * reference's mmap'd sorted name index, built once per interactive graph. */
  private lazy val sortedUrls: Option[Array[String]] =
    urlIndex.map { case (byUrl, _) =>
      val arr = byUrl.keySet.toArray(new Array[String](0))
      java.util.Arrays.sort(arr, (a: String, b: String) => utf8Compare(a, b))
      arr
    }

  /** Prefix top-K urls. Interactive graphs answer from the sorted driver
    * index (binary search, no job — reference parity for the REPL's `#`
    * listing); larger graphs fall through to the distributed
    * TakeOrderedAndProject. Identical results either way (collation proven
    * in RoutesSpec). */
  def prefixSearch(prefix: String, k: Int = 10): Seq[String] = sortedUrls match {
    case Some(arr) =>
      var lo = 0; var hi = arr.length
      while (lo < hi) { // leftmost insertion point of prefix
        val mid = (lo + hi) >>> 1
        if (utf8Compare(arr(mid), prefix) < 0) lo = mid + 1 else hi = mid
      }
      arr.iterator.slice(lo, arr.length).takeWhile(_.startsWith(prefix))
        .take(k).toSeq
    case None => Lookups.prefixTopK(pages, prefix, k).map(_.url)
  }

  /** Seeded random page url: uniform driver-index draw on interactive
    * graphs, the distributed hash-order draw otherwise. */
  def randomUrl(seed: Long): Option[String] = sortedUrls match {
    case Some(arr) if arr.nonEmpty =>
      Some(arr((new java.util.Random(seed).nextInt(Int.MaxValue)) % arr.length))
    case Some(_) => None
    case None => Lookups.randomPage(pages, seed).map(_.url)
  }

  /** Shortest route as urls, start..end inclusive; empty = no route
    * (distinct from the missing-page errors). */
  @throws[MissingStart]
  @throws[MissingEnd]
  @throws[MissingBoth]
  def findRoute(startUrl: String, endUrl: String): Seq[String] = {
    (interactive, urlIndex) match {
      case (Some(mem), Some((byUrl, byId))) =>
        val (start, end) = require2(
          startUrl, Option(byUrl.get(startUrl)), endUrl, Option(byUrl.get(endUrl)))
        mem.shortestPath(start.id, end.id, tooBig) match {
          case None => Nil
          case Some(path) => path.map(byId.get(_))
        }
      case _ => findRouteDistributed(startUrl, endUrl)
    }
  }

  /** Force the distributed superstep path regardless of graph size (used by
    * tests to exercise both implementations on the same graph). */
  @throws[MissingStart]
  @throws[MissingEnd]
  @throws[MissingBoth]
  def findRouteDistributed(startUrl: String, endUrl: String): Seq[String] = {
    val (start, end) = require2(
      startUrl, lookupPage(startUrl), endUrl, lookupPage(endUrl))
    Bfs.shortestPath(edgesOut, edgesIn, start.id, end.id, tooBig) match {
      case None => Nil
      case Some(ids) => urlIndex match {
        case Some((_, byId)) => ids.map(byId.get(_))
        case None => urlsOf(ids)
      }
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

object Routes {
  /** Unsigned-UTF-8-byte string order — the SAME collation as Spark's
    * UTF8String (and the reference's comparator, `BufferWikiPage.java:134-154`),
    * so the driver index and the distributed `Lookups.prefixTopK` sort
    * identically on any input (Java's natural String order would diverge on
    * supplementary-plane characters). Property-tested in KernelProperties. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}
