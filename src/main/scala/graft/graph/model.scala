package graft.graph

/** Node relation of the link graph (SURVEY.md §1.1): dense Long ids assigned
  * by [[Dictionary]] (the reference's int32 dense ids, `WikiProcessor.kt:36-48`,
  * widened to Long for 10^12-scale). */
case class Page(id: Long, url: String, isRedirect: Boolean)

/** Canonical edge relation (the north rule's `Dataset[Edge]`). */
case class Edge(src: Long, dst: Long)

/** CSR-packed adjacency row: per-source sorted distinct neighbor ids
  * (the reference's flat `int[]` groups, `WikiRoutes.kt:201-226`, as
  * Tungsten `ArrayType(LongType)`). */
case class Adjacency(src: Long, dsts: Array[Long])

/** Graph statistics, computed before and after redirect cleanup —
  * mirrors `WikiProcessor.kt:174-222` (A1). */
case class GraphStats(
    articleCount: Long,
    redirectCount: Long,
    linkCount: Long,
    nullLinkCount: Long) {
  def linksPerArticle: Double =
    if (articleCount == 0) 0.0 else linkCount.toDouble / articleCount
}
