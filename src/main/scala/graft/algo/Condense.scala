package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.graph.Edge

/**
 * Graph contraction: collapse a vertex-level edge list by a vertex→group
 * mapping into the weighted SUPER-graph over the groups — the web-analytics
 * coarsening step behind host graphs (pages grouped by site), community
 * graphs (pages grouped by [[LabelPropagation]] / [[ConnectedComponents]]
 * labels), and dedup-cluster graphs (docs grouped by
 * [[graft.pipeline.Dedup.canonicalize]] labels). On a 100 TB page graph the
 * contracted graph is the one that fits an analyst's tooling: ~10⁹ pages
 * collapse to ~10⁷ hosts.
 *
 * Semantics: every edge (u, v) becomes (label(u), label(v)); `weight` counts
 * the vertex-level edges behind each super-edge. Intra-group edges surface
 * as self-loops with `keepSelfLoops = true` (the within-group density — what
 * a host's internal-navigation share or a community's cohesion reads from)
 * and are dropped otherwise (the classic condensation). Vertices missing
 * from `labels` are treated as their own singleton group (label = id), so a
 * partial community assignment still contracts totally — no edge silently
 * vanishes.
 *
 * Physical shape — two equi-joins of the m-row edge list against the n-row
 * label map plus one hash aggregation, all skew-tolerant: the joins key on
 * vertex id (labels are one row per vertex — no fan-out), and the groupBy's
 * partial aggregation combines each super-edge map-side, so a hub GROUP
 * (the giant community every page links into) arrives at the shuffle as one
 * row per map partition, not one per edge. Catalyst/AQE broadcast the label
 * side automatically when it is small; nothing here needs a hint.
 */
object Condense {

  /**
   * @param edges  vertex-level directed edges
   * @param labels (id, label) vertex→group map, ≤1 row per id (enforced
   *               upstream by the label-producing algorithms; duplicate ids
   *               would double-count their edges)
   * @return (src_label, dst_label, weight) — the contracted multigraph
   *         rolled up to weighted super-edges
   */
  def contract(
      edges: Dataset[Edge],
      labels: DataFrame,
      keepSelfLoops: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val lab = labels.select(col(labels.columns.head).as("id"),
      col(labels.columns(1)).as("label"))
    val mapped = edges.toDF()
      .join(lab.withColumnRenamed("id", "src"), Seq("src"), "left")
      .select($"dst", coalesce($"label", $"src").as("src_label"))
      .join(lab.withColumnRenamed("id", "dst"), Seq("dst"), "left")
      .select($"src_label", coalesce($"label", $"dst").as("dst_label"))
    val kept =
      if (keepSelfLoops) mapped
      else mapped.filter($"src_label" =!= $"dst_label")
    kept.groupBy($"src_label", $"dst_label")
      .agg(count(lit(1)).as("weight"))
  }
}
