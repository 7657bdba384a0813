package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.graph.Edge

/**
 * Triangle counting over the undirected view of the edge table, by
 * degree-based edge orientation + wedge join (the standard MapReduce
 * formulation; avoids enumerating hub wedges from high-degree endpoints —
 * the north-rule skew story for this operator).
 *
 *   1. canonical undirected edges (a<b), dedup
 *   2. orient each edge from lower (degree, id) endpoint to higher
 *   3. wedges: o(a,b) ⋈ o(a,c) with b<c; triangle iff oriented edge (b,c)
 *      exists (left-semi against the oriented set)
 *
 * Every wedge is generated at its lowest-degree vertex, so work is
 * Σ deg_lo(v)², bounded even on power-law graphs.
 */
object TriangleCount {

  case class Result(globalCount: Long, perVertex: DataFrame)

  def run(vertices: DataFrame, edges: Dataset[Edge]): Result = {
    val spark = edges.sparkSession
    import spark.implicits._

    val verts = vertices.select(col(vertices.columns.head).as("id"))
    val und = edges.toDF()
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
      .localCheckpoint(true)

    val deg = und.select($"a".as("id")).union(und.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))

    // orient: from lower (deg, id) to higher (deg, id)
    val withDegs = und
      .join(deg.select($"id".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"id".as("b"), $"deg".as("db")), "b")
    val oriented = withDegs.select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), struct($"a".as("lo"), $"b".as("hi")))
          .otherwise(struct($"b".as("lo"), $"a".as("hi"))).as("e"))
      .select($"e.lo".as("lo"), $"e.hi".as("hi"))
      .localCheckpoint(true)

    // wedges from the low vertex; close against oriented edges
    val o1 = oriented.select($"lo".as("w"), $"hi".as("x"))
    val o2 = oriented.select($"lo".as("w"), $"hi".as("y"))
    val wedges = o1.join(o2, "w").filter($"x" < $"y")
    // union is positional: both sides must select (x, y) in that order
    val closingA = oriented.select($"lo".as("x"), $"hi".as("y"))
    val closingB = oriented.select($"hi".as("x"), $"lo".as("y"))
    val triangles = wedges.join(closingA.union(closingB).distinct(),
        Seq("x", "y"), "left_semi")
      .select($"w", $"x", $"y")
      .localCheckpoint(true)

    val global = triangles.count()
    val perVertex = verts.join(
        triangles.select($"w".as("id"))
          .union(triangles.select($"x".as("id")))
          .union(triangles.select($"y".as("id")))
          .groupBy($"id").agg(count(lit(1)).as("tc")),
        Seq("id"), "left")
      .select($"id", coalesce($"tc", lit(0L)).as("triangles"))
    Result(global, perVertex)
  }

  /** Driver brute-force oracle. */
  def oracle(n: Int, edges: Seq[(Int, Int)]): (Long, Array[Long]) = {
    val adj = Array.fill(n)(scala.collection.mutable.Set[Int]())
    for ((a, b) <- edges if a != b) { adj(a) += b; adj(b) += a }
    var global = 0L
    val per = Array.fill(n)(0L)
    for (a <- 0 until n; b <- adj(a) if b > a; c <- adj(a) if c > b)
      if (adj(b).contains(c)) {
        global += 1; per(a) += 1; per(b) += 1; per(c) += 1
      }
    (global, per)
  }
}
