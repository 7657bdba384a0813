package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.graph.Edge

/**
 * Connected components via alternating large-star / small-star (Kiveris et
 * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
 * specific algorithm the north rule names. Treats the link graph as
 * undirected (weakly connected components).
 *
 * Each round is two Dataset passes over the evolving edge list:
 *   large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
 *                  (and keep (u, m) so roots stay attached)
 *   small-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u) ∪ {u}, v ≤ u
 * Convergence: the edge multiset reaches a fixed point (checked by a
 * cheap count + xor-of-hashes signature, no full diff join). At the fixed
 * point edges form stars rooted at component minima.
 *
 * Both phases are groupBy-min + re-emit: partial aggregation absorbs hub
 * skew; rounds are O(log n) (paper Thm 3). State localCheckpoint-ed per
 * round.
 */
object ConnectedComponents {

  case class Result(components: DataFrame, metrics: Seq[SuperstepMetric], rounds: Int)

  def run(vertices: DataFrame, edges: Dataset[Edge], maxRounds: Int = 50): Result = {
    val spark = edges.sparkSession
    import spark.implicits._

    val verts = vertices.select(col(vertices.columns.head).as("id"))

    def symmetric(e: DataFrame): DataFrame =
      e.union(e.select($"v".as("u"), $"u".as("v"))).filter($"u" =!= $"v").distinct()

    def minOfNbhd(sym: DataFrame): DataFrame =
      sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val sym = symmetric(e)
      val mins = minOfNbhd(sym)
      sym.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val sym = symmetric(e)
      val mins = minOfNbhd(sym)
      sym.join(mins, "u")
        .filter($"v" <= $"u")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .distinct()
    }

    def signature(e: DataFrame): (Long, Long) = {
      e.agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)))
        .as[(Long, Long)].head()
    }

    var cur = edges.toDF().select($"src".as("u"), $"dst".as("v"))
      .filter($"u" =!= $"v").distinct().localCheckpoint(true)
    var sig = signature(cur)
    var rounds = 0
    var converged = false
    val metrics = scala.collection.mutable.ArrayBuffer[SuperstepMetric]()
    while (!converged && rounds < maxRounds) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      cur = next
      sig = nextSig
      rounds += 1
      metrics += SuperstepMetric("cc", rounds, sig._1, sig._1,
        (System.nanoTime() - t0) / 1000000L, if (converged) 0.0 else 1.0)
    }

    // stars: every non-root points at its component min; roots + isolated
    // vertices map to themselves
    val comp = verts
      .join(cur.select($"u".as("id"), $"v".as("comp")), Seq("id"), "left")
      .groupBy($"id")
      .agg(coalesce(min($"comp"), first($"id")).as("component"))
    Result(comp, metrics.toSeq, rounds)
  }

  /** Driver union-find oracle (FIXTURES.md §4). */
  def oracle(n: Int, edges: Seq[(Int, Int)]): Array[Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    Array.tabulate(n)(find)
  }
}
