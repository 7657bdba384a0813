package graft.algo

import graft.SparkTestBase
import graft.graph.Edge

/** Neighborhood function: exact vs a driver BFS oracle; HyperBall vs exact
  * within HLL tolerance (deterministic — the only "randomness" is xxhash64
  * of the vertex id, so these bounds are frozen facts about the fixture,
  * not flaky statistics). */
class NeighborhoodSpec extends SparkTestBase {

  private def randomDigraph(n: Int, m: Int, seed: Long): Seq[(Int, Int)] = {
    val rng = new java.util.Random(seed)
    (0 until m).map(_ => (rng.nextInt(n), rng.nextInt(n)))
      .filter { case (a, b) => a != b }.distinct
  }

  private def toDs(edges: Seq[(Int, Int)]) = {
    import spark.implicits._
    spark.createDataset(edges.map(e => Edge(e._1.toLong, e._2.toLong)))
  }

  private def vertsOf(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).toDF("id")
  }

  /** Driver oracle: BFS from every source, cumulative pairs per t. */
  private def anfOracle(n: Int, edges: Seq[(Int, Int)], maxT: Int): Seq[Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = Array.fill(n, n)(Int.MaxValue)
    for (s <- 0 until n) {
      dist(s)(s) = 0
      var frontier = List(s)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .filter(w => dist(s)(w) == Int.MaxValue)
          .distinct
        frontier.foreach(w => dist(s)(w) = d)
      }
    }
    (0 to maxT).map(t =>
      (for (s <- 0 until n; v <- 0 until n if dist(s)(v) <= t) yield 1).size.toLong)
  }

  test("exact neighborhood function matches the driver BFS oracle per t") {
    for ((n, m, seed, maxT) <- Seq((60, 150, 41L, 6), (50, 60, 42L, 8))) {
      val edges = randomDigraph(n, m, seed)
      val want = anfOracle(n, edges, maxT)
      val res = Neighborhood.exact(vertsOf(n), toDs(edges), maxT)
      val got = res.counts.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got.size == maxT + 1, "one row per t incl. the saturated tail")
      for (t <- 0 to maxT) assert(got(t) == want(t), s"N($t) n=$n m=$m")
    }
  }

  test("exact: maxT=0 is just the self-pairs; empty frontier stops early") {
    val res = Neighborhood.exact(vertsOf(5), toDs(Seq((0, 1))), 0)
    assert(res.counts.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 5L)))
    // one edge saturates after t=1; tail rows repeat the fixpoint
    val res2 = Neighborhood.exact(vertsOf(5), toDs(Seq((0, 1))), 4)
    val got = res2.counts.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 5L, 1 -> 6L, 2 -> 6L, 3 -> 6L, 4 -> 6L))
    assert(res2.iterations <= 2, "frontier empties after the first expansion")
  }

  test("HyperBall tracks exact within HLL tolerance; t=0 exact; monotone") {
    val n = 300
    val edges = randomDigraph(n, 900, seed = 43L)
    val maxT = 6
    val want = anfOracle(n, edges, maxT)
    val res = Neighborhood.hyperBall(vertsOf(n), toDs(edges), maxT, log2m = 6)
    val got = res.counts.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(0) == n.toDouble, "t=0 is exact by construction")
    for (t <- 1 to maxT) {
      val rel = math.abs(got(t) - want(t)) / want(t)
      assert(rel < 0.12, s"N($t): est ${got(t)} vs exact ${want(t)} (rel $rel)")
    }
    for (t <- 1 to maxT)
      assert(got(t) >= got(t - 1) - 1e-6, "register monotonicity ⇒ estimates rise")
  }

  test("HyperBall is deterministic across input partitionings") {
    import spark.implicits._
    val edges = randomDigraph(120, 400, seed = 44L)
    val a = Neighborhood.hyperBall(vertsOf(120), toDs(edges), 4)
      .counts.as[(Int, Double)].collect().sorted
    val b = Neighborhood.hyperBall(vertsOf(120).repartition(7),
        toDs(edges).repartition(3), 4)
      .counts.as[(Int, Double)].collect().sorted
    for (((t1, c1), (t2, c2)) <- a.zip(b)) {
      assert(t1 == t2)
      // integer register state is identical; only the float SUM order can
      // differ across partitionings
      assert(math.abs(c1 - c2) <= 1e-6 * math.max(c1, 1.0), s"t=$t1: $c1 vs $c2")
    }
  }

  test("register_max union runs as ObjectHashAggregate with map-side partials") {
    import spark.implicits._
    import graft.functions.RegisterMax.register_max
    // the HyperBall superstep's aggregation shape: hub fan-in must combine
    // map-side (one m-byte buffer per task), never collect-then-fold
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType, and
    // register_max speaks array<tinyint> (what the HOF init produces)
    val regs = Seq(
      (1L, Seq[Byte](1, 0, 3)), (1L, Seq[Byte](0, 2, 1)),
      (2L, Seq[Byte](5, 0, 0))).toDF("id", "regs")
    val agg = regs.groupBy($"id").agg(register_max($"regs").as("regs"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("register_max"),
      s"expected the TypedImperativeAggregate in the plan:\n$plan")
    assert(plan.contains("partial_register_max"),
      s"map-side partial aggregation must be present:\n$plan")
    val got = agg.collect().map(r => r.getLong(0) ->
      r.getSeq[Byte](1).toSeq).toMap
    assert(got == Map(1L -> Seq[Byte](1, 2, 3), 2L -> Seq[Byte](5, 0, 0)))
    // mixed register counts are a build-parameter violation, loud failure
    val bad = Seq((1L, Seq[Byte](1, 2)), (1L, Seq[Byte](1, 2, 3)))
      .toDF("id", "regs")
    val e = intercept[org.apache.spark.SparkException] {
      bad.groupBy($"id").agg(register_max($"regs")).collect()
    }
    assert(e.getMessage.contains("mixed register counts") ||
      e.getCause != null, s"unexpected failure shape: ${e.getMessage}")
  }

  test("effective diameter: interpolated quantile on a known path graph") {
    // directed path 0→1→…→9: N(t) = Σ_v min(t+1, n-v) computed directly
    val n = 10
    val edges = (0 until n - 1).map(i => (i, i + 1))
    val res = Neighborhood.exact(vertsOf(n), toDs(edges), n)
    val want = (0 to n).map(t => (0 until n).map(v => math.min(t + 1, n - v)).sum)
    val got = res.counts.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (t <- 0 to n) assert(got(t) == want(t).toLong)
    val d90 = Neighborhood.effectiveDiameter(res.counts, 0.9)
    // q=1.0 must land exactly on the saturation superstep
    assert(Neighborhood.effectiveDiameter(res.counts, 1.0) == (n - 1).toDouble)
    assert(d90 > 0.0 && d90 < (n - 1).toDouble)
    intercept[IllegalArgumentException] {
      Neighborhood.effectiveDiameter(res.counts, 0.0)
    }
  }
}
