package graft.algo

import graft.SparkTestBase
import graft.graph.Edge

/** Algorithm-vs-driver-oracle differential tests (FIXTURES.md §4):
  * PageRank allclose 1e-6, CC/LPA/triangles exact. */
class AlgoSpec extends SparkTestBase {

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

  test("PageRank matches dense power-iteration oracle to 1e-6 (incl. dangling)") {
    val n = 120
    // includes dangling vertices (no out-edges) and a hub
    val edges = (randomDigraph(n, 500, seed = 5) ++
      (1 until n / 2).map(i => (i, 0))).distinct
    val want = PageRank.oracle(n, edges, tol = 1e-14, maxIter = 300)
    val res = PageRank.run(vertsOf(n), toDs(edges), tol = 1e-12, maxIter = 300)
    val got = res.ranks.collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(got.size == n)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks must sum to 1")
    for (v <- 0 until n)
      assert(math.abs(got(v) - want(v)) < 1e-6, s"rank($v): ${got(v)} vs ${want(v)}")
    assert(res.metrics.nonEmpty && res.metrics.forall(_.edgesProcessed == edges.size))
  }

  test("PageRank fixed-iteration mode (tol=0) runs exactly maxIter supersteps") {
    val edges = randomDigraph(40, 150, seed = 9)
    val res = PageRank.run(vertsOf(40), toDs(edges), tol = 0.0, maxIter = 5)
    assert(res.iterations == 5)
  }

  test("connected components (large-star/small-star) match union-find exactly") {
    for ((n, m, seed) <- Seq((100, 120, 1L), (100, 40, 2L), (60, 300, 3L))) {
      val edges = randomDigraph(n, m, seed)
      val want = ConnectedComponents.oracle(n, edges)
      val res = ConnectedComponents.run(vertsOf(n), toDs(edges))
      val got = res.components.collect()
        .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      assert(got.size == n)
      for (v <- 0 until n)
        assert(got(v) == want(v).toLong, s"comp($v) n=$n m=$m")
    }
  }

  test("CC handles isolated vertices and long paths") {
    // path 0-1-2-...-19 plus isolated 20..24: one component + singletons
    val edges = (0 until 19).map(i => (i, i + 1))
    val res = ConnectedComponents.run(vertsOf(25), toDs(edges))
    val got = res.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 20).foreach(v => assert(got(v.toLong) == 0L))
    (20 until 25).foreach(v => assert(got(v.toLong) == v.toLong))
  }

  test("label propagation matches driver oracle exactly (frozen convention)") {
    for ((n, m, seed) <- Seq((60, 150, 11L), (80, 100, 12L))) {
      val edges = randomDigraph(n, m, seed)
      val want = LabelPropagation.oracle(n, edges, maxIter = 10)
      val res = LabelPropagation.run(vertsOf(n), toDs(edges), maxIter = 10)
      val got = res.labels.collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      for (v <- 0 until n) assert(got(v) == want(v), s"label($v) n=$n")
    }
  }

  test("triangle count matches brute force, global and per-vertex") {
    for ((n, m, seed) <- Seq((50, 300, 21L), (40, 120, 22L))) {
      val edges = randomDigraph(n, m, seed)
      val (wantG, wantPer) = TriangleCount.oracle(n, edges)
      val res = TriangleCount.run(vertsOf(n), toDs(edges))
      assert(res.globalCount == wantG, s"global n=$n m=$m")
      val got = res.perVertex.collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      for (v <- 0 until n) assert(got(v) == wantPer(v), s"tc($v)")
    }
  }

  test("triangle count: directed duplicates and reciprocal edges collapse") {
    // 0-1-2 triangle expressed with both orientations + duplicates
    val edges = Seq((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (0, 1))
    val res = TriangleCount.run(vertsOf(3), toDs(edges))
    assert(res.globalCount == 1L)
  }
}
