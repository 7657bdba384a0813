package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Edge
import graft.functions.RegisterMax.register_max

/**
 * Neighborhood function N(t) — how many (source, node) pairs are within
 * distance t — the statistic behind a web graph's effective diameter,
 * average distance, and reachability profile (Palmer et al. ANF, KDD'02;
 * Boldi/Rosa/Vigna HyperBall, arXiv:1308.2144).
 *
 * Two implementations with the same contract, the exact-vs-scale pairing
 * this codebase uses for near-dup too:
 *
 *  - [[exact]]: multi-source BFS over the pair frontier. Exact, and the
 *    oracle anchor — but its state is O(Σ|ball(v)|), which on a connected
 *    graph tends to n² pairs. The verification twin, not the 100 TB path.
 *  - [[hyperBall]]: every vertex carries an m-register HyperLogLog sketch
 *    of its ball; a superstep unions each vertex's sketch with its
 *    out-neighbors' ([[graft.functions.RegisterMax]] — map-side combine
 *    absorbs hub skew), so state is O(n·m) bytes FLAT in t and the
 *    per-superstep shuffle carries one m-byte row per (task, vertex).
 *    This is the one that runs on the full web graph.
 *
 * Both iterate over out-edges (t-reachability); run on
 * [[graft.graph.LinkGraph]]-reversed edges for in-reachability.
 */
object Neighborhood {

  case class Result(counts: DataFrame, metrics: Seq[SuperstepMetric],
      iterations: Int)

  /**
   * Exact N(t) for t = 0..maxT via frontier-delta multi-source BFS: only
   * NEWLY reached (s, n) pairs expand in the next superstep (the same
   * delta discipline as [[Bfs.distances]]); a saturated walk stops early
   * and the tail rows repeat the fixpoint count, so the output always has
   * maxT+1 rows — (t, pairs), cumulative, t=0 counting the self-pairs.
   */
  def exact(vertices: DataFrame, edges: Dataset[Edge], maxT: Int): Result = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(maxT >= 0, s"maxT must be >= 0, got $maxT")
    val verts = vertices.select(col(vertices.columns.head).as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    val edgesBySrc = edges.toDF().repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesBySrc.count()

    var visited = verts.select($"id".as("s"), $"id".as("n")).localCheckpoint(true)
    var frontier = visited
    var cum = n
    val counts = scala.collection.mutable.ArrayBuffer((0, cum))
    var t = 1
    var iterations = 0
    val metrics = scala.collection.mutable.ArrayBuffer[SuperstepMetric]()
    while (t <= maxT && !frontier.isEmpty) {
      val t0 = System.nanoTime()
      val expanded = frontier.join(edgesBySrc, frontier("n") === edgesBySrc("src"))
        .select(frontier("s"), edgesBySrc("dst").as("n")).distinct()
      val newPairs = expanded.join(visited, Seq("s", "n"), "left_anti")
        .localCheckpoint(true)
      val c = newPairs.count()
      cum += c
      counts += ((t, cum))
      visited = visited.union(newPairs).localCheckpoint(true)
      frontier = newPairs
      iterations = t
      metrics += SuperstepMetric("anf-exact", t, c, 0L,
        (System.nanoTime() - t0) / 1000000L, c.toDouble)
      t += 1
    }
    while (t <= maxT) { counts += ((t, cum)); t += 1 } // saturated tail
    edgesBySrc.unpersist(); verts.unpersist()
    Result(counts.toSeq.toDF("t", "pairs"), metrics.toSeq, iterations)
  }

  /** One HyperBall superstep (the loop body, exposed as a lazy seam for the
    * plan audit): gather out-neighbors' sketches through the dst-layout
    * edge cache, union with the vertex's own, fold by [[RegisterMax]] —
    * only the n-row counter side shuffles, and the hub fan-in combines
    * map-side into one m-byte buffer per task. */
  private[graft] def unionStep(edgesByDst: DataFrame,
      counters: DataFrame): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    edgesByDst.join(counters.withColumnRenamed("id", "dst"), "dst")
      .select($"src".as("id"), $"regs")
      .union(counters)
      .groupBy($"id").agg(register_max($"regs").as("regs"))
  }

  /** alpha_m bias constant (Flajolet et al. 2007). */
  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /**
   * HyperBall: approximate N(t) for t = 0..maxT with per-vertex HLL
   * sketches. Deterministic end to end — the "randomness" is xxhash64 of
   * the vertex id, so every run (at any parallelism) produces the same
   * estimate; expected relative error is the standard HLL ~1.04/√m per
   * ball, tighter on the sum.
   *
   * Superstep shape: counters pre-shuffle once to the dst layout of the
   * cached edge table, then each iteration is one equi-join (edge side
   * never moves), one union with the current counters, and one
   * register_max aggregation whose partials combine map-side — a hub's
   * million in-sketches collapse to one m-byte buffer per task before the
   * shuffle. Counters are localCheckpoint-ed per superstep (O(1) plan).
   * Early exit when the estimate stops moving (all balls saturated —
   * register vectors are monotone, so a fixed point is permanent).
   *
   * @param log2m log₂ of the register count (4..12; m = 2^log2m bytes of
   *              state per vertex)
   * @return counts (t, pairs DOUBLE — the HLL estimate; t=0 is exact n)
   */
  def hyperBall(
      vertices: DataFrame,
      edges: Dataset[Edge],
      maxT: Int,
      log2m: Int = 6,
      seed: Long = 42L): Result = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(maxT >= 0, s"maxT must be >= 0, got $maxT")
    require(log2m >= 4 && log2m <= 12, s"log2m must be in [4,12], got $log2m")
    val m = 1 << log2m

    val verts = vertices.select(col(vertices.columns.head).as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    val edgesByDst = edges.toDF().repartition($"dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesByDst.count()

    // one-element sketch per vertex: slot = hash mod m, register =
    // trailing-zero count of the remaining hash bits + 1 (the same
    // geometric P(rho ≥ k) = 2^(1-k) as Flajolet's leftmost-1 position;
    // (w & -w) - 1 turns the lowest set bit into a popcountable mask),
    // w = 0 capped at the max observable rank. All scalar codegen'd
    // functions — the init is one narrow pass over the vertex scan.
    val h = xxhash64(lit(seed), $"id")
    val idx = pmod(h, lit(m.toLong)).cast("int")
    val w = shiftrightunsigned(h, log2m)
    val rho = least(bit_count(w.bitwiseAND(-w) - lit(1L)) + lit(1),
      lit(64 - log2m + 1)).cast("byte")
    var counters = verts.select($"id",
        transform(sequence(lit(0), lit(m - 1)),
          i => when(i === idx, rho).otherwise(lit(0).cast("byte"))).as("regs"))
      .localCheckpoint(true)

    // per-vertex HLL estimate (raw + linear-counting small-range
    // correction; no large-range term — 64-bit hashes don't collide at any
    // ball size a graph can reach), summed into N(t). All HOFs over the
    // n-row counter frame.
    def estimate(c: DataFrame): Double = {
      val zeros = size(filter($"regs", r => r === lit(0).cast("byte")))
      val invSum = aggregate(transform($"regs", r => pow(lit(2.0), -r.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      val raw = lit(alpha(m) * m.toDouble * m.toDouble) / invSum
      val est = when(raw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
        .otherwise(raw)
      c.agg(coalesce(sum(est), lit(0.0))).as[Double].head()
    }

    var cum = n.toDouble // t=0 exact: every ball holds exactly its center
    val counts = scala.collection.mutable.ArrayBuffer((0, cum))
    var t = 1
    var iterations = 0
    var saturated = false
    val metrics = scala.collection.mutable.ArrayBuffer[SuperstepMetric]()
    while (t <= maxT && !saturated) {
      val t0 = System.nanoTime()
      counters = unionStep(edgesByDst, counters).localCheckpoint(true)
      val est = estimate(counters)
      saturated = est == cum // monotone registers: a fixpoint is permanent
      cum = est
      counts += ((t, cum))
      iterations = t
      metrics += SuperstepMetric("anf-hyperball", t, n, 0L,
        (System.nanoTime() - t0) / 1000000L, est)
      t += 1
    }
    while (t <= maxT) { counts += ((t, cum)); t += 1 }
    edgesByDst.unpersist(); verts.unpersist()
    Result(counts.toSeq.toDF("t", "pairs"), metrics.toSeq, iterations)
  }

  /** Effective diameter at quantile q from a counts frame ((t, pairs),
    * either implementation): the smallest t whose cumulative pair count
    * reaches q of the final one, linearly interpolated between supersteps
    * (the ANF-paper convention, so fractional values are expected). */
  def effectiveDiameter(counts: DataFrame, q: Double = 0.9): Double = {
    require(q > 0.0 && q <= 1.0, s"quantile must be in (0,1], got $q")
    val rows = counts.orderBy("t").collect()
      .map(r => (r.getInt(0), r.get(1) match {
        case l: java.lang.Long => l.doubleValue
        case d: java.lang.Double => d.doubleValue
      }))
    require(rows.nonEmpty, "empty counts frame")
    val target = q * rows.last._2
    rows.indexWhere(_._2 >= target) match {
      case 0 => 0.0
      case i =>
        val (t0, c0) = rows(i - 1)
        val (_, c1) = rows(i)
        if (c1 == c0) t0.toDouble else t0 + (target - c0) / (c1 - c0)
    }
  }
}
