package graft.query

import scala.collection.mutable

/**
 * Driver-side bidirectional BFS over collected adjacency arrays — the
 * interactive path for graphs under the collect threshold; the direct analog
 * of the reference's in-memory `LeanPageMapper` + `RouteFinder`
 * (`WikiRoutes.kt:106-124`, `RouteFinder.kt:15-45`).
 *
 * Semantics are IDENTICAL to [[graft.algo.Bfs.shortestPath]] — same
 * level-synchronous expansion, same smaller-frontier-first balancing, same
 * TOO_BIG policy, same min-parent and min-(len, meetingId) tie-breaks — so
 * the two paths return the same route for the same graph (asserted in
 * RoutesSpec). Any semantic change must be made in BOTH.
 */
final class InMemoryBfs(
    fwd: java.util.HashMap[Long, Array[Long]],
    bwd: java.util.HashMap[Long, Array[Long]]) {

  def shortestPath(start: Long, end: Long, tooBig: Long): Option[Seq[Long]] = {
    if (start == end) return Some(Seq(start))

    // visited: id -> (parent, dist); parent chosen as min id per level
    val visF = new java.util.HashMap[Long, (Long, Int)]()
    val visB = new java.util.HashMap[Long, (Long, Int)]()
    visF.put(start, (-1L, 0)); visB.put(end, (-1L, 0))
    var frontF: Array[Long] = Array(start)
    var frontB: Array[Long] = Array(end)
    var radF = 0; var radB = 0
    var best: Option[(Long, Int, Int)] = None // (meetId, df, db)

    def expand(front: Array[Long], vis: java.util.HashMap[Long, (Long, Int)],
        adj: java.util.HashMap[Long, Array[Long]], depth: Int): Array[Long] = {
      // min-parent tie-break: accumulate candidate parents, keep the min
      val nextParent = new java.util.HashMap[Long, Long]()
      for (u <- front) {
        val ns = adj.get(u)
        if (ns != null) {
          var i = 0
          while (i < ns.length) {
            val v = ns(i)
            // containsKey, not get==null: get on a Long-valued Java map
            // unboxes an absent null to 0L in Scala
            if (!vis.containsKey(v) &&
                (!nextParent.containsKey(v) || u < nextParent.get(v)))
              nextParent.put(v, u)
            i += 1
          }
        }
      }
      val out = new Array[Long](nextParent.size())
      var k = 0
      val it = nextParent.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        vis.put(e.getKey, (e.getValue, depth))
        out(k) = e.getKey; k += 1
      }
      out
    }

    def updateBest(newly: Array[Long], newlyForward: Boolean): Unit = {
      for (v <- newly) {
        val other = if (newlyForward) visB.get(v) else visF.get(v)
        if (other != null) {
          val df = if (newlyForward) visF.get(v)._2 else other._2
          val db = if (newlyForward) other._2 else visB.get(v)._2
          val len = df + db
          if (best.forall { case (bid, bdf, bdb) =>
                len < bdf + bdb || (len == bdf + bdb && v < bid) })
            best = Some((v, df, db))
        }
      }
    }

    var exhausted = false
    while (!exhausted && best.forall { case (_, df, db) => df + db > radF + radB }) {
      val canF = frontF.nonEmpty && (visF.size < tooBig || visB.size >= tooBig)
      val canB = frontB.nonEmpty && (visB.size < tooBig || visF.size >= tooBig)
      if (!canF && !canB) exhausted = true
      else {
        val goForward = canF && (!canB || frontF.length <= frontB.length)
        if (goForward) {
          radF += 1
          frontF = expand(frontF, visF, fwd, radF)
          updateBest(frontF, newlyForward = true)
          if (frontF.isEmpty && best.isEmpty) exhausted = true
        } else {
          radB += 1
          frontB = expand(frontB, visB, bwd, radB)
          updateBest(frontB, newlyForward = false)
          if (frontB.isEmpty && best.isEmpty) exhausted = true
        }
      }
    }

    best.map { case (meet, _, _) =>
      def walk(vis: java.util.HashMap[Long, (Long, Int)]): List[Long] = {
        var out = List(meet)
        var cur = vis.get(meet)
        while (cur._1 != -1L) { out = cur._1 :: out; cur = vis.get(cur._1) }
        out // root .. meet
      }
      walk(visF) ++ walk(visB).reverse.tail
    }
  }
}

object InMemoryBfs {
  def fromEdges(edges: Array[(Long, Long)]): InMemoryBfs = {
    def pack(pairs: Array[(Long, Long)]): java.util.HashMap[Long, Array[Long]] = {
      val m = new java.util.HashMap[Long, mutable.ArrayBuilder.ofLong]()
      for ((s, d) <- pairs) {
        var b = m.get(s)
        if (b == null) { b = new mutable.ArrayBuilder.ofLong; m.put(s, b) }
        b += d
      }
      val out = new java.util.HashMap[Long, Array[Long]](m.size())
      m.forEach((k, b) => out.put(k, b.result().sorted))
      out
    }
    new InMemoryBfs(pack(edges), pack(edges.map(e => (e._2, e._1))))
  }
}
