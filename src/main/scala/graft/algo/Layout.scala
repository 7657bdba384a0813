package graft.algo

/** Shared physical-layout policy for the iterative operators' cached edge
  * layouts. */
object Layout {

  /** Rows per cached-edge-layout partition: ~2M edge rows ≈ 50–100 MB —
    * the guide §2.2 "fewer, larger partitions" sweet spot. */
  val EdgeRowsPerPartition: Long = 2L * 1000 * 1000

  /** Partition count for a cached edge layout, DERIVED from the edge count
    * (guide §2: scale-adaptive partitioning, never a constant tuned for
    * either local mode or a cluster): a fixture-sized graph collapses to a
    * few partitions (a superstep stops paying shuffle-partition-count task
    * overhead), a 10⁹-edge graph gets thousands. Callers know the edge
    * count already — every operator counts its cached input first. */
  def edgePartitions(edgeRows: Long): Int =
    math.max(1, math.ceil(edgeRows.toDouble / EdgeRowsPerPartition).toInt)
}
