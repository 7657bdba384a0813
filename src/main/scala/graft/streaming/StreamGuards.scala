package graft.streaming

import graft.tables.IcebergLite

/** Shared safety checks for the idempotent foreachBatch sinks. */
object StreamGuards {

  /**
   * Fail LOUDLY on a regressed micro-batch id instead of silently skipping.
   *
   * The idempotence guard ("skip a batch whose id the table already
   * records") exists for exactly one legitimate shape: a crash between the
   * sink's append and the checkpoint write replays the SAME batch id on
   * restart. Structured Streaming commits its offset log per batch, so a
   * replayed id is always equal to the recorded one — an INCOMING id
   * strictly BELOW it cannot come from a replay. It means the stream's
   * checkpoint directory was removed or relocated while the table kept its
   * high-water mark: every new micro-batch would restart from id 0 and the
   * `>= batchId` skip would silently DROP all of it — data loss presented
   * as dedup. Surface that as an error with the recovery options spelled
   * out rather than letting the stream run "successfully" while writing
   * nothing.
   */
  def checkBatchId(cat: IcebergLite, table: String, batchId: Long): Unit = {
    val recorded = cat.currentSnapshot(table)
      .flatMap(_.properties.get("batchId")).map(_.toLong)
    recorded.foreach { r =>
      if (batchId < r) throw new IllegalStateException(
        s"stream/table batch-id regression on '$table': incoming micro-batch " +
          s"$batchId is below the table's recorded batchId $r. A replay can " +
          "only carry the SAME id as the last commit, so this means the " +
          "checkpoint directory was removed or relocated while the table " +
          "kept its high-water mark — continuing would silently drop every " +
          "batch until the counter catches up. Either restore the original " +
          "checkpoint, or start a fresh table for the new checkpoint lineage.")
    }
  }
}
