package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.ExtractFunctions._
import graft.tables.IcebergLite

/**
 * Continuous link-graph ingestion: `readStream` over a growing `pages_raw`
 * directory, the SAME extraction transform the batch [[graft.graph.GraphBuilder]]
 * applies (P2–P5 — so streamed and batch-converted corpora are
 * byte-identical), committed per micro-batch to an Iceberg-lite table.
 *
 * The reference is strictly batch (convert once); a Common-Crawl-scale
 * pipeline replays crawl segments as they land, which is this shape.
 *
 * Exactly-once table contents over at-least-once micro-batches, twice over:
 *  - the file source's checkpoint tracks processed input files;
 *  - the sink is IDEMPOTENT — each commit records its `batchId`, and a
 *    replayed batch (crash between sink commit and checkpoint write) is
 *    skipped, the standard foreachBatch idempotent-sink protocol.
 * Each commit is an Iceberg-lite FAST APPEND: O(batch) files written,
 * parent data untouched.
 */
object IngestStream {

  /** The streaming-side extraction: identical columns to GraphBuilder's
    * first pass (url normalization, redirect classification, per-page
    * deduped links). */
  def extracted(pagesRaw: DataFrame): DataFrame =
    pagesRaw.select(
      normalize_url(col("url")).as("url"),
      col("warc_ts"),
      extract_redirect(col("html"), col("url")).as("redirect_to"),
      extract_links(col("html"), col("url")).as("links"))

  /** Start the ingest stream over `inputDir`, appending each micro-batch to
    * `<warehouse>/<table>`. `Trigger.AvailableNow` drains what exists and
    * stops (tests, backfills); pass a processing-time trigger for a live
    * tail. Returns None when `inputDir` has no parquet files yet (schema
    * inference needs at least one footer) — the "nothing to ingest" outcome
    * the CLI reports instead of an AnalysisException.
    *
    * `compactOver > 0` enables AUTO-COMPACTION: fast appends write O(batch)
    * small files per micro-batch, so a long-running table accumulates them
    * (the classic small-file problem); when the post-append manifest lists
    * more than `compactOver` data files, the sink folds them down to
    * `max(1, compactOver/4)` in the same batch callback. Compaction INHERITS
    * snapshot properties, so the `batchId` idempotence guard survives it —
    * a batch replayed after a mid-stream compaction is still skipped.
    *
    * `expireKeep > 0` additionally expires all but that many snapshots
    * after each compaction (storage for an ever-ingesting table is
    * otherwise unbounded — compaction rewrites but retains old files);
    * keep it large enough to cover any reader still time-traveling. */
  def run(spark: SparkSession, inputDir: String, warehouse: String,
      table: String = "links_raw",
      trigger: Trigger = Trigger.AvailableNow(),
      compactOver: Int = 0,
      expireKeep: Int = 0): Option[StreamingQuery] = {
    val schema =
      try spark.read.parquet(inputDir).schema
      catch {
        // ONLY the two "no files yet" conditions — a schema-merge conflict
        // or unreadable path is a real error and must propagate, not be
        // silently reported as a clean empty ingest
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
                c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          return None
      }
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val cat = new IcebergLite(warehouse)
    Some(extracted(stream).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$warehouse/_checkpoints/$table")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamGuards.checkBatchId(cat, table, batchId)
        val alreadyCommitted = cat.currentSnapshot(table)
          .exists(_.properties.get("batchId").exists(_.toLong >= batchId))
        if (!alreadyCommitted) {
          val snap = cat.append(batch, table, Map("batchId" -> batchId.toString))
          if (compactOver > 0 && snap.files.size > compactOver) {
            cat.compact(spark, table, targetFiles = math.max(1, compactOver / 4))
            if (expireKeep > 0) cat.expireSnapshots(table, keepLast = expireKeep)
          }
        }
        ()
      }
      .start())
  }
}
