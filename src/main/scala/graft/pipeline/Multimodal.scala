package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(format: String, width: Int, height: Int, sizeBytes: Long)

/** One media row: opaque binary payload + typed metadata (the multimodal
  * column pattern: never parse binaries in SQL, only in the batch stage). */
case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted feature record produced by the decode/feature stage. */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    frames: Int,
    featureVec: Array[Float])

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-sized batches.
 *
 * The decode step is STUBBED (this container has no image/audio codecs):
 * [[decodeStub]] is a deterministic fake standing in for a real decoder.
 * Everything around it — the schema, the typed Dataset plumbing, the
 * batch-iterator shape (`mapPartitions`, the Scala analog of a
 * `mapInPandas` batch UDF), partition sizing — is real and tested; swapping
 * in a real codec changes ONLY the body of `decodeStub`.
 */
object Multimodal {

  /** Deterministic fake payload for a document (synthesizes the binary
    * column the real pipeline would read from WARC/object storage). */
  def fakePayload(docId: Long, text: String): Array[Byte] = {
    val head = s"IMG1:$docId:".getBytes(StandardCharsets.UTF_8)
    val body = (if (text == null) "" else text).getBytes(StandardCharsets.UTF_8)
    head ++ body.take(256)
  }

  /** Attach a synthetic media payload + metadata to the documents table. */
  def withMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = fakePayload(id, text)
        MediaRow(id, payload,
          MediaMeta(
            format = if (id % 3 == 0) "png" else "jpeg",
            width = 64 + (id % 8).toInt * 16,
            height = 64 + (id % 5).toInt * 16,
            sizeBytes = payload.length.toLong))
      }
  }

  /** STUB decoder: deterministic fake features from the payload bytes.
    * A real implementation would decode pixels / resample audio here. */
  def decodeStub(row: MediaRow, featureDim: Int): MediaFeatures = {
    val h0 = graft.ingest.SynthCorpus.mix64(
      row.payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L))
    val vec = Array.tabulate(featureDim) { d =>
      val h = graft.ingest.SynthCorpus.mix64(h0 ^ d.toLong)
      ((h & 0xFFFF).toFloat / 0xFFFF.toFloat) * 2f - 1f
    }
    MediaFeatures(row.doc_id, row.meta.format, row.meta.width, row.meta.height,
      frames = 1 + (row.doc_id % 4).toInt, featureVec = vec)
  }

  /**
   * Decode + feature-extract in partition batches. `mapPartitions` is the
   * deliberate choice (not per-row `map`): a real decoder amortizes model /
   * codec init per batch exactly like a `mapInPandas` batch UDF. Batch size
   * is governed upstream by partitioning (`maxRecordsPerBatch` analog:
   * `repartition` before calling this at scale).
   */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-batch init happens HERE in a real decoder (load codec once)
      it.map(row => decodeStub(row, featureDim))
    }
  }

  /** Frame sampling for video-like payloads: deterministic every-nth-frame
    * selection recorded as (doc_id, frameIdx) rows. */
  def sampleFrames(features: Dataset[MediaFeatures], everyNth: Int = 2): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.toDF()
      .select($"doc_id", explode(sequence(lit(0), $"frames" - 1)).as("frameIdx"))
      .filter($"frameIdx" % everyNth === 0)
  }
}
