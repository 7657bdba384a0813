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
 * Dimension/format metadata is PARSED FROM THE BYTES — a real PNG IHDR /
 * JPEG SOF0 header reader ([[parseDimensions]]), no codec required; the
 * synthetic payloads carry genuine PNG/JPEG headers ([[fakePayload]]), so
 * the parse path is the one a production pipeline would run over WARC
 * payloads. Only the PIXEL decode (which needs a codec this container
 * doesn't have) is stubbed: [[decodeStub]] derives deterministic fake
 * features from the payload bytes; swapping in a real codec changes ONLY
 * its body. The batch shape (`mapPartitions`, per-partition init, the
 * Scala analog of a `mapInPandas` batch UDF) is real and tested.
 */
object Multimodal {

  // ---------------------------------------------------------------------------
  // Byte-level header readers (format + dimensions without any codec)
  // ---------------------------------------------------------------------------

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" + width,
    * height as big-endian u32 at offsets 16 and 20). */
  private def pngDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24) return None
    if (!b.take(8).sameElements(PngSignature)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    Some((be32(b, 16), be32(b, 20)))
  }

  /** JPEG: SOI (FFD8), then marker segments; the frame header SOFn
    * (FFC0..FFCF minus C4/C8/CC) carries height then width as u16 after
    * the 2-byte length and 1-byte precision. Walks the segment list —
    * the exact scan `imagesize`-style readers do. */
  private def jpegDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None // desynced: not a marker
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (i + 8 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
      }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** Sniff format by magic bytes and read dimensions from the header. */
  def parseDimensions(b: Array[Byte]): Option[(String, Int, Int)] =
    pngDimensions(b).map { case (w, h) => ("png", w, h) }
      .orElse(jpegDimensions(b).map { case (w, h) => ("jpeg", w, h) })

  // ---------------------------------------------------------------------------
  // Synthetic payloads (real headers, fake body)
  // ---------------------------------------------------------------------------

  /** A minimal but genuine PNG header (signature + IHDR with the given
    * dimensions; CRC left zeroed — dimension readers don't verify it). */
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](33)
    System.arraycopy(PngSignature, 0, out, 0, 8)
    out(11) = 13 // IHDR data length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    def putBe32(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    putBe32(16, w); putBe32(20, h)
    out(24) = 8 // bit depth
    out(25) = 2 // color type: truecolor
    out
  }

  /** A minimal but genuine JPEG prelude: SOI + SOF0 frame header with the
    * given dimensions (1 component; enough for any dimension reader). */
  private def jpegHeader(w: Int, h: Int): Array[Byte] = {
    Array[Int](
      0xFF, 0xD8,                                // SOI
      0xFF, 0xC0, 0x00, 0x0B,                    // SOF0, len 11 (1 component)
      0x08,                                      // precision
      (h >>> 8) & 0xFF, h & 0xFF,
      (w >>> 8) & 0xFF, w & 0xFF,
      0x01, 0x01, 0x11, 0x00                     // 1 component spec
    ).map(_.toByte)
  }

  /** Deterministic fake payload for a document: a REAL image header (PNG
    * for doc_id % 3 == 0, JPEG otherwise; dims a fixed function of doc_id)
    * followed by fake body bytes — stands in for the binary column a real
    * pipeline reads from WARC/object storage. */
  def fakePayload(docId: Long, text: String): Array[Byte] = {
    val w = 64 + (docId % 8).toInt * 16
    val h = 64 + (docId % 5).toInt * 16
    val head = if (docId % 3 == 0) pngHeader(w, h) else jpegHeader(w, h)
    val tag = s":$docId:".getBytes(StandardCharsets.UTF_8)
    val body = (if (text == null) "" else text).getBytes(StandardCharsets.UTF_8)
    head ++ tag ++ body.take(256)
  }

  /** Attach a synthetic media payload to the documents table; metadata is
    * parsed back OUT of the payload bytes (format sniff + header read),
    * exactly as it would be over real crawled payloads. */
  def withMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = fakePayload(id, text)
        val (fmt, w, h) = parseDimensions(payload)
          .getOrElse(("unknown", 0, 0))
        MediaRow(id, payload, MediaMeta(fmt, w, h, payload.length.toLong))
      }
  }

  /** Pixel-decode STUB (this container has no codecs): deterministic fake
    * features from the payload bytes; dimensions/format come from the REAL
    * header parse. A real implementation decodes pixels here. */
  def decodeStub(row: MediaRow, featureDim: Int): MediaFeatures = {
    val (fmt, w, h) = parseDimensions(row.payload).getOrElse(("unknown", 0, 0))
    val h0 = graft.ingest.SynthCorpus.mix64(
      row.payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L))
    val vec = Array.tabulate(featureDim) { d =>
      val hv = graft.ingest.SynthCorpus.mix64(h0 ^ d.toLong)
      ((hv & 0xFFFF).toFloat / 0xFFFF.toFloat) * 2f - 1f
    }
    MediaFeatures(row.doc_id, fmt, w, h,
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

  /**
   * Resize stage: cap the longer image side at `maxDim`, preserving aspect
   * ratio (the standard training-data normalization step). The OUTPUT
   * payload carries a genuine header with the new dimensions — parsed back
   * by [[parseDimensions]], so downstream metadata still comes from bytes —
   * while the pixel resampling itself is the declared stub (body bytes
   * passed through). Rows already within bounds are returned untouched.
   */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val (fmt, w, h) = parseDimensions(row.payload)
          .getOrElse(("unknown", 0, 0))
        if (fmt == "unknown" || math.max(w, h) <= maxDim) row
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val head = if (fmt == "png") pngHeader(nw, nh) else jpegHeader(nw, nh)
          val oldHeadLen = if (fmt == "png") 33 else 14
          // real resampling happens HERE with a codec; body passed through
          val payload = head ++ row.payload.drop(oldHeadLen)
          MediaRow(row.doc_id, payload,
            MediaMeta(fmt, nw, nh, payload.length.toLong))
        }
      }
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
