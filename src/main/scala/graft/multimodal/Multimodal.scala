package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata (SURVEY.md §2.3 #27).
  * At 100 TB the bytes column stays opaque through shuffles — only metadata
  * and derived features move between stages.
  */
final case class MediaRecord(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    uri: String,
    bytes: Array[Byte],
    width: Int,              // decode metadata (0 = unknown)
    height: Int,
    duration_ms: Long
)

final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

final case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long, frame_bytes: Array[Byte])

/** Multimodal column plumbing: binary ingest, per-partition batched
  * decode/feature-extract/frame-sample. The *decode* step is STUBBED with a
  * deterministic hash-derived fake (no image/audio codecs exist in this
  * container — clearly marked below); everything Spark-side — schema,
  * encoders, partitioning, batch shape — is real and tested, and a real
  * codec drops into the same `mapPartitions` slot.
  */
object Multimodal {

  /** Ingest a directory of media files as MediaRecords; one binaryFile row
    * per object, metadata parsed from the (stub) header probe.
    */
  def readMediaDir(spark: SparkSession, path: String, kind: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (uri, bytes) =>
        val (w, h, d) = probeHeader(bytes)
        MediaRecord(stableId(uri), kind, uri, bytes, w, h, d)
      }
  }

  /** Feature extraction, batched per partition (the shape a real model
    * runtime needs: amortize decoder/model init across the partition, stream
    * records through).
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    ds.mapPartitions { records =>
      // real impl: init decoder/model ONCE here, then map the batch
      records.map(r => MediaFeatures(r.media_id, r.kind, stubDecodeFeatures(r.bytes, dim)))
    }
  }

  /** Resize images to fit a bounding box, batched per partition like
    * [[extractFeatures]] (decoder init amortized across the partition).
    * Aspect ratio preserved; records already inside the box pass through
    * untouched. The pixel work is the stub boundary; the metadata math,
    * batching and schema are the real contract.
    */
  def resizeToFit(ds: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRecord]
    ds.mapPartitions { records =>
      // real impl: init codec ONCE here
      records.map { r =>
        if (r.width <= maxW && r.height <= maxH) r
        else {
          val scale = math.min(maxW.toDouble / r.width, maxH.toDouble / r.height)
          val (w, h) = (math.max(1, (r.width * scale).toInt), math.max(1, (r.height * scale).toInt))
          r.copy(width = w, height = h, bytes = stubResize(r.bytes, w, h))
        }
      }
    }
  }

  /** Sample k pseudo-frames per video at even offsets. Real impl swaps
    * stubFrame for a codec seek+decode; the explode shape (1 record → k
    * frames) and downstream schema are the real contract.
    */
  def sampleFrames(ds: Dataset[MediaRecord], k: Int): Dataset[FrameSample] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[FrameSample]
    ds.flatMap { r =>
      val dur = math.max(r.duration_ms, 1L)
      (0 until k).map { i =>
        val off = dur * i / k
        FrameSample(r.media_id, i, off, stubFrame(r.bytes, off))
      }
    }
  }

  /** Aggregate features back onto a metadata table: media frame joins are
    * broadcast-able (features are small) while bytes stay columnar at rest.
    */
  def withFeatures(meta: DataFrame, feats: Dataset[MediaFeatures]): DataFrame =
    meta.join(feats.toDF(), Seq("media_id"), "left")

  /** Stable 64-bit id from the object URI (content-addressed ids would use
    * the bytes hash instead; URI keeps re-ingest idempotent).
    */
  private[multimodal] def stableId(uri: String): Long = {
    var h = 1125899906842597L
    uri.foreach(c => h = 31 * h + c)
    h & Long.MaxValue
  }

  // ---- deterministic stubs (??? markers for the codec boundary) ----------

  /** Header probe: REAL container parsing first ([[MediaHeaders]] — PNG /
    * JPEG / GIF / BMP dimensions, WAV duration, pure byte arithmetic, no
    * codec); only an UNRECOGNIZED format falls back to the deterministic
    * hash-derived fake (the synthetic test fixtures in this container are
    * not real media files). The stub boundary is thus pixels/samples only —
    * metadata is production code.
    */
  private[multimodal] def probeHeader(bytes: Array[Byte]): (Int, Int, Long) = {
    val real = MediaHeaders.probe(bytes)
    if (real != ((0, 0, 0L))) real
    else { // STUB fallback for non-media synthetic fixtures
      val h = java.util.Arrays.hashCode(bytes)
      (math.abs(h % 1920) + 1, math.abs((h / 7) % 1080) + 1, math.abs(h.toLong % 60000L) + 1000L)
    }
  }

  /** STUB — decode+embed. Real impl: decode bytes, run the feature model.
    * Deterministic fake: xorshift over the content hash.
    */
  private[multimodal] def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    var s = java.util.Arrays.hashCode(bytes).toLong | 1L
    Array.fill(dim) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000L) / 1000.0f
    }
  }

  /** STUB — pixel resize. Real impl decodes, scales, re-encodes; the fake
    * keeps a deterministic function of (bytes, target dims).
    */
  private[multimodal] def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.min(bytes.length, math.max(16, (w * h) % 64))
    val out = java.util.Arrays.copyOf(bytes, n)
    if (out.length > 1) { out(0) = (w % 251).toByte; out(1) = (h % 251).toByte }
    out
  }

  /** STUB — frame decode at offset. */
  private[multimodal] def stubFrame(bytes: Array[Byte], offsetMs: Long): Array[Byte] = {
    val n = math.min(bytes.length, 16)
    val out = java.util.Arrays.copyOf(bytes, n)
    if (out.nonEmpty) out(0) = (offsetMs % 251).toByte
    out
  }
}
