package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata. */
final case class MediaItem(
    id: Long,
    kind: String, // "image" | "audio" | "video"
    media: Array[Byte],
    width: Int,
    height: Int,
    durationMs: Long)

/** Extracted feature row (decode output). */
final case class MediaFeatures(
    id: Long,
    kind: String,
    nBytes: Long,
    sha: String,
    /** decode stub output — deterministic fake features (no media libs in
      * this container); the Spark-side plumbing (schema, partitioning,
      * batch shape) is real. */
    features: Array[Float])

/** Multimodal-column plumbing for training pipelines: treat image/audio/
  * video as opaque `binary` columns with typed metadata; run decode /
  * feature-extraction as batched `mapPartitions` (the JVM analogue of
  * `mapInPandas` — one reusable "decoder" per partition, rows streamed
  * through it). The decode itself is STUBBED with a deterministic fake
  * (marked below); swap `decodeStub` for a real codec binding on a real
  * cluster.
  */
object Multimodal {

  /** === STUB ===: deterministic fake "decode" — hashes bytes into an
    * 8-dim feature vector. Real deployments replace this body with an
    * image/audio decode (the signature and batching stay). */
  def decodeStub(kind: String, media: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(media)
    Array.tabulate(8)(i => ((md(i) & 0xff) / 255.0f))
  }

  /** Batched decode/feature-extract: one expensive "decoder" initialized
    * per PARTITION (not per row), rows streamed through — the shape that
    * matters at 100 TB (decoder init cost amortized, no driver round-trip,
    * spill-safe iterator). */
  def extractFeatures(spark: SparkSession, items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init (real codecs/threads/models would live here)
      val sha = java.security.MessageDigest.getInstance("SHA-1")
      it.map { m =>
        sha.reset()
        val digest = sha.digest(m.media).take(8).map("%02x".format(_)).mkString
        MediaFeatures(m.id, m.kind, m.media.length.toLong, digest,
          decodeStub(m.kind, m.media))
      }
    }
  }

  /** Frame sampling stub for video: pick every `stride`-th "frame" region
    * of the byte stream (real impl: container demux). Returns
    * (id, frame_no, frame_bytes). */
  def sampleFrames(spark: SparkSession, items: Dataset[MediaItem],
      stride: Int = 10, frameSize: Int = 256): DataFrame = {
    import spark.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      Iterator.range(0, math.max(1, m.media.length / (frameSize * stride))).map { f =>
        val start = f * frameSize * stride
        val end = math.min(start + frameSize, m.media.length)
        (m.id, f, java.util.Arrays.copyOfRange(m.media, start, end))
      }
    }.toDF("id", "frame_no", "frame_bytes")
  }

  /** Lift a (docid, text) corpus into fake media items (test harness). */
  def syntheticItems(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaItem(id, kind, bytes, width = 640, height = 480,
          durationMs = bytes.length.toLong)
    }
  }
}
