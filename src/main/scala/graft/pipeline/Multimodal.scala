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

/** Decoded image facts (real `javax.imageio` decode). */
final case class ImageInfo(width: Int, height: Int,
    meanR: Double, meanG: Double, meanB: Double)

/** Multimodal-column plumbing for training pipelines: treat image/audio/
  * video as opaque `binary` columns with typed metadata; run decode /
  * feature-extraction as batched `mapPartitions` (the JVM analogue of
  * `mapInPandas` — one reusable "decoder" per partition, rows streamed
  * through it). IMAGE decode is REAL (`javax.imageio`, in the JDK);
  * audio/video stay stubbed with a deterministic fake (no codec libs in
  * this container) — swap `decodeStub` for real bindings on a real
  * cluster.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream cache is a TEMP
  // FILE per read/write — under a concurrent decode fan-out every tiny
  // image pays file creation + deletion and the tasks serialize on /tmp.
  // The in-memory cache is strictly better for byte-array sources. Static
  // so it runs once per JVM (driver and executors) on first use.
  javax.imageio.ImageIO.setUseCache(false)

  /** === STUB === (audio/video only): deterministic fake "decode" — hashes
    * bytes into an 8-dim feature vector. Real deployments replace this body
    * with a codec binding (the signature and batching stay). */
  def decodeStub(kind: String, media: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(media)
    Array.tabulate(8)(i => ((md(i) & 0xff) / 255.0f))
  }

  /** Real image decode: PNG/JPEG/GIF/BMP bytes → dimensions + channel
    * means. Returns None when the bytes aren't a decodable image. */
  def decodeImage(media: Array[Byte]): Option[ImageInfo] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(ImageInfo(w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n))
      }
    } catch { case _: Exception => None }

  /** Decoded audio facts (real `javax.sound.sampled` decode). */
  final case class AudioInfo(sampleRate: Int, channels: Int, frames: Long,
      meanAbsAmplitude: Double)

  /** Real audio decode: WAV/AIFF bytes (PCM) → format + mean |amplitude|.
    * None when the bytes aren't a decodable audio stream. */
  def decodeAudio(media: Array[Byte]): Option[AudioInfo] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      val buf = in.readAllBytes()
      var sum = 0L; var n = 0
      var i = 0
      while (i + 1 < buf.length && bytesPerSample == 2) {
        // 16-bit PCM little-endian
        val v = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
        sum += math.abs(v.toInt); n += 1
        i += 2
      }
      Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels, frames,
        if (n == 0) 0.0 else sum.toDouble / n))
    } catch { case _: Exception => None }

  /** Deterministic constant-amplitude 16-bit mono WAV (test/bench corpus):
    * sample rate, frame count and amplitude derive from the id, so decode
    * output is oracle-checkable. */
  def syntheticWav(id: Long): Array[Byte] = {
    val sampleRate = 8000
    val frames = 200 + (id % 5).toInt * 50
    val amp = (id % 1000).toInt // constant amplitude → mean |amp| == amp
    // canonical 44-byte RIFF/WAVE PCM header written directly — the
    // provider-registry round trip through AudioSystem.write dominated the
    // synthesis cost under a 32-way fan-out; the DECODE side stays the
    // real javax.sound.sampled path and reads these bytes identically
    val dataLen = frames * 2 // 16-bit mono
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort) // block align
      .putShort(16.toShort) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      buf.put((amp & 0xff).toByte)
      buf.put(((amp >> 8) & 0xff).toByte)
      i += 1
    }
    buf.array()
  }

  /** Deterministic solid-color PNG (test/bench corpus): dimensions and
    * color derive from the id, so decode output is oracle-checkable. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 8).toInt
    val h = 12 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id % 256).toInt & 0xff) << 16) |
      ((((id * 7) % 256).toInt & 0xff) << 8) | (((id * 13) % 256).toInt & 0xff)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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
        val features = m.kind match {
          case "image" => decodeImage(m.media) match {
            case Some(info) => Array(info.width.toFloat, info.height.toFloat,
              info.meanR.toFloat, info.meanG.toFloat, info.meanB.toFloat)
            case None => decodeStub(m.kind, m.media)
          }
          case "audio" => decodeAudio(m.media) match {
            case Some(info) => Array(info.sampleRate.toFloat,
              info.channels.toFloat, info.frames.toFloat,
              info.meanAbsAmplitude.toFloat)
            case None => decodeStub(m.kind, m.media)
          }
          case other => decodeStub(other, m.media)
        }
        MediaFeatures(m.id, m.kind, m.media.length.toLong, digest, features)
      }
    }
  }

  /** Driver-gate query: decode a deterministic PNG per doc and recover the
    * planted dimensions + color — proves the decode path is real, not a
    * hash of the bytes. */
  def decodeQuery(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    // spread the per-row encode/decode across the cluster BEFORE the
    // expensive work: the id column is a few bytes per row, while the
    // docs table often arrives as one small input split — without this
    // the whole decode runs in a single task
    val items = docs.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id =>
        MediaItem(id, "image", syntheticPng(id), 0, 0, 0L)))
    extractFeatures(spark, items)
      .select($"id".as("doc_id"),
        $"features"(0).cast("long").as("width"),
        $"features"(1).cast("long").as("height"),
        $"features"(2).cast("long").as("mean_r"),
        $"features"(3).cast("long").as("mean_g"),
        $"features"(4).cast("long").as("mean_b"))
      .orderBy("doc_id")
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

  /** Driver-gate query: decode a deterministic WAV per doc and recover the
    * planted format + amplitude — proves the audio decode path is real. */
  def decodeAudioQuery(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    // ids-only repartition before the per-row codec work (see decodeQuery)
    val items = docs.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id =>
        MediaItem(id, "audio", syntheticWav(id), 0, 0, 0L)))
    extractFeatures(spark, items)
      .select($"id".as("doc_id"),
        $"features"(0).cast("long").as("sample_rate"),
        $"features"(1).cast("long").as("channels"),
        $"features"(2).cast("long").as("frames"),
        $"features"(3).cast("long").as("mean_amp"))
      .orderBy("doc_id")
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
