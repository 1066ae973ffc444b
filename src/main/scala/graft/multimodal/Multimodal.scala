package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video carried as opaque `BINARY`
 * payloads with typed metadata, processed in partition-local batches.
 *
 * PNG payloads get a REAL decode via javax.imageio and WAV payloads a REAL
 * decode via javax.sound.sampled (both pure JVM — see
 * [[pngAssetsFromDocuments]] / [[wavAssetsFromDocuments]] for the
 * encode→decode round trips the oracle certifies). Video decode is STUBBED
 * (this container has no video codecs): `decodeStub` derives deterministic
 * fake features from the bytes. Everything around both — the schema, the batch shape
 * (mapPartitions with an iterator, so one task streams many payloads
 * without collect), the partitioning story — is the real production
 * layout; swapping `decodeStub` for a JNI/FFI decoder changes no plumbing.
 */
object Multimodal {

  /** Canonical multimodal schema: one row per asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  /** Demo asset table derived deterministically from the documents table
    * (text bytes as payload) — gives the pipeline real binary data to move. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      (when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video")).as("modality"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      (pmod(col("doc_id"), lit(1024)) + 32).cast("int").as("meta_width"),
      (pmod(col("doc_id"), lit(768)) + 32).cast("int").as("meta_height"),
      (col("n_chars") * 10).cast("long").as("meta_duration_ms"))

  /**
   * PNG asset table: each image row carries a REAL PNG payload encoded with
   * javax.imageio (pure JVM, no native codecs) from a deterministic
   * gray-value formula on doc_id — pixel (x,y) of asset a has value
   * (a·31 + x·7 + y·13) mod 256, width (a mod 7)+1, height (a mod 5)+1.
   * The formula is SQL-expressible, so decoded dimensions and exact pixel
   * sums are hash-checkable by the DuckDB oracle even though the bytes
   * round-trip through a real encoder the oracle cannot run.
   */
  def pngAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val png = udf { (id: Long) =>
      val w = (id % 7).toInt + 1
      val h = (id % 5).toInt + 1
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(
        col("doc_id").as("asset_id"),
        lit("image").as("modality"),
        png(col("doc_id")).as("payload"),
        lit("image/png").as("mime"),
        (pmod(col("doc_id"), lit(7)) + 1).cast("int").as("meta_width"),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int").as("meta_height"),
        lit(null).cast("long").as("meta_duration_ms"))
  }

  /**
   * WAV asset table: each audio row carries a REAL RIFF/WAVE payload
   * (16-bit PCM mono, 8 kHz) whose samples follow a deterministic formula
   * on doc_id — sample i of asset a is ((a·37 + i·17) mod 2003) − 1001,
   * n_samples = (a mod 50) + 10. The container bytes are hand-rolled (44-byte
   * canonical header, little-endian data), the DECODE goes through the real
   * javax.sound.sampled stack, and the formula is SQL-expressible, so the
   * decoded sample count / rate / channels / exact sample sum are
   * hash-checkable by the DuckDB oracle (the mm03 PNG pattern for audio).
   */
  def wavAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val wav = udf { (id: Long) =>
      val n = (id % 50).toInt + 10
      val sampleRate = 8000
      val dataLen = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        buf.putShort((((id * 37 + i * 17) % 2003) - 1001).toShort)
        i += 1
      }
      buf.array()
    }
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(
        col("doc_id").as("asset_id"),
        lit("audio").as("modality"),
        wav(col("doc_id")).as("payload"),
        lit("audio/wav").as("mime"),
        lit(null).cast("int").as("meta_width"),
        lit(null).cast("int").as("meta_height"),
        (((pmod(col("doc_id"), lit(50)) + 10) * 1000) / 8000).cast("long")
          .as("meta_duration_ms"))
  }

  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double, frames_sampled: Int,
      feature: Array[Double], decoded_width: Option[Int] = None,
      decoded_height: Option[Int] = None, px_sum: Option[Long] = None,
      n_px: Option[Long] = None, decoded_samples: Option[Long] = None,
      sample_rate: Option[Int] = None, channels: Option[Int] = None,
      sample_sum: Option[Long] = None)

  /**
   * DETERMINISTIC FAKE of the decode step (clearly marked stub): byte
   * statistics + an 8-bucket byte histogram standing in for real decoded
   * features. Runs partition-local over an iterator — the batch shape a real
   * decoder needs (amortized init per partition, streaming consumption).
   */
  private def decodeStub(payload: Array[Byte]): (Double, Double, Array[Double]) = {
    if (payload == null || payload.isEmpty) return (0.0, 0.0, new Array[Double](8))
    val hist = new Array[Long](256)
    var sum = 0L
    payload.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
    val n = payload.length.toDouble
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2) }
    }
    val feature = Array.tabulate(8)(i => (0 until 32).map(j => hist(i * 32 + j)).sum / n)
    (sum / n, entropy, feature)
  }

  /** REAL decode for PNG payloads via javax.imageio (pure JVM): decoded
    * dimensions plus the exact integer sum of gray pixel values (red
    * channel; the generator writes r=g=b). Returns None on decode failure
    * rather than throwing — a corrupt asset must not kill a 100 TB scan. */
  private def decodePng(payload: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
          y += 1
        }
        Some((w, h, sum, w.toLong * h))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL decode for WAV payloads via javax.sound.sampled (pure JVM —
    * the JDK's RIFF/WAVE reader in java.desktop): decoded frame count,
    * sample rate, channel count, and the exact integer sum of 16-bit PCM
    * samples. Returns None on decode failure rather than throwing — a
    * corrupt asset must not kill a 100 TB scan. */
  private def decodeWav(payload: Array[Byte]): Option[(Long, Int, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                      else java.nio.ByteOrder.LITTLE_ENDIAN
          val sb = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          var sum = 0L
          var i = 0
          while (i < sb.limit()) { sum += sb.get(i); i += 1 }
          val frames = sb.limit().toLong / fmt.getChannels
          Some((frames, fmt.getSampleRate.toInt, fmt.getChannels, sum))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Extract features from every asset, one partition-local pass. PNG
    * payloads (mime image/png) get a REAL javax.imageio decode —
    * decoded_width/height/px_sum/n_px populated; other modalities keep the
    * clearly-marked byte-statistics stub (this container has no other
    * codecs — the batch shape and schema are the production layout). */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val cols = assets.select(col("asset_id"), col("modality"), col("payload"),
      coalesce(col("meta_duration_ms"), lit(0L)).as("meta_duration_ms"),
      coalesce(col("mime"), lit("")).as("mime"))
    cols.as[(Long, String, Array[Byte], Long, String)]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (model load etc.)
        it.map { case (id, modality, payload, durationMs, mime) =>
          val (mean, entropy, feature) = decodeStub(payload)
          val frames = modality match {
            case "video" => math.max(1, (durationMs / 1000L).toInt) // 1 fps sample
            case "audio" => math.max(1, (durationMs / 5000L).toInt)
            case _ => 1
          }
          val decoded =
            if (mime == "image/png" && payload != null) decodePng(payload) else None
          val audio =
            if (mime == "audio/wav" && payload != null) decodeWav(payload) else None
          AssetFeatures(id, modality,
            if (payload == null) 0L else payload.length.toLong,
            mean, entropy, frames, feature,
            decoded.map(_._1), decoded.map(_._2), decoded.map(_._3),
            decoded.map(_._4),
            audio.map(_._1), audio.map(_._2), audio.map(_._3), audio.map(_._4))
        }
      }.toDF()
  }
}
