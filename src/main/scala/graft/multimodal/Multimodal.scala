package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video carried as opaque `BINARY`
 * payloads with typed metadata, processed in partition-local batches.
 *
 * ==Codec matrix (what decodes for real vs what is declined)==
 *
 * {{{
 *  modality  container/codec          decode            status
 *  --------  -----------------------  ----------------  ------------------
 *  image     PNG                      javax.imageio     REAL (pure JVM)
 *  audio     WAV / PCM                javax.sound       REAL (pure JVM)
 *  video     AVI / 'DIB ' (BI_RGB)    RIFF walker       REAL (pure JVM)
 *  video     AVI / 'MJPG'             RIFF walker +     REAL (pure JVM)
 *                                       javax.imageio
 *  video     AVI / anything else      —                 DECLINED -> null
 *            (H.264, VP9, HEVC, ...)                    row, never error
 *  any       corrupt/truncated bytes  —                 DECLINED -> null
 * }}}
 *
 * PNG/WAV round trips are oracle-certified ([[pngAssetsFromDocuments]] /
 * [[wavAssetsFromDocuments]]); DIB and MJPEG video decode through an honest
 * RIFF chunk walker ([[decodeAvi]]) with every-2nd-frame sampling — MJPEG
 * frames are standalone JPEGs, the one compressed video codec a JVM decodes
 * without native libraries. Codecs that require native libs (H.264 etc.)
 * are DELIBERATELY declined: the decoder returns None, the operator emits
 * null fields, and a 100 TB scan never dies on an asset (spec-asserted).
 * The clearly-marked `decodeStub` (byte statistics standing in for learned
 * features) exists only for payloads with no JVM decoder. Everything around
 * the decoders — the schema, the batch shape (mapPartitions with an
 * iterator, so one task streams many payloads without collect), the
 * partitioning story — is the real production layout; swapping in a
 * JNI/FFI codec changes no plumbing.
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

  /**
   * AVI asset table: each video row carries a REAL RIFF/AVI container
   * (hand-rolled canonical layout: LIST hdrl [avih + LIST strl [strh,
   * strf]] + LIST movi [00db…]) whose frames are uncompressed BI_RGB
   * 24-bit DIBs — bottom-up rows, 4-byte-aligned stride, the standard
   * Windows 'DIB ' video codec. Pixel (x,y) of frame f in asset a has
   * gray value (a·29 + f·11 + x·7 + y·13) mod 256 (written b=g=r),
   * n_frames = (a mod 6)+2, width (a mod 5)+2, height (a mod 4)+2, 10 fps.
   * The formula is SQL-expressible, so decoded frame count / dims / the
   * exact pixel sum over SAMPLED frames (every 2nd, f = 0,2,…) are
   * hash-checkable by the DuckDB oracle even though the bytes round-trip
   * through a real container writer/parser the oracle cannot run.
   */
  def aviAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val avi = udf { (id: Long) =>
      val nFrames = (id % 6).toInt + 2
      val w = (id % 5).toInt + 2
      val h = (id % 4).toInt + 2
      val stride = ((w * 3) + 3) / 4 * 4
      val frameSize = stride * h // multiple of 4 -> even, no RIFF pad byte
      val moviBody = 4 + nFrames * (8 + frameSize)
      val riffSize = 4 + 200 + (8 + moviBody)
      val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
      fcc("RIFF"); buf.putInt(riffSize); fcc("AVI ")
      // LIST hdrl: avih(56) + LIST strl [strh(56) + strf(40)] = 200 bytes
      fcc("LIST"); buf.putInt(192); fcc("hdrl")
      fcc("avih"); buf.putInt(56)
      buf.putInt(100000)            // dwMicroSecPerFrame (10 fps)
        .putInt(frameSize * 10)     // dwMaxBytesPerSec
        .putInt(0)                  // dwPaddingGranularity
        .putInt(0)                  // dwFlags (no index)
        .putInt(nFrames)            // dwTotalFrames
        .putInt(0)                  // dwInitialFrames
        .putInt(1)                  // dwStreams
        .putInt(frameSize)          // dwSuggestedBufferSize
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      fcc("LIST"); buf.putInt(116); fcc("strl")
      fcc("strh"); buf.putInt(56)
      fcc("vids"); fcc("DIB ")      // fccType, fccHandler
      buf.putInt(0)                 // dwFlags
        .putShort(0).putShort(0)    // wPriority, wLanguage
        .putInt(0)                  // dwInitialFrames
        .putInt(1).putInt(10)       // dwScale/dwRate = 10 fps
        .putInt(0)                  // dwStart
        .putInt(nFrames)            // dwLength (frames)
        .putInt(frameSize)          // dwSuggestedBufferSize
        .putInt(-1)                 // dwQuality (default)
        .putInt(0)                  // dwSampleSize (0 = one frame per chunk)
        .putShort(0).putShort(0)    // rcFrame left, top
        .putShort(w.toShort).putShort(h.toShort)
      fcc("strf"); buf.putInt(40)   // BITMAPINFOHEADER
      buf.putInt(40)                // biSize
        .putInt(w).putInt(h)        // biHeight > 0 -> bottom-up
        .putShort(1).putShort(24)   // biPlanes, biBitCount
        .putInt(0)                  // biCompression = BI_RGB
        .putInt(frameSize)          // biSizeImage
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fcc("LIST"); buf.putInt(moviBody); fcc("movi")
      var f = 0
      while (f < nFrames) {
        fcc("00db"); buf.putInt(frameSize)
        var y = h - 1 // bottom-up row order
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val v = ((id * 29 + f * 11 + x * 7 + y * 13) % 256).toByte
            buf.put(v).put(v).put(v) // B G R, all = gray value
            x += 1
          }
          var pad = stride - w * 3
          while (pad > 0) { buf.put(0.toByte); pad -= 1 }
          y -= 1
        }
        f += 1
      }
      buf.array()
    }
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(
        col("doc_id").as("asset_id"),
        lit("video").as("modality"),
        avi(col("doc_id")).as("payload"),
        lit("video/x-msvideo").as("mime"),
        (pmod(col("doc_id"), lit(5)) + 2).cast("int").as("meta_width"),
        (pmod(col("doc_id"), lit(4)) + 2).cast("int").as("meta_height"),
        ((pmod(col("doc_id"), lit(6)) + 2) * 100).cast("long")
          .as("meta_duration_ms"))
  }

  /**
   * MJPEG asset table: the same hand-rolled RIFF/AVI container as
   * [[aviAssetsFromDocuments]] but with fccHandler/biCompression 'MJPG'
   * and every `00dc` chunk a standalone JPEG (encoded with javax.imageio —
   * the Motion-JPEG convention, and the one COMPRESSED video codec a JVM
   * can encode AND decode with no native libs). Frame f of asset a renders
   * the same deterministic gray ramp as the DIB generator; dims are
   * (a mod 5)+8 × (a mod 4)+8 (≥ one JPEG MCU), frames (a mod 6)+2.
   * JPEG is LOSSY, so pixel sums are certified in the spec with a decode-
   * error tolerance; the hash-exact query (mm08) certifies that ImageIO
   * really decoded every frame — decode failure drops the row and the
   * closed-form metadata oracle turns red.
   */
  def mjpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val avi = udf { (id: Long) =>
      val nFrames = (id % 6).toInt + 2
      val w = (id % 5).toInt + 8
      val h = (id % 4).toInt + 8
      val jpegs = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((id * 29 + f * 11 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val moviBody = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
      val riffSize = 4 + 200 + (8 + moviBody)
      val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
      fcc("RIFF"); buf.putInt(riffSize); fcc("AVI ")
      fcc("LIST"); buf.putInt(192); fcc("hdrl")
      fcc("avih"); buf.putInt(56)
      buf.putInt(100000).putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fcc("LIST"); buf.putInt(116); fcc("strl")
      fcc("strh"); buf.putInt(56)
      fcc("vids"); fcc("MJPG")
      buf.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(10).putInt(0).putInt(nFrames)
        .putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      fcc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24)
      fcc("MJPG")                   // biCompression, read LE as 0x47504A4D
      buf.putInt(0)                 // biSizeImage (0 legal for compressed)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      fcc("LIST"); buf.putInt(moviBody); fcc("movi")
      jpegs.foreach { j =>
        fcc("00dc"); buf.putInt(j.length); buf.put(j)
        if ((j.length & 1) == 1) buf.put(0.toByte)
      }
      buf.array()
    }
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id").as("asset_id"),
        lit("video").as("modality"),
        avi(col("doc_id")).as("payload"),
        lit("video/x-msvideo").as("mime"))
  }

  /** mm08 decode table: frames/dims/sampled/pixel-sum from REALLY decoding
    * the MJPEG container (every-2nd-frame sampling, like the DIB path); a
    * decode failure yields a null struct, visibly breaking the metadata
    * oracle. `px_sum` is decoder-valued (JPEG is lossy) — certified in the
    * spec with an error budget, excluded from the hash-exact query. */
  def mjpegDecodeTable(docs: DataFrame): DataFrame = {
    val dec = udf { (payload: Array[Byte]) => decodeAvi(payload) }
    mjpegAssetsFromDocuments(docs)
      .select(col("asset_id"), dec(col("payload")).as("d"))
      .select(col("asset_id"),
        col("d._1").as("frames_total"), col("d._2").as("width"),
        col("d._3").as("height"), col("d._4").as("frames_sampled"),
        col("d._5").as("px_sum"))
  }

  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double, frames_sampled: Int,
      feature: Array[Double], decoded_width: Option[Int] = None,
      decoded_height: Option[Int] = None, px_sum: Option[Long] = None,
      n_px: Option[Long] = None, decoded_samples: Option[Long] = None,
      sample_rate: Option[Int] = None, channels: Option[Int] = None,
      sample_sum: Option[Long] = None, video_frames: Option[Int] = None,
      video_width: Option[Int] = None, video_height: Option[Int] = None,
      video_sampled: Option[Int] = None, video_px_sum: Option[Long] = None)

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

  /** REAL container decode for AVI payloads: an honest RIFF chunk walker
    * (LIST chunks are walked transparently, unknown chunks skipped by their
    * declared size, odd sizes padded per the RIFF spec) that reads the
    * stream format from `strf` (BITMAPINFOHEADER) and the frame bytes from
    * the movi `00db`/`00dc` chunks. Decodes uncompressed BI_RGB 24-bit
    * bottom-up DIB frames — the 'DIB ' codec; any compressed biCompression
    * is declined (None), as are corrupt containers — a bad asset must not
    * kill a 100 TB scan. Samples every `step`-th frame and sums the blue
    * channel (the generator writes b=g=r).
    * Returns (frames_total, width, height, frames_sampled, px_sum). */
  private[multimodal] def decodeAvi(payload: Array[Byte], step: Int = 2)
      : Option[(Int, Int, Int, Int, Long)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      if (bb.remaining() < 12 || fcc() != "RIFF") return None
      bb.getInt // riff size (trust the walk, not the header)
      if (fcc() != "AVI ") return None
      var w = -1; var h = -1; var bits = -1; var comp = -1
      // an strf chunk describes whichever stream the PRECEDING strh
      // declared — in a multi-stream AVI (audio strl before video) the
      // first strf is an audio WAVEFORMATEX, so bind only the strf that
      // follows a 'vids' stream header
      var lastStrh = ""
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (bb.remaining() >= 8) {
        val id = fcc()
        val sz = bb.getInt
        if (sz < 0 || sz > bb.remaining()) return None
        if (id == "LIST") {
          fcc() // list type; walk its children in the flat loop
        } else {
          if (id == "strh" && sz >= 4) {
            val p = bb.position()
            lastStrh = fcc()
            bb.position(p)
          }
          if (id == "strf" && sz >= 40 && w < 0 && lastStrh == "vids") {
            val p = bb.position()
            bb.getInt // biSize
            w = bb.getInt; h = bb.getInt
            bb.getShort // biPlanes
            bits = bb.getShort
            comp = bb.getInt
            bb.position(p)
          } else if (id == "00db" || id == "00dc") {
            frames += ((bb.position(), sz))
          }
          bb.position(bb.position() + sz + (sz & 1)) // RIFF pads odd chunks
        }
      }
      // BI_RGB bottom-up DIBs decoded in place; MJPG frames are standalone
      // JPEGs decoded through javax.imageio (pure JVM) — together the two
      // codecs a JVM can decode without native libs. Anything else is
      // declined (None), never a task kill.
      val MJPG = 0x47504A4D // 'MJPG' read little-endian
      if (w <= 0 || h <= 0 || bits != 24 || frames.isEmpty ||
          (comp != 0 && comp != MJPG))
        return None
      val stride = ((w * 3) + 3) / 4 * 4
      var sum = 0L
      var sampled = 0
      var f = 0
      while (f < frames.length) {
        val (off, sz) = frames(f)
        if (comp == 0) {
          if (sz < stride * h) return None
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += payload(off + y * stride + x * 3) & 0xff; x += 1 }
            y += 1
          }
        } else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, off, sz))
          if (img == null || img.getWidth != w || img.getHeight != h)
            return None
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
        }
        sampled += 1
        f += step
      }
      Some((frames.length, w, h, sampled, sum))
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * REAL image resize over REALLY-decoded pixels: decode the PNG payload
   * via javax.imageio, then nearest-neighbor downsample the gray channel
   * to `tw`×`th` with the canonical index map src_x = floor(x·w/tw),
   * src_y = floor(y·h/th) (the rounding is pinned here rather than
   * delegated to AWT's Graphics2D, whose interpolation choice is
   * implementation-defined — an oracle needs exact semantics). Emits one
   * row per asset: decoded source dims + the exact integer pixel sum of
   * the resized image. Partition-local, no collect; a corrupt payload
   * yields null feature columns, not a task kill.
   */
  def resizeGray(assets: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val r = Option(payload).flatMap(p => decodePngImage(p)).map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < th) {
              val sy = y * h / th
              var x = 0
              while (x < tw) {
                val sx = x * w / tw
                sum += (img.getRGB(sx, sy) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            (w, h, sum)
          }
          (id, r.map(_._1), r.map(_._2), r.map(_._3))
        }
      }.toDF("asset_id", "src_width", "src_height", "resized_px_sum")
  }

  private def decodePngImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /**
   * REAL audio feature extraction over REALLY-decoded samples: decode the
   * WAV payload via javax.sound.sampled, split the 16-bit PCM stream into
   * fixed `window`-sample frames (last frame ragged), and emit one row per
   * frame with the exact integer sum of squared samples — the energy
   * profile a speech/music classifier windows on, kept in integers so the
   * oracle can evaluate it exactly. Partition-local explode; corrupt
   * payloads produce zero rows rather than killing the scan.
   */
  def audioWindowEnergy(assets: DataFrame, window: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeWavSamples(payload).toSeq.flatMap { samples =>
            samples.grouped(window).zipWithIndex.map { case (g, w) =>
              (id, w, g.map(v => v.toLong * v).sum, g.length)
            }
          }
        }
      }.toDF("asset_id", "window_idx", "energy", "n_samples")
  }

  /**
   * Integer-exact spectral tilt per tumbling frame of REALLY-decoded PCM:
   * `dc_energy` = (Σx)² (the k=0 DFT bin's squared magnitude),
   * `nyquist_energy` = (Σ(−1)ʲxⱼ)² (the k=w/2 bin — ±1 coefficients, so
   * both are pure integer arithmetic, no trig parity concerns), and the
   * total frame energy Σx². High nyquist/dc ratio = sample-rate-scale
   * oscillation (noise/hiss); high dc/total = sustained offset — the
   * crude-but-honest silence/noise discriminator over real audio frames.
   */
  def audioSpectralTilt(assets: DataFrame, window: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeWavSamples(payload).toSeq.flatMap { samples =>
            samples.grouped(window).zipWithIndex.map { case (g, w) =>
              var dc = 0L; var ny = 0L; var tot = 0L
              var j = 0
              while (j < g.length) {
                val v = g(j).toLong
                dc += v
                ny += (if (j % 2 == 0) v else -v)
                tot += v * v
                j += 1
              }
              (id, w, dc * dc, ny * ny, tot, g.length)
            }
          }
        }
      }.toDF("asset_id", "frame_idx", "dc_energy", "nyquist_energy",
        "frame_energy", "n_samples")
  }

  private def decodeWavSamples(payload: Array[Byte]): Option[Array[Short]] =
    if (payload == null) None
    else try {
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
          val out = new Array[Short](sb.limit())
          sb.get(out)
          Some(out)
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
          val video =
            if (mime == "video/x-msvideo" && payload != null) decodeAvi(payload)
            else None
          AssetFeatures(id, modality,
            if (payload == null) 0L else payload.length.toLong,
            mean, entropy, frames, feature,
            decoded.map(_._1), decoded.map(_._2), decoded.map(_._3),
            decoded.map(_._4),
            audio.map(_._1), audio.map(_._2), audio.map(_._3), audio.map(_._4),
            video.map(_._1), video.map(_._2), video.map(_._3), video.map(_._4),
            video.map(_._5))
        }
      }.toDF()
  }
}
