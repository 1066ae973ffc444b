package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video carried as opaque `BINARY`
 * payloads with typed metadata, processed in partition-local batches.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * libraries): `decodeStub` derives deterministic fake features from the
 * bytes. Everything around it — the schema, the batch shape (mapPartitions
 * with an iterator, so one task streams many payloads without
 * collect), the partitioning story — is the real production layout; swapping
 * `decodeStub` for a JNI/FFI decoder changes no plumbing.
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

  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double, frames_sampled: Int,
      feature: Array[Double])

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

  /** Extract features from every asset, one partition-local pass. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "payload", "meta_duration_ms")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (model load etc.)
        it.map { case (id, modality, payload, durationMs) =>
          val (mean, entropy, feature) = decodeStub(payload)
          val frames = modality match {
            case "video" => math.max(1, (durationMs / 1000L).toInt) // 1 fps sample
            case "audio" => math.max(1, (durationMs / 5000L).toInt)
            case _ => 1
          }
          AssetFeatures(id, modality,
            if (payload == null) 0L else payload.length.toLong,
            mean, entropy, frames, feature)
        }
      }.toDF()
  }
}
