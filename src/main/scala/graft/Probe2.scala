package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: minhash near-dup stage-by-stage timing at a given SF
  * (profiles the CURRENT minhashNearDuplicates layout). */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    timed("scan")(docs.count())
    val parallelism = spark.sparkContext.defaultParallelism
    val base = docs.repartition(parallelism)
      .select(col("doc_id").as("id"), col("text").as("__text")).persist()
    timed("base")(base.count())
    val withSig = base.withColumn("sig",
      Dedup.minhashSignatureFromText(col("__text"), 3, 64)).persist()
    timed("signatures")(withSig.count())
    val cands = Dedup.minhashCandidates(
      withSig.select(col("id"), col("sig")), "id", "sig", 16).persist()
    timed("candidates")(cands.count())
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val candSh = base.join(broadcast(candIds), "id")
      .select(col("id"), Dedup.shingles(col("__text"), 3).as("sh")).persist()
    timed("cand_shingles")(candSh.count())
    val verified = cands
      .join(candSh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(candSh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.3)
    timed("verify")(verified.count())
    timed("full_pipeline_uncached")(
      Dedup.minhashNearDuplicates(docs, k = 3, numHashes = 64, bands = 16,
        threshold = 0.3).count())
    spark.stop()
  }
}
