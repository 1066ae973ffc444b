package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: minhash stage-by-stage timing at a given SF. */
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
    val withSh = docs.repartition(64).select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
      .persist()
    timed("shingles")(withSh.count())
    val withSig = withSh.withColumn("sig", Dedup.minhashSignature(col("sh"), 64))
      .persist()
    timed("signatures")(withSig.count())
    val cands = Dedup.minhashCandidates(withSig, "id", "sig", 16).persist()
    timed("candidates")(cands.count())
    val sh = withSh
    val verified = cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.3)
    timed("verify")(verified.count())
    spark.stop()
  }
}
