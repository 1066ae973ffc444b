package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.{SemDedup, Similarity}

/** Dev phase-timing for the rc07 certification (suite-max adjudication). */
object ProbeRc07 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count()
    def time[T](nm: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rc07] $nm%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val emb = time("checkpoint slice") {
        Tables.embeddings(spark, sfDir).filter(col("vec_id") < 300).localCheckpoint()
      }
      val v = emb.select(col("vec_id").as("id"),
        Similarity.normalized(col("embedding")).as("nv"))
      val a = v.select(col("id").as("id_a"), col("nv").as("va"))
      val b = v.select(col("id").as("id_b"), col("nv").as("vb"))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .withColumn("c", Similarity.dot(col("va"), col("vb")))
        .filter(col("c") >= 0.2).select("id_a", "id_b", "c")
      time("exact count")(exact.persist().count())
      val approx = time("probe1 build") {
        SemDedup.semanticDuplicates(emb, k = 4, threshold = 0.2)
      }
      time("probe1 count")(approx.persist().count())
      val approx2 = time("probe2 build") {
        SemDedup.semanticDuplicates(emb, k = 4, threshold = 0.2, nprobe = 2)
      }
      time("probe2 count")(approx2.persist().count())
      val keep2 = SemDedup.keepersOfPairs(emb, approx2).select(col("vec_id"))
      time("keep2 count")(keep2.persist().count())
      Seq(exact, approx, approx2, keep2).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
