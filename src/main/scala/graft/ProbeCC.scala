package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe (r17): connected-components scale measurement. The cc01 driver
 * row runs on a 200-doc certification slice (its pair generator is the
 * SQL-oracle-able all-pairs Jaccard), so it says nothing about scale; this
 * probe feeds [[graft.text.Dedup.dupClusters]] the REAL
 * minhashNearDuplicates pair set (dd03 parameters) and times the iterative
 * CC alone, pairs pre-materialized. Run with SPARK_GRAFT_SF_DIR at sf0.1 /
 * /tmp/sf1 / /tmp/sf10 for the 1x/10x/100x series (see SCALE.md).
 */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val pairs = graft.text.Dedup.minhashNearDuplicates(docs,
      k = 3, numHashes = 64, bands = 16, threshold = 0.3)
      .select(col("id_a"), col("id_b")).persist()
    val nPairs = pairs.count()
    val nDocs = docs.count()
    println(s"[probecc] sf=$sfDir docs=$nDocs pairs=$nPairs")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val cc = graft.text.Dedup.dupClusters(docs.select("doc_id"), pairs)
      val nCanonical = cc.filter(col("is_canonical")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probecc] rep$r $secs%8.2f s  canonical=$nCanonical")
    }
    spark.stop()
  }
}
