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
 *
 * r18: also times [[graft.text.Dedup.clusterRepresentatives]] (CC plus one
 * window shuffle on cluster_id for the quality argmax) and
 * [[graft.text.Dedup.leakageFreeSplit]] (CC plus a narrow map) on the same
 * pair set — the delta over plain dupClusters is the marginal cost of the
 * election / split step at scale.
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
      val t1 = System.nanoTime()
      val reps18 = graft.text.Dedup.clusterRepresentatives(
        docs.select(col("doc_id"), length(col("text")).cast("long").as("q")),
        pairs, col("q"))
      val nKeep = reps18.filter(col("keep")).count()
      val t2 = System.nanoTime()
      val split = graft.text.Dedup.leakageFreeSplit(docs.select("doc_id"), pairs, 10)
      val nSplit = split.select("split").distinct().count()
      val t3 = System.nanoTime()
      println(f"[probecc] rep$r cc=${(t1 - t0) / 1e9}%7.2f s canonical=$nCanonical" +
        f"  elect=${(t2 - t1) / 1e9}%7.2f s keep=$nKeep" +
        f"  split=${(t3 - t2) / 1e9}%7.2f s splits=$nSplit")
    }
    spark.stop()
  }
}
