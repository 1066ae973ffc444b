package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev probe (r17): embedding near-dup LSH at scale. Args: reps (default 2),
 * planesPerBand (default 0 = occupancy auto), threshold (default 0.9).
 * The dd06 driver row certifies the pipeline at threshold 0.2 on the tiny
 * unclustered corpus; this probe measures the operator at a REAL near-dup
 * threshold on /tmp/sf1 / /tmp/sf10, where the fixed-256-bucket band space
 * is the scale landmine the auto planes setting defuses (SCALE.md r17).
 */
object ProbeEmb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(2)
    val planes = args.drop(1).headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(0)
    val thr = args.drop(2).headOption.flatMap(a => scala.util.Try(a.toDouble).toOption).getOrElse(0.9)
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[probeemb] sf=$sfDir vectors=${emb.count()} planes=$planes thr=$thr")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val pairs = graft.text.Dedup.embeddingNearDuplicates(emb,
        threshold = thr, planesPerBand = planes)
      val n = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probeemb] rep$r $secs%8.2f s  pairs=$n")
    }
    spark.stop()
  }
}
