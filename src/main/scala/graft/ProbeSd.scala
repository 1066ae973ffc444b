package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev probe (r17): SemDeDup at scale with the paper's k ≈ √n rule
 * (`k = 0` → [[graft.sim.SemDedup.suggestedK]]). The sd01 driver row pins
 * k = 8 for the small certification corpus; at 100× that leaves ~n/8-row
 * clusters and quadratic within-cluster work — the √n rule is the scale
 * contract (Σ n_c² ≈ n^1.5), and this probe measures it. Optional arg 1:
 * reps (default 3); arg 2: k override (default 0 = auto).
 */
object ProbeSd {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val k = args.drop(1).headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(0)
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"[probesd] sf=$sfDir vectors=$n k=$k (0=auto)")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val pairs = graft.sim.SemDedup.semanticDuplicates(emb, k = k, threshold = 0.2)
      val nPairs = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probesd] rep$r $secs%8.2f s  pairs=$nPairs")
    }
    spark.stop()
  }
}
