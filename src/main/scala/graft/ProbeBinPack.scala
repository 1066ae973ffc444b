package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the r20 `binPacking(domainSize=0)` auto-domain default:
  * packs the FULL documents table under (a) the auto quantile-range
  * domains and (b) a forced single global domain (numRanges=1 via an
  * explicit corpus-sized domain) — the pre-r20 behavior — so the
  * parallel-vs-sequential gap is measured, not argued. args: [reps]. */
object ProbeBinPack {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    def time(label: String, domainSize: Long): Unit =
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = graft.text.Packing.binPacking(docs, capacity = 256,
          domainSize = domainSize).queryExecution.toRdd.count()
        println(f"[probebp] $label%-12s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    time("auto", 0L)
    time("one-domain", Long.MaxValue / 4) // every id in domain 0: pre-r20 default
    spark.stop()
  }
}
