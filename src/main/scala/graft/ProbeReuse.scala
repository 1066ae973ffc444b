package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: execute a query and print the FINAL adaptive plan, which is
  * where AQE inserts ReusedExchange/ReusedSubquery — the static explain
  * (graft.Explain) shows the pre-execution plan and under-reports reuse. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length
      println(s"[reuse] $name scans=$scans reusedExchange=$reused")
    }
    spark.stop()
  }
}
