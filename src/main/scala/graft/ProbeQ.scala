package graft

import org.apache.spark.sql.SparkSession

/** Dev timing runner: times named SparkEntry queries (args: [reps] name...).
  * SPARK_GRAFT_MATERIALIZE=1 times `queryExecution.toRdd.count()` instead of
  * `count()`: count() lets ColumnPruning drop expensive output-only columns
  * (e.g. dd21's rebuilt clean_text), so it under-times queries whose cost
  * lives in pruned projections; toRdd forces every output column. */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (reps, names) = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption) match {
      case Some(r) => (r, args.drop(1).toSeq)
      case None    => (1, args.toSeq)
    }
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    val materialize = sys.env.get("SPARK_GRAFT_MATERIALIZE").contains("1")
    for (name <- names; fn = SparkEntry.queries(name); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = if (materialize) df.queryExecution.toRdd.count() else df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probeq] $name%-28s rep$r $secs%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
