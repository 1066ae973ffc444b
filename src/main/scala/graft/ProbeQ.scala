package graft

import org.apache.spark.sql.SparkSession

/** Dev timing runner: times named SparkEntry queries (args: [reps] name...). */
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
    for (name <- names; fn = SparkEntry.queries(name); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probeq] $name%-28s rep$r $secs%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
