package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of representative queries so the
  * scan pushdown / broadcast / shuffle structure can be audited. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.configure(SparkSession.builder().master("local[4]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = if (args.nonEmpty) args.toSet
    else Set("q01_pricing_summary", "q02_revenue_by_nation", "ts01_lag",
      "ts14_slice",
      "ts08_asof", "sm01_knn_bruteforce", "dd03_minhash_neardup")
    SparkEntry.queries.filter(q => which(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
