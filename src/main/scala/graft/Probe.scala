package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: exercises SparkEntry.entry the way the driver does. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(12)
    println("entry rows: " + df.count())
    spark.stop()
  }
}
