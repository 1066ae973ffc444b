package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ts.{RollAlign, TimeSeriesOps => TS}

/** Dev smoke runner: exercises SparkEntry.entry the way the driver does. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val daily = TS.resampleCalendar(
      Tables.events(spark, dir).select(col("user_id"), col("ts_us"), col("value")),
      "DAY", avg, key = "user_id", ts = "ts_us", value = "value", tickNanos = 1000L)
      .withColumn("day_us", unix_micros(col("bucket_ts")))
    println("daily rows: " + daily.count())
    daily.show(3)
    val Array(minUs, maxUs) = daily.agg(min("day_us"), max("day_us"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    println(s"min=$minUs max=$maxUs span_days=${(maxUs - minUs) / 86400000000L}")
    val index = graft.core.IrregularDateTimeIndex((minUs to maxUs by 86400000000L).toArray)
    println("index size: " + index.size)
    val aligned = TS.align(daily.select(col("user_id"), col("day_us"), col("value")),
      index, fillMethod = Some("linear"), key = "user_id", ts = "day_us", value = "value")
    println("aligned rows: " + aligned.count() +
      " non-null: " + aligned.filter(col("value").isNotNull).count())
    aligned.orderBy("user_id", "day_us").show(8)
    val rolled = TS.rollMean(aligned, 7, RollAlign.Right,
      key = "user_id", ts = "day_us", value = "value")
    println("rolled rows: " + rolled.count())
    spark.stop()
  }
}
