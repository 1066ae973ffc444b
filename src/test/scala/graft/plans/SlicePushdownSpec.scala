package graft.plans

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.Tables

/** Plan-shape pin for the slice path: the time-range predicate must reach the
  * parquet scan as PushedFilters on the RAW ts column (VERDICT r13 "what's
  * wrong" #1). Covers both schema branches Tables supports. */
class SlicePushdownSpec extends AnyFunSuite with Matchers
    with graft.SparkTestSession {

  private val loUs = 1704844800000000L // 2024-01-10T00:00Z
  private val hiUs = 1705708800000000L // 2024-01-20T00:00Z

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("eventsSliceUs pushes the ts range to the parquet scan (NTZ branch)") {
    val df = Tables.eventsSliceUs(spark, "/root/testdata/sf0.001", loUs, hiUs)
    val plan = formatted(df)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    pushed should include("GreaterThanOrEqual(ts")
    pushed should include("LessThanOrEqual(ts")
  }

  test("eventsSliceUs matches the post-scan ts_us filter exactly (NTZ branch)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val fast = Tables.eventsSliceUs(spark, dir, loUs, hiUs)
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val slow = Tables.events(spark, dir)
      .filter(col("ts_us") >= loUs && col("ts_us") <= hiUs)
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    fast.length should be > 0
    fast shouldBe slow
  }

  test("eventsSliceUs pushes the ts range on the long-ts branch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-slice").toString
    (1 to 100).map(i => (i.toLong, loUs * 1000L + i * 3600L * 1000000000L,
        i.toLong % 5, "click", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.eventsSliceUs(spark, dir, loUs, hiUs)
    val plan = formatted(df)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    pushed should include("GreaterThanOrEqual(ts")
    pushed should include("LessThanOrEqual(ts")
    // semantic check: ts div 1000 in [loUs, hiUs]
    val n = df.count()
    n shouldBe (1 to 100).count { i =>
      val us = (loUs * 1000L + i * 3600L * 1000000000L) / 1000L
      us >= loUs && us <= hiUs
    }
  }
}
