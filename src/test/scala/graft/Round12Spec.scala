package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.text.TextFunctions

/** Round-12: bounded two-phase top-K for log-odds keywords (no
  * stratum-wide rank window) and testdata-schema robustness. */
class Round12Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("logOddsKeywords plan contains no Window operator (bounded two-phase top-K)") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "apple apple banana"), ("s2", "cherry banana cherry")
    ).toDF("source", "text")
    val plan = TextFunctions.logOddsKeywords(docs, topK = 3)
      .queryExecution.executedPlan.toString
    // the old implementation ranked with row_number() OVER (PARTITION BY
    // stratum) — a single-task sort of an entire stratum's vocabulary; the
    // bounded rewrite must not reintroduce any window at all
    plan should not include "Window"
    plan should not include "row_number"
  }

  test("logOddsKeywords top-K is independent of physical partitioning") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (0 until 400).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      // skew word frequencies differently per stratum
      val w = words((i * (if (src == "a") 1 else 3)) % words.length)
      (src, s"$w common filler ${words(i % 5)}")
    }
    val docs = rows.toDF("source", "text")
    def topSet(df: org.apache.spark.sql.DataFrame) =
      TextFunctions.logOddsKeywords(df, topK = 4).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getAs[String]("token"),
          r.getAs[Double]("log_odds_z"))).toSet
    val one = topSet(docs.coalesce(1))
    val many = topSet(docs.repartition(13))
    many shouldBe one
  }

  test("Tables.events normalizes ts to micros for both long-nanos and timestamp schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evt").toString
    // timestamp[us] flavor (the current driver schema)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val us = Tables.events(spark, dir).select("ts_us").head().getLong(0)
    us shouldBe 1704067201000000L
    // long flavor (nanos), the pre-round-10 driver schema
    val dir2 = java.nio.file.Files.createTempDirectory("evt2").toString
    Seq((1L, 1704067201000000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val us2 = Tables.events(spark, dir2).select("ts_us").head().getLong(0)
    us2 shouldBe 1704067201000000L
  }
}
