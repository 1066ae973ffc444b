package graft.ts

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.core.IrregularDateTimeIndex
import graft.ts.{TimeSeriesOps => TS}

/** Hand-computed-vector tests for the relational operators
  * (mirrors the reference's FillSuite/RebaseSuite/ResampleSuite patterns). */
class TimeSeriesOpsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def obs(rows: (String, Long, java.lang.Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (k, t, v) =>
      (k, t, Option(v).map(_.doubleValue))
    }.toDF("key", "ts_nanos", "value")
  }

  private def values(df: org.apache.spark.sql.DataFrame, key: String): Seq[Option[Double]] =
    df.filter(col("key") === key).orderBy("ts_nanos").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("value"))) None
      else Some(r.getDouble(r.fieldIndex("value")))).toSeq

  test("fill previous (LOCF)") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, null), ("a", 3L, null), ("a", 4L, 2.0), ("a", 5L, null))
    values(TS.fill(df, "previous"), "a") shouldBe
      Seq(Some(1.0), Some(1.0), Some(1.0), Some(2.0), Some(2.0))
  }

  test("fill next (NOCB)") {
    val df = obs(("a", 1L, null), ("a", 2L, 1.0), ("a", 3L, null), ("a", 4L, 2.0))
    values(TS.fill(df, "next"), "a") shouldBe
      Seq(Some(1.0), Some(1.0), Some(2.0), Some(2.0))
  }

  test("fill nearest: ties go to previous") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, null), ("a", 3L, 3.0),
      ("a", 4L, null), ("a", 5L, null), ("a", 6L, 6.0))
    // loc2: equidistant from 1 and 3 -> previous (1.0)
    // loc4: prev dist 1, next dist 2 -> 3.0 ; loc5: prev 2, next 1 -> 6.0
    values(TS.fill(df, "nearest"), "a") shouldBe
      Seq(Some(1.0), Some(1.0), Some(3.0), Some(3.0), Some(6.0), Some(6.0))
  }

  test("fill linear interpolates interior gaps only") {
    val df = obs(("a", 1L, null), ("a", 2L, 1.0), ("a", 3L, null),
      ("a", 4L, null), ("a", 5L, 4.0), ("a", 6L, null))
    values(TS.fill(df, "linear"), "a") shouldBe
      Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
  }

  test("lags produce trimmed lag columns") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0))
    val out = TS.lags(df, 2).orderBy("ts_nanos").collect()
    out.length shouldBe 2
    out(0).getAs[Double]("lag_1") shouldBe 2.0
    out(0).getAs[Double]("lag_2") shouldBe 1.0
    out(1).getAs[Double]("lag_1") shouldBe 3.0
  }

  test("per-key lag spec: own maxLag, own trim, keepOriginal, pass-through") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("b", 1L, 10.0), ("b", 2L, 20.0), ("b", 3L, 30.0),
      ("c", 1L, 7.0), ("c", 2L, 8.0))
    // a: 2 lags, keep original; b: 1 lag, drop original; c: unlisted
    val out = TS.lags(df, Map("a" -> (true, 2), "b" -> (false, 1)),
      "key", "ts_nanos", "value").orderBy("key", "ts_nanos").collect()
    val aRows = out.filter(_.getString(0) == "a")
    aRows.length shouldBe 2 // trimmed by a's own maxLag=2
    aRows(0).getAs[Double]("value") shouldBe 3.0
    aRows(0).getAs[Double]("lag_1") shouldBe 2.0
    aRows(0).getAs[Double]("lag_2") shouldBe 1.0
    val bRows = out.filter(_.getString(0) == "b")
    bRows.length shouldBe 2 // trimmed by b's maxLag=1
    bRows(0).isNullAt(bRows(0).fieldIndex("value")) shouldBe true // keepOriginal=false
    bRows(0).getAs[Double]("lag_1") shouldBe 10.0
    bRows(0).isNullAt(bRows(0).fieldIndex("lag_2")) shouldBe true // beyond b's max
    val cRows = out.filter(_.getString(0) == "c")
    cRows.length shouldBe 2 // unlisted key: untouched, untrimmed
    cRows.map(_.getAs[Double]("value")).toSeq shouldBe Seq(7.0, 8.0)
  }

  test("quotients/returnRates yield null (not ANSI error) on zero base") {
    val df = obs(("a", 1L, 0.0), ("a", 2L, 4.0), ("a", 3L, 8.0))
    values(TS.quotients(df, 1), "a") shouldBe Seq(None, Some(2.0))
    values(TS.returnRates(df), "a") shouldBe Seq(None, Some(1.0))
  }

  test("differences and quotients") {
    val df = obs(("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 8.0))
    values(TS.differences(df, 1), "a") shouldBe Seq(Some(2.0), Some(4.0))
    values(TS.quotients(df, 1), "a") shouldBe Seq(Some(2.0), Some(2.0))
    values(TS.returnRates(df), "a") shouldBe Seq(Some(1.0), Some(1.0))
  }

  test("rollMean alignment variants keep only full windows") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0), ("a", 5L, 5.0))
    values(TS.rollMean(df, 3, RollAlign.Right), "a") shouldBe
      Seq(Some(2.0), Some(3.0), Some(4.0))
    values(TS.rollMean(df, 3, RollAlign.Left), "a") shouldBe
      Seq(Some(2.0), Some(3.0), Some(4.0))
    values(TS.rollMean(df, 3, RollAlign.Center), "a") shouldBe
      Seq(Some(2.0), Some(3.0), Some(4.0))
    // but they sit at different timestamps
    TS.rollMean(df, 3, RollAlign.Right).orderBy("ts_nanos").collect().map(_.getLong(1)).toSeq shouldBe Seq(3L, 4L, 5L)
    TS.rollMean(df, 3, RollAlign.Left).orderBy("ts_nanos").collect().map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L, 3L)
    TS.rollMean(df, 3, RollAlign.Center).orderBy("ts_nanos").collect().map(_.getLong(1)).toSeq shouldBe Seq(2L, 3L, 4L)
  }

  test("trims strip edge nulls only") {
    val df = obs(("a", 1L, null), ("a", 2L, 1.0), ("a", 3L, null), ("a", 4L, 2.0), ("a", 5L, null))
    values(TS.trimLeading(df), "a") shouldBe Seq(Some(1.0), None, Some(2.0), None)
    values(TS.trimTrailing(df), "a") shouldBe Seq(None, Some(1.0), None, Some(2.0))
  }

  test("downsample keeps every nth observation") {
    val df = obs((1 to 10).map(i => ("a", i.toLong, java.lang.Double.valueOf(i.toDouble))): _*)
    values(TS.downsample(df, 3), "a") shouldBe Seq(Some(1.0), Some(4.0), Some(7.0), Some(10.0))
    values(TS.downsample(df, 3, phase = 1), "a") shouldBe Seq(Some(2.0), Some(5.0), Some(8.0))
  }

  test("removeInstantsWithNaNs drops any-incomplete timestamps across keys") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, null), ("a", 3L, 3.0),
      ("b", 1L, 10.0), ("b", 2L, 20.0)) // b missing ts=3 entirely
    val out = TS.removeInstantsWithNaNs(df)
    out.select("ts_nanos").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("align conforms every key to the index and fills") {
    val df = obs(("a", 10L, 1.0), ("a", 30L, 3.0), ("b", 20L, 5.0))
    val idx = IrregularDateTimeIndex(Array(10L, 20L, 30L))
    val aligned = TS.align(df, idx)
    aligned.count() shouldBe 6
    values(aligned, "a") shouldBe Seq(Some(1.0), None, Some(3.0))
    val filled = TS.align(df, idx, Some("previous"))
    values(filled, "b") shouldBe Seq(None, Some(5.0), Some(5.0))
  }

  test("asofJoin picks latest right value at or before each left ts") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 5L), ("a", 15L), ("a", 25L), ("b", 10L))
      .toDF("key", "ts_nanos")
    val right = obs(("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 10L, 9.0))
    val out = TS.asofJoin(left, right).orderBy("key", "ts_nanos").collect()
    out.map(r => Option(r.getAs[java.lang.Double]("asof_value")).map(_.doubleValue)).toSeq shouldBe
      Seq(None, Some(1.0), Some(2.0), Some(9.0)) // equal-ts right row included
  }

  test("asofJoin matches a null-valued right row instead of falling back") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 25L)).toDF("key", "ts_nanos")
    // the latest right row at ts=20 aggregated to NULL: SQL ASOF JOIN
    // matches that ROW and emits NULL — it must not fall back to ts=10
    val right = Seq(("a", 10L, Some(1.0)), ("a", 20L, None))
      .toDF("key", "ts_nanos", "value")
    val out = TS.asofJoin(left, right).collect()
    out(0).isNullAt(out(0).fieldIndex("asof_value")) shouldBe true
  }

  test("asofJoin honors tolerance") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 100L)).toDF("key", "ts_nanos")
    val right = obs(("a", 10L, 1.0))
    val out = TS.asofJoin(left, right, toleranceNanos = 50L).collect()
    out(0).isNullAt(out(0).fieldIndex("asof_value")) shouldBe true
  }

  test("resample boundary semantics: all four closedRight/stampRight modes") {
    // width 10, observations at 0,5,10,15,20
    val df = obs(("a", 0L, 1.0), ("a", 5L, 2.0), ("a", 10L, 3.0), ("a", 15L, 4.0), ("a", 20L, 5.0))
    def buckets(closedRight: Boolean, stampRight: Boolean): Map[Long, Double] =
      TS.resample(df, 10L, sum, closedRight, stampRight).collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // closed-left [s, s+10), stamp left: 0->{0,5}=3, 10->{10,15}=7, 20->{20}=5
    buckets(false, false) shouldBe Map(0L -> 3.0, 10L -> 7.0, 20L -> 5.0)
    // closed-left, stamp right
    buckets(false, true) shouldBe Map(10L -> 3.0, 20L -> 7.0, 30L -> 5.0)
    // closed-right (s, s+10], stamp left: bucket (-10,0]={0}, (0,10]={5,10}, (10,20]={15,20}
    buckets(true, false) shouldBe Map(-10L -> 1.0, 0L -> 5.0, 10L -> 9.0)
    // closed-right, stamp right
    buckets(true, true) shouldBe Map(0L -> 1.0, 10L -> 5.0, 20L -> 9.0)
  }

  test("toSeries/fromSeries round-trip through the array layout") {
    val df = obs(("a", 10L, 1.0), ("a", 30L, 3.0), ("b", 20L, 5.0))
    val idx = IrregularDateTimeIndex(Array(10L, 20L, 30L))
    val series = TS.toSeries(df, idx)
    val a = series.filter(col("key") === "a").collect()(0)
      .getAs[scala.collection.Seq[Double]]("series")
    a(0) shouldBe 1.0
    a(1).isNaN shouldBe true
    a(2) shouldBe 3.0
    val back = TS.fromSeries(series, idx)
    back.count() shouldBe 3 // NaNs dropped, like the reference's melt
    values(back, "a") shouldBe Seq(Some(1.0), Some(3.0))
  }

  test("toInstants pivots keys into columns") {
    val df = obs(("a", 1L, 1.0), ("b", 1L, 2.0), ("a", 2L, 3.0))
    val out = TS.toInstants(df, Seq("a", "b")).orderBy("ts_nanos").collect()
    out(0).getDouble(1) shouldBe 1.0
    out(0).getDouble(2) shouldBe 2.0
    out(1).getDouble(1) shouldBe 3.0
    out(1).isNullAt(2) shouldBe true
  }

  test("fluent syntax chains operators with the declared column roles") {
    import graft.ts.syntax._
    val df = obs(("a", 1L, 1.0), ("a", 2L, null), ("a", 3L, 3.0), ("a", 4L, 4.0))
    val out = df.asTimeSeries().fill("linear").differences().df
    values(out, "a") shouldBe Seq(Some(1.0), Some(1.0), Some(1.0))
  }

  test("seriesStats per key") {
    val df = obs(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0))
    val r = TS.seriesStats(df).collect()(0)
    r.getAs[Long]("n") shouldBe 3
    r.getAs[Double]("mean") shouldBe 2.0
    r.getAs[Double]("min") shouldBe 1.0
    r.getAs[Double]("max") shouldBe 3.0
  }
}
