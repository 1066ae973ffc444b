package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.stats.RobustRegression
import graft.text.TextFunctions
import graft.ts.{RollAlign, TimeSeriesOps}

/** Specs for the round-5 operators: sessionization/funnel/retention,
  * seasonal decomposition, CUSUM changepoints, rolling median,
  * cross-correlation, Theil-Sen, Gopher filter, bigram top-k. */
class Round5Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("sessionize splits on gaps > gapUs and numbers sessions in order") {
    val s = spark
    import s.implicits._
    // user 1: events at 0, 10, 1000, 1010, 2000 with gap 100 -> 3 sessions
    val df = Seq((1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 1000L, 3.0),
      (1L, 1010L, 4.0), (1L, 2000L, 5.0), (2L, 5L, 9.0))
      .toDF("user_id", "ts_us", "value")
    val out = EventOps.sessionize(df, gapUs = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    out((1L, 0L)) shouldBe 1L
    out((1L, 10L)) shouldBe 1L
    out((1L, 1000L)) shouldBe 2L
    out((1L, 1010L)) shouldBe 2L
    out((1L, 2000L)) shouldBe 3L
    out((2L, 5L)) shouldBe 1L
  }

  test("sessions aggregates bounds, counts and sums per session") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 1000L, 3.0))
      .toDF("user_id", "ts_us", "value")
    val rows = EventOps.sessions(df, gapUs = 100L)
      .orderBy("session_no").collect()
    rows.length shouldBe 2
    rows(0).getAs[Long]("session_start") shouldBe 0L
    rows(0).getAs[Long]("session_end") shouldBe 10L
    rows(0).getAs[Long]("duration_us") shouldBe 10L
    rows(0).getAs[Long]("n_events") shouldBe 2L
    rows(0).getAs[Double]("sum_value") shouldBe 3.0
    rows(1).getAs[Long]("n_events") shouldBe 1L
  }

  test("funnel requires strictly increasing step times") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1 completes view(10) -> click(20) -> purchase(30)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE view -> funnel stops after view
      (2L, 10L, "click"), (2L, 20L, "view"),
      // user 3: view then purchase but no click -> reached 1
      (3L, 10L, "view"), (3L, 20L, "purchase"),
      // user 4: never views -> not in output
      (4L, 10L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val out = EventOps.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("reached")).toMap
    out shouldBe Map(1L -> 3, 2L -> 1, 3L -> 1)
  }

  test("retention counts distinct users per cohort/offset") {
    val s = spark
    import s.implicits._
    val day = 86400000000L
    // u1 first day 0, active days 0 and 1; u2 first day 0 only; u3 first day 1
    val df = Seq((1L, 0L), (1L, 10L), (1L, day + 5L), (2L, 20L), (3L, day + 1L))
      .toDF("user_id", "ts_us")
    val out = EventOps.retention(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (day, 0L) -> 1L)
  }

  test("seasonalDecompose recovers a pure seasonal pattern") {
    val s = spark
    import s.implicits._
    // value = 10 + phase (period 3, 12 points): trend -> 11 (mean over any
    // full window), seasonal -> phase - 1, resid -> 0
    val df = (0 until 12).map(i => (1L, i.toLong, 10.0 + (i % 3)))
      .toDF("user_id", "ts_us", "value")
    val rows = TimeSeriesOps.seasonalDecompose(df, 3,
      key = "user_id", ts = "ts_us", value = "value")
      .orderBy("ts_us").collect()
    rows.head.isNullAt(rows.head.fieldIndex("trend")) shouldBe true // edge: no full window
    val interior = rows.filter(_.getAs[Any]("trend") != null)
    interior.length shouldBe 10
    all(interior.map(_.getAs[Double]("trend"))) shouldBe 11.0 +- 1e-9
    all(interior.map(_.getAs[Double]("resid"))) shouldBe 0.0 +- 1e-9
    val bySeason = rows.filter(_.getAs[Any]("seasonal") != null)
      .map(r => r.getAs[Long]("ts_us") % 3 -> r.getAs[Double]("seasonal")).toMap
    bySeason(0L) shouldBe -1.0 +- 1e-9
    bySeason(1L) shouldBe 0.0 +- 1e-9
    bySeason(2L) shouldBe 1.0 +- 1e-9
  }

  test("seasonalDecompose even period: 2x-period MA recovers linear trend + pattern") {
    val s = spark
    import s.implicits._
    // value = (100 + 2 t) + s_{t%4} with s = (3, -1, -2, 0): the symmetric
    // half-weight 2x4 MA is exact on a linear function, and the seasonal
    // pattern's full-cycle weighted sum is 0 (endpoints share a phase), so
    // trend must equal the linear part exactly on the interior
    val pat = Array(3.0, -1.0, -2.0, 0.0)
    val df = (0 until 16).map(i => (1L, i.toLong, 100.0 + 2.0 * i + pat(i % 4)))
      .toDF("user_id", "ts_us", "value")
    val rows = TimeSeriesOps.seasonalDecompose(df, 4,
      key = "user_id", ts = "ts_us", value = "value")
      .orderBy("ts_us").collect()
    // 2 edge rows on each side have no full period+1 window
    rows.count(_.getAs[Any]("trend") == null) shouldBe 4
    val interior = rows.filter(_.getAs[Any]("trend") != null)
    interior.length shouldBe 12
    interior.foreach { r =>
      val t = r.getAs[Long]("ts_us")
      r.getAs[Double]("trend") shouldBe (100.0 + 2.0 * t) +- 1e-9
      r.getAs[Double]("resid") shouldBe 0.0 +- 1e-9
    }
    // detrended interior values are exactly the pattern, so the phase means
    // reproduce it (phases with only edge rows still average the pattern)
    val bySeason = rows.filter(_.getAs[Any]("seasonal") != null)
      .map(r => r.getAs[Long]("ts_us") % 4 -> r.getAs[Double]("seasonal")).toMap
    (0 until 4).foreach(p => bySeason(p.toLong) shouldBe pat(p) +- 1e-9)
  }

  test("cusumChangepoint finds a mean shift") {
    val s = spark
    import s.implicits._
    // 20 points at 0, then 20 points at 5: |cusum| peaks at the boundary
    val df = (0 until 40).map(i => (1L, i.toLong, if (i < 20) 0.0 else 5.0))
      .toDF("user_id", "ts_us", "value")
    val row = TimeSeriesOps.cusumChangepoint(df,
      key = "user_id", ts = "ts_us", value = "value").collect().head
    row.getAs[Long]("changepoint_ts") shouldBe 19L
    row.getAs[Double]("cusum_stat") should be > 1.36 // 95% significance
  }

  test("cusum statistic is small for an i.i.d.-looking series") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map(i => (1L, i.toLong, rnd.nextGaussian()))
      .toDF("user_id", "ts_us", "value")
    val stat = TimeSeriesOps.cusumChangepoint(df,
      key = "user_id", ts = "ts_us", value = "value")
      .collect().head.getAs[Double]("cusum_stat")
    stat should be < 1.36
  }

  test("rollMedian is the exact window median") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L, 5.0), (1L, 1L, 1.0), (1L, 2L, 100.0),
      (1L, 3L, 2.0), (1L, 4L, 3.0))
      .toDF("user_id", "ts_us", "value")
    val out = TimeSeriesOps.rollMedian(df, 3, RollAlign.Right,
      key = "user_id", ts = "ts_us", value = "value")
      .orderBy("ts_us").collect().map(_.getAs[Double]("value"))
    out shouldBe Array(5.0, 2.0, 3.0) // medians of (5,1,100),(1,100,2),(100,2,3)
  }

  test("crossCorrelation detects a known lead") {
    val s = spark
    import s.implicits._
    // y leads: y(t) = x(t+1) would mean x anticipates y at lag 1; build
    // x random-ish, y(t) = x(t-1) so corr(x_t, y_{t+1}) = 1
    val x = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0)
    val rows = x.indices.map { i =>
      (1L, i.toLong, x(i), if (i >= 1) x(i - 1) else Double.NaN)
    }
    val df = rows.toDF("user_id", "ts_us", "x", "y")
      .withColumn("y", when(isnan(col("y")), lit(null)).otherwise(col("y")))
    val out = TimeSeriesOps.crossCorrelation(df, 2,
      key = "user_id", ts = "ts_us", x = "x", y = "y").collect().head
    out.getAs[Double]("ccf_1") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("ccf_0") should be < 0.9
  }

  test("theilSen ignores a gross outlier that wrecks OLS") {
    val s = spark
    import s.implicits._
    // y = 2x + 1 with one wild outlier
    val df = (0 until 21).map { i =>
      val v = if (i == 10) 1000.0 else 2.0 * i + 1.0
      (1L, i.toLong, v)
    }.toDF("user_id", "ts_us", "value")
    val row = RobustRegression.theilSen(df,
      key = "user_id", ts = "ts_us", value = "value").collect().head
    row.getAs[Long]("n") shouldBe 21L
    row.getAs[Double]("slope") shouldBe 2.0 +- 1e-9
    row.getAs[Double]("intercept") shouldBe 1.0 +- 1e-9
  }

  test("gopherFilter keeps a normal doc and drops degenerate ones") {
    val s = spark
    import s.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far away home"
    val tooShort = "tiny doc"
    val repeated = ("spam " * 20).trim // dup ratio 19/20, no stopwords
    val df = Seq((1L, good), (2L, tooShort), (3L, repeated))
      .toDF("doc_id", "text")
    val out = TextFunctions.gopherFilter(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    out shouldBe Map(1L -> 1, 2L -> 0, 3L -> 0)
  }

  test("topKBigrams counts overlapping bigrams with deterministic ties") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    val out = TextFunctions.topKBigrams(df, 10, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    out.head shouldBe ("a b" -> 3L)
    out.toMap shouldBe Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L)
    // single-token doc contributes nothing; ordering: count desc then bigram
    out.map(_._1) shouldBe Array("a b", "b a", "b c")
  }
}
