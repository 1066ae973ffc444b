package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.core.IrregularDateTimeIndex
import graft.ts.{TimeSeriesOps => TS}

class IoAndLayoutSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("Yahoo OHLCV reader melts to keyed observations") {
    val path = getClass.getClassLoader.getResource("GOOG.csv").getPath
    val obs = TimeSeriesIO.readYahooCsv(spark, path)
    obs.columns.toSeq shouldBe Seq("key", "ts_nanos", "value")
    val keys = obs.select("key").distinct().collect().map(_.getString(0)).sorted
    keys shouldBe Array("GOOG_AdjClose", "GOOG_Close", "GOOG_High", "GOOG_Low",
      "GOOG_Open", "GOOG_Volume")
    obs.filter(col("key") === "GOOG_Close").count() shouldBe 148 // 149 lines incl. header
    // spot value: the file is reverse-chronological; earliest close is first loc
    val first = TS.findSeries(obs, "GOOG_Close")
    first.head._2 should be > 0.0
    first.map(_._1).toSeq shouldBe first.map(_._1).sorted.toSeq
  }

  test("upsample densifies onto the finer index") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L, 1.0), ("a", 30L, 3.0)).toDF("key", "ts_nanos", "value")
    val dense = IrregularDateTimeIndex(Array(10L, 20L, 30L))
    val up = TS.upsample(df, dense, fillMethod = Some("linear"))
    up.count() shouldBe 3
    up.filter(col("ts_nanos") === 20L).collect()(0).getAs[Double]("value") shouldBe 2.0
  }

  test("differencesByInterval subtracts the as-of base") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0L, 10.0), ("a", 50L, 15.0), ("a", 100L, 30.0), ("a", 140L, 31.0))
      .toDF("key", "ts_nanos", "value")
    val out = TS.differencesByInterval(df, 100L).orderBy("ts_nanos").collect()
      .map(r => Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue))
    // t=0: no base; t=50: none at <=-50; t=100: base=t0 -> 20; t=140: base=t0..t40? latest at <=40 is t0 -> 21
    out.toSeq shouldBe Seq(None, None, Some(20.0), Some(21.0))
  }

  test("spline fill interpolates interior NaNs on the series layout") {
    val s = spark
    import s.implicits._
    // x^2 at knots 0,1,2,4 — natural cubic spline through them recovers ~x^2 at 3
    val df = Seq(("a", Seq(0.0, 1.0, 4.0, Double.NaN, 16.0, Double.NaN)))
      .toDF("key", "series")
    val out = TS.fillSpline(df).collect()(0).getAs[scala.collection.Seq[Double]]("series")
    out(3) shouldBe 9.0 +- 1.5
    out(5).isNaN shouldBe true // outside knot range stays NaN
    // kernel-level check too
    val filled = graft.models.ArrayOps.fillSpline(Array(0.0, 1.0, 4.0, Double.NaN, 16.0))
    filled(3) shouldBe 9.0 +- 1.5
  }

  test("filterStartingBefore / filterEndingAfter keep covering series") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L, 1.0), ("a", 50L, 2.0), ("b", 30L, 3.0), ("b", 40L, 4.0))
      .toDF("key", "ts_nanos", "value")
    TS.filterStartingBefore(df, 20L).select("key").distinct()
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a")
    TS.filterEndingAfter(df, 45L).select("key").distinct()
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a")
  }

  test("mapSeries applies a whole-series kernel per key") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Seq(1.0, 2.0, 3.0))).toDF("key", "series")
    val out = TS.mapSeries(df, v => v.map(_ * 2))
      .collect()(0).getAs[scala.collection.Seq[Double]]("series")
    out.toSeq shouldBe Seq(2.0, 4.0, 6.0)
  }

  test("mapSeriesWithKey exposes the key to the kernel") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Seq(1.0, 2.0)), ("b", Seq(1.0, 2.0))).toDF("key", "series")
    val scale = Map("a" -> 10.0, "b" -> 100.0)
    val out = TS.mapSeriesWithKey(df, (k, v) => v.map(_ * scale(k)))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("series").toSeq).toMap
    out("a") shouldBe Seq(10.0, 20.0)
    out("b") shouldBe Seq(100.0, 200.0)
  }

  test("unionSeries takes the first non-missing value in frame order") {
    val s = spark
    import s.implicits._
    val a = Seq(("k", 1L, 10.0), ("k", 2L, Double.NaN)).toDF("key", "ts_nanos", "value")
    val b = Seq(("k", 1L, 99.0), ("k", 2L, 20.0), ("k", 3L, 30.0))
      .toDF("key", "ts_nanos", "value")
    val out = TS.unionSeries(Seq(a, b))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out shouldBe Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)
  }

  test("collectAsTimeSeries gathers the panel sorted by key") {
    val s = spark
    import s.implicits._
    val df = Seq(("b", Seq(3.0, 4.0)), ("a", Seq(1.0, 2.0))).toDF("key", "series")
    val (keys, mat) = TS.collectAsTimeSeries(df)
    keys.toSeq shouldBe Seq("a", "b")
    mat.map(_.toSeq).toSeq shouldBe Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
  }

  test("instants layout exports to MLlib matrices") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L, 1.0), ("b", 10L, 2.0), ("a", 20L, 3.0), ("b", 20L, 4.0))
      .toDF("key", "ts_nanos", "value")
    val idx = IrregularDateTimeIndex(Array(10L, 20L))
    val instants = TS.toInstants(df, Seq("a", "b"))
    val rm = TS.toRowMatrix(instants)
    rm.numRows() shouldBe 2
    rm.numCols() shouldBe 2
    val irm = TS.toIndexedRowMatrix(instants, idx)
    irm.rows.collect().map(_.index).sorted.toSeq shouldBe Seq(0L, 1L)
  }
}
