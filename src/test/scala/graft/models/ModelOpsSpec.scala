package graft.models

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** DataFrame lifts of the model kernels: the round-2 surfaces
  * (EWMA transform/forecast, HW forecast, serial-correlation tests). */
class ModelOpsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def obs(vals: Seq[Double], key: String = "a") = {
    val s = spark
    import s.implicits._
    vals.zipWithIndex.map { case (v, i) => (key, i.toLong, v) }
      .toDF("key", "ts_nanos", "value")
  }

  test("ewmaSmoothed matches the batch EWMA kernel per row") {
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 5.0)
    val out = ModelOps.ewmaSmoothed(obs(vals), alpha = 0.3)
      .collect().sortBy(_.ts).map(_.smoothed)
    val expect = EWMAModel(0.3).addTimeDependentEffects(vals.toArray)
    out.zip(expect).foreach { case (a, b) => a shouldBe b }
  }

  test("forecastEwma is flat at the last smoothed level") {
    val vals = Seq.tabulate(40)(i => 10.0 + math.sin(i * 0.7))
    val fc = ModelOps.forecastEwma(obs(vals), h = 4).collect().sortBy(_.step)
    fc.length shouldBe 4
    fc.map(_.value).distinct.length shouldBe 1 // SES forecast is constant
    fc.map(_.ts) shouldBe Array(40L, 41L, 42L, 43L)
  }

  test("forecastHoltWinters produces h extrapolated steps per key") {
    val vals = Seq.tabulate(36)(i => 100.0 + 10 * math.sin(i * math.Pi / 6) + i)
    val fc = ModelOps.forecastHoltWinters(obs(vals), period = 12, h = 6)
      .collect().sortBy(_.step)
    fc.length shouldBe 6
    // trending series: forecasts continue above the last level
    fc.last.value should be > vals.max - 20
  }

  test("durbinWatsonAll matches the scalar statistic") {
    val vals = Seq(1.0, -1.0, 1.0, -1.0, 1.0) // perfectly alternating -> dw near 4
    val dw = ModelOps.durbinWatsonAll(obs(vals)).collect()(0).dw
    dw shouldBe graft.stats.StatTests.durbinWatson(vals.toArray)
    dw should be > 3.0
  }

  test("breuschGodfrey/breuschPagan lifts return one row per key") {
    val rnd = new scala.util.Random(9)
    val vals = Seq.tabulate(60)(i => 5.0 + 0.1 * i + rnd.nextGaussian())
    val bg = ModelOps.breuschGodfreyAll(obs(vals), lags = 2).collect()
    bg.length shouldBe 1
    bg(0).pValue should (be >= 0.0 and be <= 1.0)
    val bp = ModelOps.breuschPaganAll(obs(vals)).collect()
    bp.length shouldBe 1
    bp(0).pValue should (be >= 0.0 and be <= 1.0)
  }
}
