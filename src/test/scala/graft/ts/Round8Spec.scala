package graft.ts

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Specs for the round-6 two-series econometrics operators: PACF,
  * Engle-Granger cointegration, Granger causality, rolling correlation. */
class Round8Spec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Reference Durbin-Levinson PACF from the sample ACF (same estimator the
    * relational operator unrolls into column algebra). */
  private def pacfRef(xs: Array[Double], maxLag: Int): Array[Double] = {
    val n = xs.length
    val mu = xs.sum / n
    val e = xs.map(_ - mu)
    val c0 = e.map(v => v * v).sum
    val r = (1 to maxLag).map { k =>
      (k until n).map(t => e(t) * e(t - k)).sum / c0
    }.toArray
    var phiPrev = Vector.empty[Double]
    val out = Array.ofDim[Double](maxLag)
    for (k <- 1 to maxLag) {
      val num = if (k == 1) r(0)
        else r(k - 1) - phiPrev.zipWithIndex.map { case (p, j) => p * r(k - 2 - j) }.sum
      val den = if (k == 1) 1.0
        else 1.0 - phiPrev.zipWithIndex.map { case (p, j) => p * r(j) }.sum
      val pkk = num / den
      out(k - 1) = pkk
      phiPrev = phiPrev.zipWithIndex.map { case (p, j) =>
        p - pkk * phiPrev(k - 2 - j)
      } :+ pkk
    }
    out
  }

  private def seeded(n: Int): Array[Double] = {
    val rnd = new scala.util.Random(42)
    val xs = Array.ofDim[Double](n)
    xs(0) = rnd.nextGaussian()
    for (t <- 1 until n) xs(t) = 0.7 * xs(t - 1) + rnd.nextGaussian()
    xs
  }

  test("pacf matches the scalar Durbin-Levinson recursion") {
    val s = spark
    import s.implicits._
    val xs = seeded(200)
    val df = xs.zipWithIndex.map { case (v, t) => ("a", t.toLong, v) }
      .toSeq.toDF("key", "ts_nanos", "value")
    val row = TimeSeriesOps.pacf(df, 3).collect().head
    val expect = pacfRef(xs, 3)
    row.getDouble(1) shouldBe (expect(0) +- 1e-9)
    row.getDouble(2) shouldBe (expect(1) +- 1e-9)
    row.getDouble(3) shouldBe (expect(2) +- 1e-9)
    // AR(1) signature: pacf_1 large, pacf_2/3 near zero
    math.abs(row.getDouble(1)) should be > 0.5
    math.abs(row.getDouble(2)) should be < 0.2
  }

  test("cointegrationEG separates a cointegrated pair from independent walks") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val n = 300
    val x = Array.ofDim[Double](n)
    for (t <- 1 until n) x(t) = x(t - 1) + rnd.nextGaussian()
    // coint: y = 2x + stationary AR(0.3) residual; indep: its own walk
    val resid = Array.ofDim[Double](n)
    for (t <- 1 until n) resid(t) = 0.3 * resid(t - 1) + rnd.nextGaussian()
    val walk2 = Array.ofDim[Double](n)
    for (t <- 1 until n) walk2(t) = walk2(t - 1) + rnd.nextGaussian()
    val rows = (0 until n).flatMap { t =>
      Seq(("coint", t.toLong, 2.0 * x(t) + resid(t), x(t)),
        ("indep", t.toLong, walk2(t), x(t)))
    }
    val df = rows.toDF("key", "ts_nanos", "y", "x")
    val out = TimeSeriesOps.cointegrationEG(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("coint") should be < -5.0 // strongly rejects the unit-root null
    out("coint") should be < out("indep")
  }

  test("grangerF flags the lagged driver and not an unrelated series") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val n = 300
    val x = Array.fill(n)(rnd.nextGaussian())
    val noise = Array.fill(n)(0.1 * rnd.nextGaussian())
    val unrelated = Array.fill(n)(rnd.nextGaussian())
    // y is driven by x_{t-1}; z ignores x entirely
    val y = Array.ofDim[Double](n)
    for (t <- 1 until n) y(t) = 0.9 * x(t - 1) + noise(t)
    val rows = (0 until n).flatMap { t =>
      Seq(("driven", t.toLong, y(t), x(t)),
        ("null", t.toLong, unrelated(t), x(t)))
    }
    val df = rows.toDF("key", "ts_nanos", "y", "x")
    val out = TimeSeriesOps.grangerF(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("driven") should be > 100.0
    out("null") should be < 10.0
  }

  test("rollCorr emits full windows only and 1.0 for a linear pair") {
    val s = spark
    import s.implicits._
    val df = (0 until 20).map { t =>
      ("a", t.toLong, t.toDouble, 3.0 * t + 1.0)
    }.toDF("key", "ts_nanos", "x", "y")
    val out = TimeSeriesOps.rollCorr(df, 7).collect()
    out.length shouldBe 14 // 20 - 6 partial windows
    all(out.map(_.getAs[Double]("roll_corr"))) shouldBe (1.0 +- 1e-9)
  }
}
