package graft.stats

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, NormalDistribution}
import org.apache.commons.math3.stat.regression.OLSMultipleLinearRegression

import graft.models.ArrayOps

/**
 * Stationarity / serial-correlation / heteroskedasticity tests
 * (capability of reference stats/TimeSeriesStatisticalTests.scala, all 432
 * lines, re-implemented from the standard published formulations; critical
 * value tables are the published MacKinnon / KPSS constants).
 *
 * Every test returns (statistic, pValue) like the reference's pairs.
 */
object StatTests {

  // ---------------------------------------------------------------- helpers

  private def olsResiduals(y: Array[Double], x: Array[Array[Double]],
      intercept: Boolean = true): (Array[Double], Array[Double]) = {
    val ols = new OLSMultipleLinearRegression()
    ols.setNoIntercept(!intercept)
    ols.newSampleData(y, x)
    (ols.estimateResiduals(), ols.estimateRegressionParameters())
  }

  private def rSquared(y: Array[Double], resid: Array[Double]): Double = {
    val my = ArrayOps.mean(y)
    var tss = 0.0; var rss = 0.0
    var i = 0
    while (i < y.length) {
      val d = y(i) - my
      tss += d * d
      rss += resid(i) * resid(i)
      i += 1
    }
    1.0 - rss / tss
  }

  // ---------------------------------------------------------------- ADF

  /**
   * Augmented Dickey-Fuller unit-root test.
   * Regression of Δy_t on y_{t-1} (+ Δy lags + deterministic terms per
   * `regression`: "nc" none, "c" constant, "ct" constant+trend); statistic is
   * the t-ratio on y_{t-1}. p-value from the published MacKinnon (1994)
   * response-surface approximation.
   */
  def adf(y: Array[Double], maxLag: Int = -1, regression: String = "c"): (Double, Double) = {
    val n = y.length
    val lag = if (maxLag >= 0) maxLag else math.ceil(12.0 * math.pow(n / 100.0, 0.25)).toInt
    val dy = Array.tabulate(n - 1)(i => y(i + 1) - y(i))
    val start = lag
    val rows = dy.length - start
    val nDet = regression match {
      case "nc" => 0; case "c" => 1; case "ct" => 2
      case other => throw new IllegalArgumentException(s"bad regression: $other")
    }
    val ycol = new Array[Double](rows)
    val x = Array.ofDim[Double](rows, 1 + lag + (if (nDet == 2) 1 else 0))
    var r = 0
    while (r < rows) {
      val t = start + r // index into dy
      ycol(r) = dy(t)
      x(r)(0) = y(t) // y_{t-1} relative to dy(t) = y(t+1)-y(t)
      var j = 0
      while (j < lag) { x(r)(1 + j) = dy(t - 1 - j); j += 1 }
      if (nDet == 2) x(r)(1 + lag) = (t + 1).toDouble
      r += 1
    }
    val ols = new OLSMultipleLinearRegression()
    ols.setNoIntercept(nDet == 0)
    ols.newSampleData(ycol, x)
    val params = ols.estimateRegressionParameters()
    val se = ols.estimateRegressionParametersStandardErrors()
    val idx = if (nDet == 0) 0 else 1 // position of the y_{t-1} coefficient
    val tstat = params(idx) / se(idx)
    (tstat, mackinnonP(tstat, regression))
  }

  /**
   * MacKinnon (1994) approximate asymptotic p-value for the ADF t-statistic:
   * Φ applied to a cubic response surface in the statistic (published
   * coefficient tables for N=1).
   */
  private[stats] def mackinnonP(t: Double, regression: String): Double = {
    // published constants (MacKinnon 1994; the same tables statsmodels ships):
    // (tau_star, tau_min, tau_max, smallp quadratic, largep cubic)
    val (star, min, max, smallP, largeP) = regression match {
      case "nc" => (-1.04, -19.04, Double.PositiveInfinity,
        Array(0.6344, 1.2378, 0.032496), Array(0.4797, 0.93557, -0.06999, 0.033066))
      case "c" => (-1.61, -18.83, 2.74,
        Array(2.1659, 1.4412, 0.038269), Array(1.7339, 0.93202, -0.12359, 0.0061654))
      case "ct" => (-2.89, -16.18, 0.7,
        Array(3.2512, 1.6047, 0.049588), Array(2.5261, 0.61654, -0.37956, 0.060285))
      case other => throw new IllegalArgumentException(other)
    }
    if (t > max) 1.0
    else if (t < min) 0.0
    else {
      val poly =
        if (t <= star) smallP(0) + smallP(1) * t + smallP(2) * t * t
        else largeP(0) + largeP(1) * t + largeP(2) * t * t + largeP(3) * t * t * t
      new NormalDistribution().cumulativeProbability(poly)
    }
  }

  // ---------------------------------------------------------------- KPSS

  /** Published KPSS critical values (level stationarity, regression "c"). */
  private val kpssCritC = Seq(0.10 -> 0.347, 0.05 -> 0.463, 0.025 -> 0.574, 0.01 -> 0.739)
  /** trend stationarity ("ct"). */
  private val kpssCritCt = Seq(0.10 -> 0.119, 0.05 -> 0.146, 0.025 -> 0.176, 0.01 -> 0.216)

  /**
   * KPSS stationarity test. Null = stationary. Returns (statistic,
   * approximate p-value by interpolation of the published critical table).
   */
  def kpss(y: Array[Double], regression: String = "c", lags: Int = -1): (Double, Double) = {
    val n = y.length
    val resid: Array[Double] = regression match {
      case "c" =>
        val m = ArrayOps.mean(y)
        y.map(_ - m)
      case "ct" =>
        val x = Array.tabulate(n)(i => Array((i + 1).toDouble))
        olsResiduals(y, x)._1
      case other => throw new IllegalArgumentException(s"bad regression: $other")
    }
    val l = if (lags >= 0) lags else math.ceil(12.0 * math.pow(n / 100.0, 0.25)).toInt
    // Newey-West long-run variance with Bartlett weights
    var s2 = ArrayOps.sse(resid) / n
    var k = 1
    while (k <= l) {
      var g = 0.0
      var t = k
      while (t < n) { g += resid(t) * resid(t - k); t += 1 }
      g /= n
      s2 += 2.0 * (1.0 - k.toDouble / (l + 1)) * g
      k += 1
    }
    // partial sums
    var stat = 0.0
    var cum = 0.0
    var t = 0
    while (t < n) {
      cum += resid(t)
      stat += cum * cum
      t += 1
    }
    stat = stat / (n.toDouble * n * s2)
    val table = if (regression == "c") kpssCritC else kpssCritCt
    // interpolate p from the critical table (clamped to [0.01, 0.10])
    val p =
      if (stat <= table.head._2) 0.10
      else if (stat >= table.last._2) 0.01
      else {
        val seg = table.sliding(2).find(s => stat >= s(0)._2 && stat <= s(1)._2).get
        val ((p0, c0), (p1, c1)) = (seg(0), seg(1))
        p0 + (p1 - p0) * (stat - c0) / (c1 - c0)
      }
    (stat, p)
  }

  /** true iff KPSS fails to reject level stationarity at `alpha`. */
  def kpssLevelStationary(y: Array[Double], alpha: Double): Boolean = {
    val crit = kpssCritC.find(_._1 == alpha).map(_._2).getOrElse(0.463)
    kpss(y, "c")._1 < crit
  }

  // ---------------------------------------------------------------- serial correlation

  /** Durbin-Watson statistic of a residual series (no p-value, like the reference). */
  def durbinWatson(resid: Array[Double]): Double = {
    var num = 0.0
    var t = 1
    while (t < resid.length) {
      val d = resid(t) - resid(t - 1)
      num += d * d
      t += 1
    }
    num / ArrayOps.sse(resid)
  }

  /** Ljung-Box test of no autocorrelation up to `lags`. */
  def ljungBox(resid: Array[Double], lags: Int = 10): (Double, Double) = {
    val n = resid.length
    val rho = ArrayOps.acf(resid, lags)
    var q = 0.0
    var k = 1
    while (k <= lags) {
      q += rho(k - 1) * rho(k - 1) / (n - k)
      k += 1
    }
    q *= n * (n + 2.0)
    val p = 1.0 - new ChiSquaredDistribution(lags).cumulativeProbability(q)
    (q, p)
  }

  /**
   * Breusch-Godfrey test for serial correlation of order `lags` in the
   * residuals of y ~ X: auxiliary regression of residuals on [X, lagged
   * residuals]; statistic = n·R².
   */
  def breuschGodfrey(y: Array[Double], x: Array[Array[Double]], lags: Int): (Double, Double) = {
    val (resid, _) = olsResiduals(y, x)
    val n = resid.length
    val aux = Array.ofDim[Double](n, x(0).length + lags)
    var t = 0
    while (t < n) {
      var j = 0
      while (j < x(0).length) { aux(t)(j) = x(t)(j); j += 1 }
      var k = 0
      while (k < lags) {
        aux(t)(x(0).length + k) = if (t - 1 - k >= 0) resid(t - 1 - k) else 0.0
        k += 1
      }
      t += 1
    }
    val (auxResid, _) = olsResiduals(resid, aux)
    val stat = n * rSquared(resid, auxResid)
    val p = 1.0 - new ChiSquaredDistribution(lags).cumulativeProbability(stat)
    (stat, p)
  }

  /**
   * Mann-Kendall trend test over a time-ordered series: S = Σ_{i<j}
   * sign(x_j − x_i) (integer-exact), Kendall's tau-a = S / (n(n−1)/2),
   * tie-corrected Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 over the
   * tie groups t, and the continuity-corrected normal statistic
   * z = (S ∓ 1)/√Var(S). Runs as a per-series kernel — O(n²) pair loop,
   * fine at the reference's one-series-per-task design point (n² ≈ 10⁶ for
   * the "ten years of minutes" sizing is microseconds of work).
   * Returns (S, nPairs, tau, varS, z).
   */
  def mannKendall(x: Array[Double]): (Long, Long, Double, Double, Double) =
    mannKendall(x, null)

  /** Timestamp-aware variant: pairs with EQUAL timestamps are excluded from
    * both S and n_pairs (they carry no temporal order, and including them
    * would make the result depend on the nondeterministic sort order of
    * tied-timestamp rows). Pass `tss = null` when timestamps are known
    * unique — the two variants then agree. */
  def mannKendall(x: Array[Double], tss: Array[Long]): (Long, Long, Double, Double, Double) = {
    val n = x.length
    var s = 0L
    var nPairs = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (tss == null || tss(j) != tss(i)) {
          nPairs += 1
          val d = x(j) - x(i)
          if (d > 0) s += 1 else if (d < 0) s -= 1
        }
        j += 1
      }
      i += 1
    }
    val tau = if (nPairs > 0) s.toDouble / nPairs else Double.NaN
    // tie groups: counts of equal values
    val ties = x.groupBy(identity).valuesIterator.map(_.length.toLong).filter(_ > 1)
    val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieTerm) / 18.0
    val z =
      if (varS <= 0) 0.0
      else if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS)
      else 0.0
    (s, nPairs, tau, varS, z)
  }

  /**
   * Breusch-Pagan heteroskedasticity test: regression of squared residuals
   * of y ~ X back on X; statistic = n·R².
   */
  def breuschPagan(y: Array[Double], x: Array[Array[Double]]): (Double, Double) = {
    val (resid, _) = olsResiduals(y, x)
    val sq = resid.map(r => r * r)
    val (auxResid, _) = olsResiduals(sq, x)
    val stat = y.length * rSquared(sq, auxResid)
    val df = x(0).length
    val p = 1.0 - new ChiSquaredDistribution(df).cumulativeProbability(stat)
    (stat, p)
  }
}
