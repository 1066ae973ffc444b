package graft.models

/**
 * Spark-free univariate array utilities shared by the model kernels
 * (capabilities of reference UnivariateTimeSeries.scala / Lag.scala,
 * re-implemented).
 */
object ArrayOps {

  /** x_t - x_{t-lag}, keeping the first `lag` elements as-is (size-preserving
    * differencing, invertible — reference differencesAtLag semantics,
    * UnivariateTimeSeries.scala:384-412). */
  def diffAtLag(x: Array[Double], lag: Int): Array[Double] = {
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = if (i < lag) x(i) else x(i) - x(i - lag)
      i += 1
    }
    out
  }

  /** Exact inverse of [[diffAtLag]] (cumulative reconstruction). */
  def inverseDiffAtLag(y: Array[Double], lag: Int): Array[Double] = {
    val out = new Array[Double](y.length)
    var i = 0
    while (i < y.length) {
      out(i) = if (i < lag) y(i) else y(i) + out(i - lag)
      i += 1
    }
    out
  }

  /** Order-d differencing at lag 1 (size-preserving: first d entries carry the
    * information needed for exact inversion). */
  def diffOfOrder(x: Array[Double], d: Int): Array[Double] = {
    var cur = x
    var i = 0
    while (i < d) { cur = diffAtLagFrom(cur, 1, i); i += 1 }
    cur
  }

  /** Inverse of [[diffOfOrder]]. */
  def inverseDiffOfOrder(y: Array[Double], d: Int): Array[Double] = {
    var cur = y
    var i = d - 1
    while (i >= 0) { cur = inverseDiffAtLagFrom(cur, 1, i); i -= 1 }
    cur
  }

  /** Differencing that leaves the first `start` entries untouched and
    * differences from `start + lag` on (supports stacked order-d passes). */
  def diffAtLagFrom(x: Array[Double], lag: Int, start: Int): Array[Double] = {
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = if (i < start + lag) x(i) else x(i) - x(i - lag)
      i += 1
    }
    out
  }

  def inverseDiffAtLagFrom(y: Array[Double], lag: Int, start: Int): Array[Double] = {
    val out = new Array[Double](y.length)
    var i = 0
    while (i < y.length) {
      out(i) = if (i < start + lag) y(i) else y(i) + out(i - lag)
      i += 1
    }
    out
  }

  /** Trimmed lag matrix: row t (for t in [maxLag, n)) holds
    * [x(t-1), ..., x(t-maxLag)] — the regressor block for AR-style OLS
    * (capability of reference Lag.lagMatTrimBoth, Lag.scala:25-129). */
  def lagMatrix(x: Array[Double], maxLag: Int): Array[Array[Double]] = {
    val n = x.length - maxLag
    val out = Array.ofDim[Double](n, maxLag)
    var t = 0
    while (t < n) {
      var j = 0
      while (j < maxLag) { out(t)(j) = x(t + maxLag - 1 - j); j += 1 }
      t += 1
    }
    out
  }

  def mean(x: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i); i += 1 }
    s / x.length
  }

  def variance(x: Array[Double]): Double = {
    val m = mean(x)
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - m; s += d * d; i += 1 }
    s / (x.length - 1)
  }

  /** Sample autocorrelation function for lags 1..maxLag (textbook ACF with the
    * global mean and variance denominator — reference autocorr semantics,
    * UnivariateTimeSeries.scala:70-96). */
  def acf(x: Array[Double], maxLag: Int): Array[Double] = {
    val n = x.length
    val m = mean(x)
    var c0 = 0.0
    var i = 0
    while (i < n) { val d = x(i) - m; c0 += d * d; i += 1 }
    val out = new Array[Double](maxLag)
    var k = 1
    while (k <= maxLag) {
      var ck = 0.0
      var t = k
      while (t < n) { ck += (x(t) - m) * (x(t - k) - m); t += 1 }
      out(k - 1) = ck / c0
      k += 1
    }
    out
  }

  def sse(x: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    s
  }

  /**
   * Natural-cubic-spline fill over the non-NaN knots; only positions inside
   * the knot range are interpolated (reference fillSpline semantics,
   * UnivariateTimeSeries.scala:292-321 — whole-series kernel, used through
   * TimeSeriesOps.mapSeries since splines need global knots).
   */
  def fillSpline(x: Array[Double]): Array[Double] = {
    val knots = x.zipWithIndex.filter(!_._1.isNaN)
    if (knots.length < 3) return x.clone() // spline needs >= 3 knots
    val interp = new org.apache.commons.math3.analysis.interpolation.SplineInterpolator()
    val f = interp.interpolate(knots.map(_._2.toDouble), knots.map(_._1))
    val lo = knots.head._2
    val hi = knots.last._2
    Array.tabulate(x.length) { i =>
      if (!x(i).isNaN) x(i)
      else if (i >= lo && i <= hi) f.value(i.toDouble)
      else x(i)
    }
  }
}
