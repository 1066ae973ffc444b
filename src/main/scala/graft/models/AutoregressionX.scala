package graft.models

import org.apache.commons.math3.stat.regression.OLSMultipleLinearRegression

/**
 * ARX(p, xLag): y_t = c + Σ_{i≤p} α_i y_{t-i} + Σ_cols Σ_{l} β_{k,l} x_{k,t-l} + ε_t
 * with l ranging over 0..xLag when the current regressor value is included,
 * 1..xLag otherwise (capability of reference models/AutoregressionX.scala:
 * 48-130, re-implemented).
 *
 * Coefficient layout: c, α(1..p), then per regressor column k the block
 * β_{k,0..xLag} (or 1..xLag).
 */
case class ARXModel(c: Double, arCoefs: Array[Double], xCoefs: Array[Array[Double]],
    includeCurrentX: Boolean) extends Serializable {
  val p: Int = arCoefs.length

  /** One-step predictions over the trimmed window (t >= max(p, xLag+adj)). */
  def predict(y: Array[Double], x: Array[Array[Double]]): Array[Double] = {
    val xLagCount = if (xCoefs.isEmpty) 0 else xCoefs(0).length
    val firstXLag = if (includeCurrentX) 0 else 1
    val start = math.max(p, xLagCount - 1 + firstXLag)
    val out = new Array[Double](y.length - start)
    var t = start
    while (t < y.length) {
      var v = c
      var i = 0
      while (i < p) { v += arCoefs(i) * y(t - 1 - i); i += 1 }
      var k = 0
      while (k < xCoefs.length) {
        var l = 0
        while (l < xCoefs(k).length) {
          v += xCoefs(k)(l) * x(t - firstXLag - l)(k)
          l += 1
        }
        k += 1
      }
      out(t - start) = v
      t += 1
    }
    out
  }
}

object AutoregressionX {
  /** Least-squares fit of the ARX predictor matrix. */
  def fitModel(y: Array[Double], x: Array[Array[Double]], p: Int, xMaxLag: Int,
      includeCurrentX: Boolean = true, includeIntercept: Boolean = true): ARXModel = {
    val nCols = if (x.isEmpty) 0 else x(0).length
    val firstXLag = if (includeCurrentX) 0 else 1
    val lagsPerCol = xMaxLag + (if (includeCurrentX) 1 else 0)
    val start = math.max(p, xMaxLag + firstXLag)
    val rows = y.length - start
    val yv = new Array[Double](rows)
    val design = Array.ofDim[Double](rows, p + nCols * lagsPerCol)
    var r = 0
    while (r < rows) {
      val t = start + r
      yv(r) = y(t)
      var i = 0
      while (i < p) { design(r)(i) = y(t - 1 - i); i += 1 }
      var k = 0
      while (k < nCols) {
        var l = 0
        while (l < lagsPerCol) {
          design(r)(p + k * lagsPerCol + l) = x(t - firstXLag - l)(k)
          l += 1
        }
        k += 1
      }
      r += 1
    }
    val ols = new OLSMultipleLinearRegression()
    ols.setNoIntercept(!includeIntercept)
    ols.newSampleData(yv, design)
    val params = ols.estimateRegressionParameters()
    val off = if (includeIntercept) 1 else 0
    val c = if (includeIntercept) params(0) else 0.0
    val ar = params.slice(off, off + p)
    val xc = Array.tabulate(nCols)(k =>
      params.slice(off + p + k * lagsPerCol, off + p + (k + 1) * lagsPerCol))
    ARXModel(c, ar, xc, includeCurrentX)
  }
}
