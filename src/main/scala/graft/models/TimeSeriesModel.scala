package graft.models

/**
 * Uniform interface of all fitted series models (capability of reference
 * models/TimeSeriesModel.scala:23-45, re-expressed over plain arrays).
 *
 * `removeTimeDependentEffects` maps an observed series to the i.i.d.-ish
 * residual/driver series implied by the model; `addTimeDependentEffects` is
 * its exact inverse (add ∘ remove = identity).
 */
trait TimeSeriesModel extends Serializable {
  def removeTimeDependentEffects(ts: Array[Double]): Array[Double]
  def addTimeDependentEffects(ts: Array[Double]): Array[Double]
}

/**
 * A model that can filter an i.i.d. innovation series into a series with
 * this model's time-dependent characteristics, writing into a caller-owned
 * buffer (API parity with reference TimeSeries.scala:461-470, where the
 * trait is declared but has no implementor; here every TimeSeriesModel
 * whose addTimeDependentEffects is the i.i.d.→model map implements it).
 * `dest` may alias `ts`; the filtered array is returned.
 */
trait TimeSeriesFilter extends Serializable { self: TimeSeriesModel =>
  def filter(ts: Array[Double], dest: Array[Double]): Array[Double] = {
    val out = addTimeDependentEffects(ts)
    System.arraycopy(out, 0, dest, 0, out.length)
    dest
  }
}
