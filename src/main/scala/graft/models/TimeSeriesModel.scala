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
