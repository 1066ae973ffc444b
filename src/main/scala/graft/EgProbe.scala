package graft

import graft.models._
import org.apache.commons.math3.random.MersenneTwister

/** Dev probe: EGARCH recovery quality across seeds (tolerance calibration). */
object EgProbe {
  def main(args: Array[String]): Unit = {
    for (seed <- Seq(101L, 202L, 303L)) {
      val truth = EGARCHModel(omega = -0.2, alpha = 0.25, gamma = -0.15, beta = 0.9)
      val ts = truth.sample(8000, new MersenneTwister(seed))
      val t0 = System.nanoTime()
      val m = EGARCH.fitModel(ts)
      val ms = (System.nanoTime() - t0) / 1e6
      val llT = truth.logLikelihood(ts); val llF = m.logLikelihood(ts)
      println(f"seed $seed: w=${m.omega}%.4f a=${m.alpha}%.4f g=${m.gamma}%.4f b=${m.beta}%.4f  llF-llT=${llF - llT}%.3f  (${ms}%.0f ms)")
      val rt = m.addTimeDependentEffects(m.removeTimeDependentEffects(ts))
      val maxErr = rt.zip(ts).map { case (a, b) => math.abs(a - b) }.max
      println(f"  roundtrip maxErr $maxErr%.2e")
    }
  }
}
