package graft.stats

import org.apache.commons.math3.random.MersenneTwister
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StatTestsSpec extends AnyFunSuite with Matchers {

  private def whiteNoise(n: Int, seed: Long): Array[Double] = {
    val r = new MersenneTwister(seed)
    Array.fill(n)(r.nextGaussian())
  }

  private def randomWalk(n: Int, seed: Long): Array[Double] = {
    val r = new MersenneTwister(seed)
    var s = 0.0
    Array.fill(n) { s += r.nextGaussian(); s }
  }

  test("ADF rejects unit root for stationary noise, not for a random walk") {
    val (statNoise, pNoise) = StatTests.adf(whiteNoise(500, 1L))
    val (statWalk, pWalk) = StatTests.adf(randomWalk(500, 1L))
    pNoise should be < 0.05 // stationary: unit root rejected
    pWalk should be > 0.05 // random walk: cannot reject
    statNoise should be < statWalk
  }

  test("KPSS accepts stationarity for noise, rejects for a random walk") {
    val (statNoise, pNoise) = StatTests.kpss(whiteNoise(500, 2L))
    val (statWalk, pWalk) = StatTests.kpss(randomWalk(500, 2L))
    statNoise should be < 0.463 // 5% critical value, level stationarity
    statWalk should be > 0.463
    pNoise should be > pWalk
    StatTests.kpssLevelStationary(whiteNoise(500, 2L), 0.05) shouldBe true
    StatTests.kpssLevelStationary(randomWalk(500, 2L), 0.05) shouldBe false
  }

  test("Durbin-Watson near 2 for white noise, near 0 for persistent series") {
    StatTests.durbinWatson(whiteNoise(2000, 3L)) shouldBe 2.0 +- 0.15
    val r = new MersenneTwister(3L)
    var u = 0.0
    val persistent = Array.fill(2000) { u = 0.95 * u + r.nextGaussian() * 0.1; u }
    StatTests.durbinWatson(persistent) should be < 0.5
  }

  test("Ljung-Box detects autocorrelation") {
    val (_, pNoise) = StatTests.ljungBox(whiteNoise(1000, 4L), 10)
    pNoise should be > 0.05
    val r = new MersenneTwister(4L)
    var u = 0.0
    val ar = Array.fill(1000) { u = 0.6 * u + r.nextGaussian(); u }
    val (_, pAr) = StatTests.ljungBox(ar, 10)
    pAr should be < 0.01
  }

  test("Breusch-Godfrey flags serially correlated regression errors") {
    val r = new MersenneTwister(5L)
    val n = 1000
    val x = Array.fill(n)(Array(r.nextGaussian()))
    var u = 0.0
    val y = Array.tabulate(n) { i =>
      u = 0.7 * u + r.nextGaussian() * 0.3
      1.0 + 2.0 * x(i)(0) + u
    }
    val (_, p) = StatTests.breuschGodfrey(y, x, 2)
    p should be < 0.01
    // clean errors: should not reject
    val yClean = Array.tabulate(n)(i => 1.0 + 2.0 * x(i)(0) + r.nextGaussian())
    val (_, pClean) = StatTests.breuschGodfrey(yClean, x, 2)
    pClean should be > 0.05
  }

  test("Breusch-Pagan flags heteroskedastic errors") {
    val r = new MersenneTwister(6L)
    val n = 1000
    val x = Array.fill(n)(Array(r.nextGaussian() + 3.0))
    val yHet = Array.tabulate(n)(i => 1.0 + 2.0 * x(i)(0) +
      r.nextGaussian() * math.abs(x(i)(0)))
    val (_, pHet) = StatTests.breuschPagan(yHet, x)
    pHet should be < 0.01
    val yHom = Array.tabulate(n)(i => 1.0 + 2.0 * x(i)(0) + r.nextGaussian())
    val (_, pHom) = StatTests.breuschPagan(yHom, x)
    pHom should be > 0.05
  }
}
