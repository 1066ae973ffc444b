package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sim.SemDedup
import graft.text.TextFunctions

/** Round-9 operators: SemDeDup semantic dedup, Fightin'-Words log-odds,
  * temperature mixture weights. */
class Round9Spec extends AnyFunSuite with Matchers with SparkTestSession {

  private def vecs = {
    import spark.implicits._
    // two tight semantic groups + one loner; within-group cosine > 0.99,
    // cross-group cosine ~ 0
    Seq(
      (0L, Array(1.0, 0.01, 0.0)), (1L, Array(1.0, 0.02, 0.0)),
      (2L, Array(0.99, 0.0, 0.01)),
      (10L, Array(0.0, 1.0, 0.01)), (11L, Array(0.01, 1.0, 0.0)),
      (20L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
  }

  test("semanticDuplicates finds exactly the within-group pairs") {
    // k=2 under-segments (groups merge, never split) so coverage of every
    // true pair is guaranteed; the threshold filter removes merged-cluster
    // cross pairs — emitted set must be exactly the true dup pairs
    val pairs = SemDedup.semanticDuplicates(vecs, k = 2, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L))
  }

  test("semanticDuplicates cosines are exact and ordered") {
    val rows = SemDedup.semanticDuplicates(vecs, k = 2, threshold = 0.95).collect()
    all(rows.map(_.getAs[Double]("cosine"))) should be >= 0.95
    all(rows.map(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))) shouldBe true
  }

  test("semanticKeepers keeps the min id of each semantic group") {
    val kept = SemDedup.semanticKeepers(vecs, k = 2, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(0L, 10L, 20L)
  }

  test("logOddsKeywords surfaces the distinguishing token per stratum") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "apple apple apple banana"), ("s1", "apple banana"),
      ("s2", "cherry cherry banana"), ("s2", "cherry banana")
    ).toDF("source", "text")
    val bySrc = TextFunctions.logOddsKeywords(docs, topK = 1).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[String]("token"), r.getAs[Double]("log_odds_z")))).toMap
    bySrc("s1")._1 shouldBe "apple"
    bySrc("s2")._1 shouldBe "cherry"
    bySrc("s1")._2 should be > 0.0
    bySrc("s2")._2 should be > 0.0
  }

  test("codeDetect separates code from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "void main() { int x = 0; return x; }"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (3L, "import os; def f(x): return x = [1]")
    ).toDF("doc_id", "text")
    val rows = TextFunctions.codeDetect(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_code")).toMap
    rows(1L) shouldBe true
    rows(2L) shouldBe false
    rows(3L) shouldBe true
    val r1 = TextFunctions.codeDetect(docs).filter($"doc_id" === 1L).head()
    r1.getAs[Long]("n_code_symbols") shouldBe 7L // ( ) { = ; ; }
    r1.getAs[Long]("keyword_hits") shouldBe 2L // "void ", "return "
  }

  test("featureHashEmbedding is unit-norm and feeds SemDeDup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"), (2L, "alpha beta gamma alpha"),
      (3L, "delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val emb = TextFunctions.featureHashEmbedding(docs, dim = 16)
    val norms = emb.select(
      aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x)).collect()
    all(norms.map(_.getDouble(0))) shouldBe 1.0 +- 1e-9
    // identical docs hash to identical vectors -> SemDeDup finds the pair
    val pairs = SemDedup.semanticDuplicates(emb, k = 2, threshold = 0.99,
        idCol = "doc_id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs shouldBe Array((1L, 2L))
  }

  test("periodogram finds the planted period") {
    import spark.implicits._
    // pure sinusoid of period 8 over n=64 points -> all power at k = 64/8
    val rows = (0 until 64).map(t =>
      ("s", t.toLong, math.sin(2 * math.Pi * t / 8.0)))
    val df = rows.toDF("key", "ts_nanos", "value")
    val dom = graft.ts.TimeSeriesOps.dominantPeriod(df, maxK = 16).head()
    dom.getAs[Long]("dominant_k") shouldBe 8L
    dom.getAs[Double]("dominant_period") shouldBe 8.0 +- 1e-9
    // unit tone at a Fourier frequency: I(k) = (C^2+S^2)/n = n*A^2/4 = 16
    dom.getAs[Double]("power") shouldBe 16.0 +- 1e-9
    val total = graft.ts.TimeSeriesOps.periodogram(df, maxK = 16)
      .agg(sum(col("power"))).head().getDouble(0)
    total shouldBe 16.0 +- 1e-6 // all other bins ~ zero
  }

  test("varFit recovers planted VAR(1) coefficients") {
    import spark.implicits._
    // x_t = 1 + 0.5 x_{t-1} + 0.2 y_{t-1} + e; y_t = 2 + 0.1 x + 0.6 y + e
    val rnd = new scala.util.Random(7)
    var xv = 2.0; var yv = 5.0
    val rows = (0 until 4000).map { t =>
      val nx = 1.0 + 0.5 * xv + 0.2 * yv + rnd.nextGaussian() * 0.1
      val ny = 2.0 + 0.1 * xv + 0.6 * yv + rnd.nextGaussian() * 0.1
      xv = nx; yv = ny
      ("s", t.toLong, xv, yv)
    }
    val fit = graft.ts.TimeSeriesOps.varFit(
      rows.toDF("key", "ts_nanos", "x", "y")).head()
    fit.getAs[Double]("a11") shouldBe 0.5 +- 0.05
    fit.getAs[Double]("a12") shouldBe 0.2 +- 0.05
    fit.getAs[Double]("a21") shouldBe 0.1 +- 0.05
    fit.getAs[Double]("a22") shouldBe 0.6 +- 0.05
    fit.getAs[Double]("c1") shouldBe 1.0 +- 0.3
    fit.getAs[Double]("c2") shouldBe 2.0 +- 0.3
  }

  test("forecastAccuracy matches closed-form MAE/RMSE/MASE") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0, 11.0), ("a", 2L, 12.0, 11.0),
      ("a", 3L, 11.0, 12.0), ("a", 4L, 13.0, 12.0)
    ).toDF("key", "ts_nanos", "actual", "predicted")
    val r = graft.ts.TimeSeriesOps.forecastAccuracy(df).head()
    r.getAs[Long]("n_obs") shouldBe 4L
    r.getAs[Double]("mae") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("rmse") shouldBe 1.0 +- 1e-12
    // naive in-sample errors |12-10|,|11-12|,|13-11| -> mean 5/3; mase 0.6
    r.getAs[Double]("mase") shouldBe 0.6 +- 1e-12
    r.getAs[Double]("mape") shouldBe
      ((0.1 + 1.0 / 12 + 1.0 / 11 + 1.0 / 13) / 4) +- 1e-12
  }

  test("snapshotDiff classifies added/removed/edited/unchanged") {
    import spark.implicits._
    val oldv = Seq((1L, "s", "alpha beta"), (2L, "s", "gamma delta"),
      (3L, "s", "keep me")).toDF("doc_id", "source", "text")
    val newv = Seq((2L, "s", "gamma CHANGED"), (3L, "s", "Keep,  me!"),
      (4L, "s", "brand new")).toDF("doc_id", "source", "text")
    val counts = TextFunctions.snapshotDiff(oldv, newv).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    counts("removed") shouldBe 1L // id 1
    counts("edited") shouldBe 1L // id 2
    // id 3: canonical fingerprint ignores case/punct/spacing -> unchanged
    counts("unchanged") shouldBe 1L
    counts("added") shouldBe 1L // id 4
  }

  test("temperatureMix matches the closed-form alpha=0.5 shares") {
    import spark.implicits._
    // 9 tokens vs 1 token: p = .9/.1; q = sqrt(p)/sum = exactly .75/.25
    val docs = Seq(
      ("a", "t t t t t t t t t"), ("b", "u")
    ).toDF("source", "text")
    val rows = TextFunctions.temperatureMix(docs, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("p_natural"), r.getAs[Double]("p_temperature"),
          r.getAs[Double]("sampling_factor")))).toMap
    rows("a")._1 shouldBe 0.9 +- 1e-9
    rows("a")._2 shouldBe 0.75 +- 1e-9
    rows("a")._3 shouldBe 0.833333 +- 1e-6
    rows("b")._1 shouldBe 0.1 +- 1e-9
    rows("b")._2 shouldBe 0.25 +- 1e-9
    rows("b")._3 shouldBe 2.5 +- 1e-9
  }
}
