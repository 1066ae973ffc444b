package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.sim.Embeddings
import graft.text.TextFunctions
import graft.ts.{RollAlign, TimeSeriesOps}

/** Specs for the round-6 operators: session transitions, winsorize, OLS
  * trend, rolling envelope, unigram-LM scoring, TF-IDF keywords, inertia. */
class Round6Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("transitions counts within-session successor pairs and mean gaps") {
    val s = spark
    import s.implicits._
    // user 1, one session: a(0) -> b(10) -> a(30); second session: b(1000)
    // user 2, one session: a(0) -> b(5)
    val df = Seq(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 30L, "a"), (1L, 1000L, "b"),
      (2L, 0L, "a"), (2L, 5L, "b"))
      .toDF("user_id", "ts_us", "event_type")
    val out = EventOps.transitions(df, gapUs = 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("avg_gap_us")))
      .toMap
    // a->b twice (gaps 10 and 5 -> mean 7.5), b->a once (gap 20);
    // the session break before ts=1000 contributes NO a->b transition
    out shouldBe Map(("a", "b") -> (2L, 7.5), ("b", "a") -> (1L, 20.0))
  }

  test("winsorize clips into the per-key percentile band") {
    val s = spark
    import s.implicits._
    // values 1..5: p25 = 2.0, p75 = 4.0 (linear interpolation)
    val df = (1 to 5).map(i => (1L, i.toLong, i.toDouble))
      .toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.winsorize(df, 0.25, 0.75)
      .orderBy("ts_nanos")
      .select("value_winsorized").as[Double].collect()
    out shouldBe Array(2.0, 2.0, 3.0, 4.0, 4.0)
  }

  test("linearTrend recovers an exact line per key") {
    val s = spark
    import s.implicits._
    // key 1: y = 2x + 1 on positions 0..4; key 2: constant 7 (slope 0)
    val df = ((0 to 4).map(i => (1L, i.toLong, 2.0 * i + 1.0)) ++
      (0 to 3).map(i => (2L, i.toLong, 7.0)))
      .toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.linearTrend(df).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_obs"),
        r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).toMap
    out(1L)._1 shouldBe 5L
    out(1L)._2 shouldBe 2.0 +- 1e-12
    out(1L)._3 shouldBe 1.0 +- 1e-12
    out(2L)._2 shouldBe 0.0 +- 1e-12
    out(2L)._3 shouldBe 7.0 +- 1e-12
  }

  test("rollRange emits full-window min/max/range only") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 1.0), (1L, 3L, 3.0), (1L, 4L, 9.0))
      .toDF("key", "ts_nanos", "value")
    val rows = TimeSeriesOps.rollRange(df, 3, RollAlign.Right)
      .orderBy("ts_nanos").collect()
    rows.length shouldBe 2 // only ts 3 and 4 have full 3-windows
    rows(0).getAs[Double]("roll_min") shouldBe 1.0
    rows(0).getAs[Double]("roll_max") shouldBe 5.0
    rows(0).getAs[Double]("roll_range") shouldBe 4.0
    rows(1).getAs[Double]("roll_min") shouldBe 1.0
    rows(1).getAs[Double]("roll_max") shouldBe 9.0
  }

  test("unigramLogProb scores rare-token docs higher") {
    val s = spark
    import s.implicits._
    // corpus: "a" appears 5x, "b" 2x, "z" 1x; total 8 tokens
    val df = Seq((1L, "a a a b"), (2L, "a a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextFunctions.unigramLogProb(df).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Double]("avg_neg_logprob"))).toMap
    out(1L)._1 shouldBe 4L
    // doc 1: -(3 ln(5/8) + 1 ln(2/8)) / 4
    val exp1 = -(3 * math.log(5.0 / 8) + math.log(2.0 / 8)) / 4
    out(1L)._2 shouldBe (math.rint(exp1 * 1e6) / 1e6) +- 1e-9
    // the all-rare doc scores strictly higher than the common-token docs
    out(3L)._2 should be > out(1L)._2
    out(3L)._2 shouldBe (math.rint(-math.log(1.0 / 8) * 1e6) / 1e6) +- 1e-9
  }

  test("tfidfTopTerms ranks rare-heavy terms first, ties by token") {
    val s = spark
    import s.implicits._
    // 3 docs; "x" only in doc 1 (df=1), "a" in all (df=3 -> idf=0)
    val df = Seq((1L, "a x x"), (2L, "a b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = TextFunctions.tfidfTopTerms(df, 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rnk")) ->
        (r.getString(2), r.getAs[Double]("tfidf"))).toMap
    out((1L, 1L))._1 shouldBe "x" // 2 * ln(3/1)
    out((1L, 1L))._2 shouldBe (math.rint(2 * math.log(3.0) * 1e6) / 1e6) +- 1e-9
    out((1L, 2L))._1 shouldBe "a" // idf 0 -> tfidf 0
    // docs 2 and 3: b (df=2) beats a (idf 0); tie between docs is irrelevant
    out((2L, 1L))._1 shouldBe "b"
    out((3L, 1L))._1 shouldBe "b"
  }

  test("holtSmoothed tracks a perfect linear ramp exactly after warm-up") {
    val s = spark
    import s.implicits._
    // x_t = 2t: hand-unrolled recurrence with alpha=0.5, beta=0.3
    val df = (0 to 4).map(i => (1L, i.toLong, 2.0 * i))
      .toDF("key", "ts_nanos", "value")
    val rows = graft.models.ModelOps.holtSmoothed(df, 0.5, 0.3)
      .collect().sortBy(_.ts)
    rows(0).level shouldBe 0.0
    rows(0).trend shouldBe 0.0
    // t=1: l = .5*2 + .5*(0+0) = 1;  b = .3*(1-0) + .7*0 = .3
    rows(1).level shouldBe 1.0 +- 1e-12
    rows(1).trend shouldBe 0.3 +- 1e-12
    // t=2: l = .5*4 + .5*(1+.3) = 2.65;  b = .3*1.65 + .7*.3 = .705
    rows(2).level shouldBe 2.65 +- 1e-12
    rows(2).trend shouldBe 0.705 +- 1e-12
    // trend converges toward the true slope 2
    rows(4).trend should be > rows(1).trend
  }

  test("seasonalStrength is high for a pure seasonal pattern, low for noise-free trend") {
    val s = spark
    import s.implicits._
    // key 1: strict period-3 pattern (no trend) repeated 6 times
    // key 2: pure linear ramp (no seasonality)
    val seasonal = (0 until 18).map(i => (1L, i.toLong, Seq(5.0, 1.0, 3.0)(i % 3)))
    val ramp = (0 until 18).map(i => (2L, i.toLong, i.toDouble))
    val df = (seasonal ++ ramp).toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.seasonalStrength(df, 3).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("seasonal_strength"),
        r.getAs[Double]("trend_strength"))).toMap
    out(1L)._1 should be > 0.95 // seasonal component dominates
    out(2L)._2 should be > 0.95 // trend component dominates
    out(2L)._1 should be < 0.5  // a ramp has (almost) no period-3 signal
  }

  test("inertia is the mean squared distance to the group centroid") {
    val s = spark
    import s.implicits._
    // label 0: vectors (0,0) and (2,0) -> centroid (1,0), inertia = (1+1)/2 = 1
    // label 1: single vector -> inertia 0
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(2.0f, 0.0f), 0),
      (3L, Seq(5.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Embeddings.inertia(df).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_vectors"),
        r.getAs[Double]("inertia"))).toMap
    out(0) shouldBe ((2L, 1.0))
    out(1) shouldBe ((1L, 0.0))
  }
}
