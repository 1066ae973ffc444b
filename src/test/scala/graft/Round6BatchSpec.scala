package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

/** Specs for the round-6 batch: AR(1) half-life, Spearman rank correlation,
  * Mann-Kendall trend test, engagement stickiness, top session paths,
  * C4-style chunk dedup, bigram-LM scoring. */
class Round6BatchSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def seriesDf(vals: Seq[Double], key: String = "a") = {
    val s = spark
    import s.implicits._
    vals.zipWithIndex.map { case (v, t) => (key, t.toLong, v) }
      .toDF("key", "ts_nanos", "value")
  }

  test("halfLife recovers phi of a seeded AR(1) and nulls out non-reverting series") {
    val rnd = new scala.util.Random(7)
    val n = 5000
    val xs = Array.ofDim[Double](n)
    for (t <- 1 until n) xs(t) = 0.8 * xs(t - 1) + rnd.nextGaussian()
    val row = graft.ts.TimeSeriesOps.halfLife(seriesDf(xs.toSeq)).collect().head
    val phi = row.getAs[Double]("phi")
    phi shouldBe (0.8 +- 0.03)
    row.getAs[Double]("half_life") shouldBe (-math.log(2) / math.log(phi) +- 1e-9)
    // a pure random walk has phi ~ 1; an explosive/oscillating series -> null
    val osc = seriesDf(Seq.tabulate(100)(t => if (t % 2 == 0) 1.0 else -1.0))
    val r2 = graft.ts.TimeSeriesOps.halfLife(osc).collect().head
    r2.isNullAt(r2.fieldIndex("half_life")) shouldBe true
  }

  test("spearmanCorr is 1 on any monotone map and handles ties via mid-ranks") {
    val s = spark
    import s.implicits._
    // y = exp(x): non-linear but monotone -> rho exactly 1
    val df = (1 to 50).map(i => ("k", i.toDouble, math.exp(i.toDouble / 10)))
      .toDF("key", "x", "y")
    val rho = graft.ts.TimeSeriesOps.spearmanCorr(df, "key", "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    rho shouldBe (1.0 +- 1e-12)
    // tie handling: mid-ranks match R's cor(method="spearman") convention
    val tied = Seq(("k", 1.0, 3.0), ("k", 1.0, 1.0), ("k", 2.0, 2.0), ("k", 3.0, 4.0))
      .toDF("key", "x", "y")
    val rhoT = graft.ts.TimeSeriesOps.spearmanCorr(tied, "key", "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    // R: cor(c(1,1,2,3), c(3,1,2,4), method="spearman") = 0.6324555
    rhoT shouldBe (0.6324555 +- 1e-6)
  }

  test("mannKendall: exact S/var/z on a hand-checked series, sign on trends") {
    // x = [1, 3, 2, 4]: pairs (1,3)+ (1,2)+ (1,4)+ (3,2)- (3,4)+ (2,4)+ -> S=4
    val (s1, np, tau, varS, z) = graft.stats.StatTests.mannKendall(Array(1.0, 3, 2, 4))
    s1 shouldBe 4L
    np shouldBe 6L
    tau shouldBe (4.0 / 6 +- 1e-15)
    varS shouldBe (4.0 * 3 * 13 / 18 +- 1e-12) // no ties: n(n-1)(2n+5)/18
    z shouldBe ((4 - 1) / math.sqrt(varS) +- 1e-12)
    // ties contribute t(t-1)(2t+5): x = [1,1,2] -> tie group of 2
    val (_, _, _, varT, _) = graft.stats.StatTests.mannKendall(Array(1.0, 1, 2))
    varT shouldBe ((3.0 * 2 * 11 - 2 * 1 * 9) / 18 +- 1e-12)
    // strictly decreasing: S = -n(n-1)/2
    val (sd, npd, taud, _, zd) = graft.stats.StatTests.mannKendall(
      Array.tabulate(20)(t => -t.toDouble))
    sd shouldBe -190L
    taud shouldBe (-1.0 +- 1e-15)
    zd should be < -4.0
    npd shouldBe 190L
  }

  test("mannKendallAll lifts per key") {
    val s = spark
    import s.implicits._
    val df = (Seq.tabulate(30)(t => ("up", t.toLong, t.toDouble)) ++
      Seq.tabulate(30)(t => ("dn", t.toLong, -t.toDouble)))
      .toDF("key", "ts_nanos", "value")
    val out = graft.models.ModelOps.mannKendallAll(df).collect()
      .map(r => r.key -> r.z).toMap
    out("up") should be > 4.0
    out("dn") should be < -4.0
  }

  test("stickiness: one week of synthetic days gives exact DAU/WAU") {
    val s = spark
    import s.implicits._
    val dayUs = 86400000000L
    // week 0 (days 0-6): users 1,2 active every day; user 3 active day 0 only
    val rows = (for (d <- 0 until 7; u <- Seq(1L, 2L)) yield (u, d * dayUs + 1)) ++
      Seq((3L, 1L))
    val df = rows.toDF("user_id", "ts_us")
    val r = graft.events.EventOps.stickiness(df).collect().head
    r.getAs[Long]("wau") shouldBe 3L
    r.getAs[Long]("n_active_days") shouldBe 7L
    r.getAs[Double]("avg_dau") shouldBe ((2.0 * 6 + 3) / 7 +- 1e-12)
    r.getAs[Double]("stickiness") shouldBe (((2.0 * 6 + 3) / 7) / 3 +- 1e-12)
  }

  test("topPaths extracts the first-n path per session and ranks deterministically") {
    val s = spark
    import s.implicits._
    // user 1: session A>B>C>D (one session), then after a big gap B>A
    val rows = Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"), (1L, 4L, 400L, "D"),
      (1L, 5L, 1000000L, "B"), (1L, 6L, 1000001L, "A"),
      (2L, 7L, 100L, "A"), (2L, 8L, 150L, "B"), (2L, 9L, 160L, "C"))
    val df = rows.toDF("user_id", "event_id", "ts_us", "event_type")
    val out = graft.events.EventOps.topPaths(df, gapUs = 1000L, n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.head shouldBe ("A>B>C", 2L)
    out should contain ("B>A", 1L)
  }

  test("dedupChunks keeps the first occurrence of every chunk corpus-wide") {
    val s = spark
    import s.implicits._
    val t1 = (1 to 40).map(i => s"w$i").mkString(" ")   // chunks c1 c2
    val t2 = (21 to 60).map(i => s"w$i").mkString(" ")  // chunks c2 c3 (c2 dup)
    val df = Seq((1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
    val out = graft.text.Dedup.dedupChunks(df, 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L)._1 shouldBe 2L; out(1L)._2 shouldBe 2L // doc 1 keeps both chunks
    out(2L)._1 shouldBe 2L; out(2L)._2 shouldBe 1L // doc 2 loses its first chunk
    out(3L)._1 shouldBe 2L; out(3L)._2 shouldBe 0L // exact dup keeps nothing
    out(2L)._3 shouldBe (41 to 60).map(i => s"w$i").mkString(" ")
    out(3L)._3 shouldBe ""
  }

  test("ksDrift: zero on identical halves, 1 on disjoint halves") {
    // halves are value-identical -> every prefix gap collapses at each level
    val same = seriesDf(Seq(1.0, 2, 3, 4, 1, 2, 3, 4))
    val r = graft.ts.TimeSeriesOps.ksDrift(same).collect().head
    r.getAs[Long]("n_first") shouldBe 4L
    r.getAs[Double]("ks_d") shouldBe (0.0 +- 1e-15)
    // second half entirely above the first -> D = 1
    val shifted = seriesDf(Seq(1.0, 2, 3, 4, 11, 12, 13, 14))
    val r2 = graft.ts.TimeSeriesOps.ksDrift(shifted).collect().head
    r2.getAs[Double]("ks_d") shouldBe (1.0 +- 1e-15)
    r2.getAs[Long]("d_num") shouldBe 16L
  }

  test("hurst: iid noise scores near 0.5, a trending line near 1") {
    val rnd = new scala.util.Random(11)
    val iid = seriesDf(Seq.fill(4096)(rnd.nextGaussian()))
    val h = graft.ts.TimeSeriesOps.hurst(iid).collect().head.getAs[Double]("hurst")
    h shouldBe (0.5 +- 0.15)
    val trend = seriesDf(Seq.tabulate(4096)(t => t.toDouble))
    val ht = graft.ts.TimeSeriesOps.hurst(trend).collect().head.getAs[Double]("hurst")
    ht should be > 0.9
  }

  test("ouFit recovers kappa/theta of a seeded OU discretization") {
    val rnd = new scala.util.Random(3)
    val n = 20000
    val kappa = 0.5; val theta = 10.0; val sigma = 2.0
    val b = math.exp(-kappa)
    val sdEps = sigma * math.sqrt((1 - b * b) / (2 * kappa))
    val xs = Array.ofDim[Double](n)
    xs(0) = theta
    for (t <- 1 until n)
      xs(t) = theta + b * (xs(t - 1) - theta) + sdEps * rnd.nextGaussian()
    val r = graft.ts.TimeSeriesOps.ouFit(seriesDf(xs.toSeq)).collect().head
    r.getAs[Double]("kappa") shouldBe (kappa +- 0.05)
    r.getAs[Double]("theta") shouldBe (theta +- 0.2)
    r.getAs[Double]("sigma") shouldBe (sigma +- 0.1)
  }

  test("benfordDeviation: a Benford-perfect histogram scores ~0, uniform digits high") {
    val s = spark
    import s.implicits._
    // build counts proportional to Benford mass out of 10000 samples
    val benford = (1 to 9).flatMap { d =>
      val c = math.round(10000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(c)(("k", d.toDouble))
    }
    val df = benford.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
      .toDF("key", "ts_nanos", "value")
    val tvd = graft.ts.TimeSeriesOps.benfordDeviation(df).collect()
      .head.getAs[Double]("benford_tvd")
    tvd should be < 0.01
    // all-same-digit corpus: deviation = |1 - log10(2)| + sum of the rest
    val ones = seriesDf(Seq.fill(100)(1.23))
    val t1 = graft.ts.TimeSeriesOps.benfordDeviation(ones).collect()
      .head.getAs[Double]("benford_tvd")
    val expected = (1.0 - math.log10(2)) +
      (2 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum
    t1 shouldBe (expected +- 1e-12)
  }

  test("dimStats flags a collapsed dimension") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 200).map(i =>
      (i.toLong, Seq(rnd.nextFloat(), 0.25f, rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val rows = graft.sim.Embeddings.dimStats(df).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Double]("dim_var")).toMap
    rows(1L) shouldBe 0.0 +- 1e-12
    rows(0L) should be > 0.01
    rows(2L) should be > 0.01
  }

  test("bigramLogProb: uniform corpus scores ln(2) per bigram") {
    val s = spark
    import s.implicits._
    // corpus: "a b" and "a c" -> P(b|a) = P(c|a) = 1/2, avg_neg = ln 2
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.text.TextFunctions.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out(1L) shouldBe (math.log(2) +- 1e-6)
    out(2L) shouldBe (math.log(2) +- 1e-6)
    // deterministic chain: "a b a b a b" -> P(b|a)=1 except P(a|b)=1 -> 0
    val chain = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val c = graft.text.TextFunctions.bigramLogProb(chain).collect().head
    c.getAs[Long]("n_bigrams") shouldBe 5L
    c.getAs[Double]("avg_neg_logprob") shouldBe (0.0 +- 1e-12)
  }

  test("lmPerplexityGate keeps fluent docs and flags high-perplexity ones") {
    val s = spark
    import s.implicits._
    // joint corpus LM: cb(a b)=4, cb(b a)=2, cb(a c)=1; cu(a)=5, cu(b)=2.
    // doc1: round(-(3 ln(4/5))/5, 6) = .133886 -> perp 1.143262 (keep)
    // doc2: single "a b" at P=4/5 -> perp 1.25 (keep)
    // doc3: single "a c" at P=1/5 -> perp 5.0 (drop at threshold 1.5)
    val df = Seq((1L, "a b a b a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = graft.text.TextFunctions.lmPerplexityGate(df, maxPerplexity = 1.5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("perplexity"), r.getAs[Boolean]("keep"))).toMap
    out(1L)._1 shouldBe (1.143262 +- 1e-6)
    out(1L)._2 shouldBe true
    out(2L)._1 shouldBe (1.25 +- 1e-6)
    out(2L)._2 shouldBe true
    out(3L)._1 shouldBe (5.0 +- 1e-6)
    out(3L)._2 shouldBe false
  }
}
