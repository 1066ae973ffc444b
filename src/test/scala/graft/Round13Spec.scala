package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sim.SemDedup

/** Round-13 fixes: the `k <= 0` auto-scale path of SemDeDup
  * (suggestedK must actually reach the quantizer fit, not just the
  * nprobe require). */
class Round13Spec extends AnyFunSuite with Matchers with SparkTestSession {

  /** 250 exact-duplicate pairs (ids 2i / 2i+1 share one unit vector) spread
    * over the dim-8 sphere: co-assignment of identical vectors is
    * guaranteed at any k, so recall of the planted pairs is 1 regardless
    * of how the auto-scaled quantizer partitions the sphere. */
  private def pairedVecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 250).flatMap { i =>
      val v = Array.fill(8)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / n)
      Seq((2L * i, u), (2L * i + 1, u))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("semanticDuplicates(k = 0) auto-scales to suggestedK and still finds every planted pair") {
    val n = 500L
    SemDedup.suggestedK(n) shouldBe 23 // ceil(sqrt(500)), above the minK=16 floor
    val pairs = SemDedup.semanticDuplicates(pairedVecs, k = 0, threshold = 0.99)
    val collected = pairs.select(col("cluster").cast("long"), col("id_a"), col("id_b")).collect()
    val pairSet = collected.map(r => (r.getLong(1), r.getLong(2))).toSet
    val planted = (0 until 250).map(i => (2L * i, 2L * i + 1)).toSet
    planted.subsetOf(pairSet) shouldBe true
    // the quantizer really fit suggestedK clusters, not the raw k: with 23
    // centers over 250 spread base vectors, occupied cluster ids exceed the
    // 0..15 range a k=16 fit could ever emit
    val clusters = collected.map(_.getLong(0)).toSet
    clusters.max should be >= 16L
    clusters.max should be < 23L
  }

  test("semanticKeepers(k = 0) keeps exactly one exemplar per planted pair") {
    val kept = SemDedup.semanticKeepers(pairedVecs, k = 0, threshold = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    kept shouldBe (0 until 250).map(i => 2L * i).toSet
  }

  test("icsLocal ICs agree with explicitly-computed residual covariance") {
    import graft.models.VectorAR
    // random stable bivariate VAR(1) data; score p = 1..3 via the streamed
    // sub-block kernel and re-derive each IC from an explicit fit +
    // residual pass over the SAME effective sample (t = pmax..T-1)
    val rnd = new scala.util.Random(11)
    val tTot = 400
    val y = Array.ofDim[Double](tTot, 2)
    y(0) = Array(1.0, -1.0)
    for (t <- 1 until tTot) {
      y(t)(0) = 0.5 + 0.4 * y(t - 1)(0) + 0.2 * y(t - 1)(1) + rnd.nextGaussian() * 0.3
      y(t)(1) = -0.2 + 0.1 * y(t - 1)(0) + 0.5 * y(t - 1)(1) + rnd.nextGaussian() * 0.3
    }
    val pmax = 3
    val ics = VectorAR.icsLocal(y, pmax)
    ics.map(_.p) shouldBe Seq(1, 2, 3)
    val nobs = tTot - pmax
    for (ic <- ics) {
      val p = ic.p
      // explicit OLS on the same sample: design rows t = pmax..T-1
      val m = 1 + 2 * p
      val rows = (pmax until tTot).map { t =>
        (Array(1.0) ++ (1 to p).flatMap(l => y(t - l)), y(t))
      }
      val g = Array.ofDim[Double](m, m)
      val b = Array.ofDim[Double](m, 2)
      for ((x, yt) <- rows; r <- 0 until m) {
        for (c <- 0 until m) g(r)(c) += x(r) * x(c)
        for (j <- 0 until 2) b(r)(j) += x(r) * yt(j)
      }
      val beta = VectorAR.solve(g.map(_.clone), b.map(_.clone)).get
      val resid = rows.map { case (x, yt) =>
        Array.tabulate(2)(j => yt(j) - (0 until m).map(r => beta(r)(j) * x(r)).sum)
      }
      val sig = Array.tabulate(2, 2)((a, c) =>
        resid.map(e => e(a) * e(c)).sum / nobs)
      val ld = math.log(sig(0)(0) * sig(1)(1) - sig(0)(1) * sig(1)(0))
      ic.log_det_sigma shouldBe ld +- 1e-8
      val k = 2.0 * (2 * p + 1)
      ic.aic shouldBe (ld + 2 * k / nobs) +- 1e-8
      ic.bic shouldBe (ld + k * math.log(nobs.toDouble) / nobs) +- 1e-8
      ic.hqic shouldBe (ld + 2 * k * math.log(math.log(nobs.toDouble)) / nobs) +- 1e-8
    }
  }

  test("dsirLogWeights upweights target-like documents") {
    import spark.implicits._
    import graft.text.Dsir
    val raw = Seq(
      (0L, "apple pie apple tart apple"),   // target-like
      (1L, "zebra quagga zebra okapi"),     // target-unlike
      (2L, "apple zebra"),                  // mixed
      (3L, "")                              // empty -> weight 0
    ).toDF("doc_id", "text")
    val target = Seq((100L, "apple pie apple strudel apple apple"))
      .toDF("doc_id", "text")
    val w = Dsir.dsirLogWeights(raw, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    w(3) shouldBe ((0L, 0.0)) // empty product
    w(0)._2 should be > w(2)._2
    w(2)._2 should be > w(1)._2
    // unigrams + bigrams: 5 tokens -> 9 ngrams
    w(0)._1 shouldBe 9L
  }

  test("dsirSample is a deterministic without-replacement top-k") {
    import spark.implicits._
    import graft.text.Dsir
    val raw = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "apple apple pie" else "zebra okapi quagga"))
      .toDF("doc_id", "text")
    val target = Seq((100L, "apple pie apple")).toDF("doc_id", "text")
    val s1 = Dsir.dsirSample(raw, target, k = 10).collect()
    val s2 = Dsir.dsirSample(raw, target, k = 10).collect()
    s1.map(_.getLong(0)).toSeq shouldBe s2.map(_.getLong(0)).toSeq
    s1.length shouldBe 10
    // keys are sorted descending and ids unique
    val keys = s1.map(_.getDouble(2))
    keys.sorted.reverse.toSeq shouldBe keys.toSeq
    s1.map(_.getLong(0)).distinct.length shouldBe 10
    // the heavily-upweighted apple docs dominate the sample
    val apples = s1.count(_.getLong(0) % 2 == 0)
    apples should be >= 8
  }

  test("varpBestOrder selects the planted order 2 by BIC on simulated VAR(2)") {
    val best = graft.models.Recovery.orderRecover(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    best.values.forall(identity) shouldBe true
    best.size shouldBe 18 // 3 seeds x 6 checks
  }

  test("varpIrf on a VAR(1) equals powers of the fitted A, orth step 0 is Cholesky") {
    import spark.implicits._
    import graft.models.VectorAR
    val rnd = new scala.util.Random(5)
    val rows = {
      var x = 1.0; var y = -1.0
      (0 until 600).map { t =>
        val nx = 0.3 + 0.5 * x + 0.2 * y + rnd.nextGaussian() * 0.2
        val ny = -0.1 + 0.1 * x + 0.4 * y + rnd.nextGaussian() * 0.2
        x = nx; y = ny
        ("k", t.toLong, x, y)
      }
    }
    val df = rows.toDF("key", "ts_nanos", "x", "y")
    val names = Seq("x", "y")
    val fit = VectorAR.varpFit(df, 1, names).collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(3)) -> r.getDouble(4)).toMap
    val a = Array.tabulate(2, 2)((i, j) => fit((names(i), names(j), 1)))
    val irf = VectorAR.varpIrf(df, 1, 3, names).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    // Φ_s = A^s for VAR(1)
    def matPow(m: Array[Array[Double]], s: Int): Array[Array[Double]] =
      (1 until s).foldLeft(m)((acc, _) => Array.tabulate(2, 2)((i, j) =>
        (0 until 2).map(q => acc(i)(q) * m(q)(j)).sum))
    for (s <- 1 to 3; i <- 0 until 2; j <- 0 until 2)
      irf((s, names(j), names(i)))._1 shouldBe matPow(a, s)(i)(j) +- 1e-9
    // step 0: identity (plain) and lower-triangular Cholesky (orth)
    irf((0, "x", "x"))._1 shouldBe 1.0
    irf((0, "y", "x"))._1 shouldBe 0.0
    irf((0, "y", "x"))._2 shouldBe 0.0 // upper element of lower-tri P
    irf((0, "x", "x"))._2 should be > 0.0
    // FEVD shares: nonnegative, sum to 1 per variable
    val fevd = VectorAR.varpFevd(df, 1, 4, names).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getDouble(4)).toMap
    for (v <- names) {
      val shares = names.map(sh => fevd((v, sh)))
      all(shares) should be >= 0.0
      shares.sum shouldBe 1.0 +- 1e-9
    }
    // own-shock share dominates at short horizons for this near-diagonal A
    fevd(("x", "x")) should be > 0.5
  }

  test("logisticFit recovers planted coefficients, calibrates, and separates") {
    val checks = graft.models.Recovery.logitRecover(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    checks.size shouldBe 15 // 3 seeds x 5 checks
    all(checks.values) shouldBe true
  }

  test("DSIR and ccnetBuckets plans: broadcast ratio/threshold joins, no corpus Window") {
    import spark.implicits._
    import graft.text.{Dsir, TextFunctions}
    val raw = (0 until 40).map(i =>
      (i.toLong, s"tok$i alpha beta gamma delta", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val target = raw.filter($"source" === "a")
    val wPlan = Dsir.dsirLogWeights(raw, target)
      .queryExecution.executedPlan.toString
    // the per-doc scoring join against the bounded ratio table must
    // broadcast, and nothing in the pipeline may sort a corpus-wide window
    wPlan should include("BroadcastHashJoin")
    wPlan should not include "Window"
    val bPlan = TextFunctions.ccnetBuckets(raw)
      .queryExecution.executedPlan.toString
    // per-stratum thresholds broadcast back onto the scored table
    bPlan should include("BroadcastHashJoin")
    bPlan should not include "Window"
  }

  test("hardNegatives returns only different-label neighbors, nearest first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // query, label 0
      (1L, Array(0.99f, 0.1f), 0),  // same label — must NOT appear
      (2L, Array(0.95f, 0.2f), 1),  // hardest negative
      (3L, Array(0.5f, 0.8f), 1),
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.sim.Similarity.hardNegatives(
      vecs, vecs.filter($"vec_id" === 0), k = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
    out.map(_._3).toSet shouldBe Set(1) // only label-1 impostors
    out.sortBy(_._1).map(_._2).toSeq shouldBe Seq(2L, 3L) // nearest first
  }

  test("kCenterSample picks one exemplar per planted cluster (rc09 checks)") {
    val checks = graft.sim.Recall.kcenter(spark, "").collect()
      .map(r => r.getString(1) -> r.getBoolean(2)).toMap
    checks.size shouldBe 4
    all(checks.values) shouldBe true
  }

  test("logisticFit l2 ridge converges under complete separation") {
    import spark.implicits._
    import graft.models.Logistic
    // perfectly separable at x = 0: the unpenalized MLE diverges (no
    // convergence); the ridge fit must converge to a finite slope with
    // the right sign and still classify perfectly
    val df = (1 to 40).map { i =>
      val x = if (i <= 20) -1.0 - 0.05 * i else 1.0 + 0.05 * (i - 20)
      (x, if (x > 0) 1.0 else 0.0)
    }.toDF("x", "y")
    val fit = Logistic.logisticFit(df, "y", Seq("x"), l2 = 1.0)
    val rows = fit.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getBoolean(3)))).toMap
    rows("x")._2 shouldBe true // converged
    rows("x")._1 should be > 0.0
    rows("x")._1.isInfinite shouldBe false
    val scored = Logistic.logisticScore(df, fit, Seq("x"))
    val acc = Logistic.binaryMetrics(scored, "y", "score")
      .head().getAs[Double]("accuracy")
    acc shouldBe 1.0 +- 1e-9
  }

  test("binaryMetrics AUC matches the hand-computed rank statistic") {
    import spark.implicits._
    import graft.models.Logistic
    // scores 0.1/0.2 negative, 0.8/0.9 positive, one tie pair at 0.5:
    // U = pairs where pos > neg + half the tied pairs
    val df = Seq((0.0, 0.1), (0.0, 0.2), (1.0, 0.8), (1.0, 0.9),
      (0.0, 0.5), (1.0, 0.5)).toDF("label", "score")
    val m = Logistic.binaryMetrics(df).head()
    // positives: .8,.9,.5 | negatives: .1,.2,.5
    // U = (.8>all3)=3 + (.9>all3)=3 + (.5: >.1,.2 =2, tied with .5 = +0.5) = 8.5
    m.getAs[Double]("auc") shouldBe (8.5 / 9.0) +- 1e-6 // output rounds to 6dp
    m.getAs[Long]("n") shouldBe 6L
    m.getAs[Long]("n_pos") shouldBe 3L
    // brier = mean((s-y)^2), accuracy at 0.5 (ties predict positive)
    val brier = Seq(0.1, 0.2, 0.2, 0.1, 0.5, 0.5).map(x => x * x).sum / 6
    m.getAs[Double]("brier") shouldBe brier +- 1e-6
    m.getAs[Double]("accuracy") shouldBe (5.0 / 6) +- 1e-6
  }

  test("ccnetBuckets tiers are within-stratum thirds ordered by perplexity") {
    import spark.implicits._
    // 9 docs in one source with strictly increasing repetitiveness (lower
    // bigram diversity -> different perplexity); buckets must be 3/3/3 and
    // every head perplexity <= every middle <= every tail
    val docs = (0 until 9).map { i =>
      val words = (0 to i).map(j => s"w$j")
      (i.toLong, Iterator.continually(words).flatten.take(30).mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val out = graft.text.TextFunctions.ccnetBuckets(docs).collect()
      .map(r => (r.getString(3), r.getDouble(2)))
    out.length shouldBe 9
    val byBucket = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byBucket("head").length shouldBe 3
    byBucket("middle").length shouldBe 3
    byBucket("tail").length shouldBe 3
    byBucket("head").max should be <= byBucket("middle").min
    byBucket("middle").max should be <= byBucket("tail").min
  }

  test("rollQuantile is the nearest-rank element of each full window") {
    import spark.implicits._
    val df = (1 to 8).map(t => ("k", t.toLong, t.toDouble)).toDF("key", "ts_nanos", "value")
    // width 4, q=0.75 -> ceil(3) = 3rd smallest of the trailing 4
    val out = graft.ts.TimeSeriesOps.rollQuantile(df, 4, 0.75)
      .orderBy("ts_nanos").collect().map(r => r.getLong(1) -> r.getDouble(2))
    out shouldBe Array(4L -> 3.0, 5L -> 4.0, 6L -> 5.0, 7L -> 6.0, 8L -> 7.0)
    // q=1 is the window max
    val mx = graft.ts.TimeSeriesOps.rollQuantile(df, 4, 1.0)
      .orderBy("ts_nanos").collect().map(_.getDouble(2))
    mx shouldBe Array(4.0, 5.0, 6.0, 7.0, 8.0)
  }

  test("normalQuantile matches known standard-normal quantiles") {
    import graft.models.VectorAR.normalQuantile
    normalQuantile(0.5) shouldBe 0.0 +- 1e-9
    normalQuantile(0.975) shouldBe 1.959963984540054 +- 1e-8
    normalQuantile(0.95) shouldBe 1.6448536269514722 +- 1e-8
    normalQuantile(0.025) shouldBe -1.959963984540054 +- 1e-8
    normalQuantile(0.999) shouldBe 3.090232306167813 +- 1e-7
    normalQuantile(0.001) shouldBe -3.090232306167813 +- 1e-7
  }

  test("varpForecastIntervals: points match varpForecast, bands widen with h") {
    import spark.implicits._
    import graft.models.VectorAR
    val rnd = new scala.util.Random(9)
    val rows = {
      var x = 0.0; var y = 0.0
      (0 until 400).map { t =>
        val nx = 0.2 + 0.5 * x + 0.1 * y + rnd.nextGaussian() * 0.3
        val ny = -0.1 + 0.2 * x + 0.4 * y + rnd.nextGaussian() * 0.3
        x = nx; y = ny
        ("k", t.toLong, x, y)
      }
    }
    val df = rows.toDF("key", "ts_nanos", "x", "y")
    val names = Seq("x", "y")
    val fc = VectorAR.varpForecast(df, 1, 3, names).collect()
      .map(r => (r.getInt(1), r.getString(3)) -> r.getDouble(4)).toMap
    val iv = VectorAR.varpForecastIntervals(df, 1, 3, names).collect()
      .map(r => (r.getInt(1), r.getString(3)) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    for (s <- 1 to 3; e <- names) {
      iv((s, e))._1 shouldBe fc((s, e)) +- 1e-12
      val (v, se, lo, hi) = iv((s, e))
      se should be > 0.0
      lo shouldBe (v - 1.959963984540054 * se) +- 1e-9
      hi shouldBe (v + 1.959963984540054 * se) +- 1e-9
    }
    for (e <- names; s <- 1 to 2)
      iv((s + 1, e))._2 should be >= iv((s, e))._2
  }
}
