package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.text.TextFunctions

/** Round-12: bounded two-phase top-K for log-odds keywords (no
  * stratum-wide rank window) and testdata-schema robustness. */
class Round12Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("logOddsKeywords plan contains no Window operator (bounded two-phase top-K)") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "apple apple banana"), ("s2", "cherry banana cherry")
    ).toDF("source", "text")
    val plan = TextFunctions.logOddsKeywords(docs, topK = 3)
      .queryExecution.executedPlan.toString
    // the old implementation ranked with row_number() OVER (PARTITION BY
    // stratum) — a single-task sort of an entire stratum's vocabulary; the
    // bounded rewrite must not reintroduce any window at all
    plan should not include "Window"
    plan should not include "row_number"
  }

  test("logOddsKeywords top-K is independent of physical partitioning") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (0 until 400).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      // skew word frequencies differently per stratum
      val w = words((i * (if (src == "a") 1 else 3)) % words.length)
      (src, s"$w common filler ${words(i % 5)}")
    }
    val docs = rows.toDF("source", "text")
    def topSet(df: org.apache.spark.sql.DataFrame) =
      TextFunctions.logOddsKeywords(df, topK = 4).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getAs[String]("token"),
          r.getAs[Double]("log_odds_z"))).toSet
    val one = topSet(docs.coalesce(1))
    val many = topSet(docs.repartition(13))
    many shouldBe one
  }

  test("VectorAR solve is exact on a planted SPD system") {
    import graft.models.VectorAR
    // G = M^T M is SPD for any full-rank M; plant X_true, form B = G X_true
    val mM = Array(Array(2.0, 1.0, 0.0), Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 2.0), Array(1.0, 0.0, 1.0))
    val g = Array.ofDim[Double](3, 3)
    for (i <- 0 until 3; j <- 0 until 3; r <- 0 until 4)
      g(i)(j) += mM(r)(i) * mM(r)(j)
    val xTrue = Array(Array(1.5, -2.0), Array(0.25, 3.0), Array(-1.0, 0.5))
    val b = Array.ofDim[Double](3, 2)
    for (i <- 0 until 3; j <- 0 until 2; k <- 0 until 3)
      b(i)(j) += g(i)(k) * xTrue(k)(j)
    val sol = VectorAR.solve(g.map(_.clone), b.map(_.clone))
    sol.isDefined shouldBe true
    for (i <- 0 until 3; j <- 0 until 2)
      math.abs(sol.get(i)(j) - xTrue(i)(j)) should be < 1e-9
    // singular system -> None
    val sing = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    VectorAR.solve(sing, Array(Array(1.0), Array(2.0))) shouldBe None
  }

  test("VectorAR fitLocal satisfies the OLS normal equations on arbitrary data") {
    import graft.models.VectorAR
    // residual orthogonality r ⊥ [1, lags] holds EXACTLY for any input —
    // an algebraic identity of a correct least-squares solve
    val n = 2; val p = 2
    val ys = collection.mutable.ArrayBuffer(Array(2.0, 5.0), Array(1.0, 4.0))
    for (t <- 0 until 150) {
      val y1 = ys.last; val y2 = ys(ys.length - 2)
      ys += Array(
        1.0 + 0.4 * y1(0) + 0.1 * y1(1) + 0.2 * y2(0) +
          math.sin(0.7 * t) * 0.5,
        2.0 + 0.3 * y1(1) + 0.05 * y2(0) + 0.2 * y2(1) +
          math.cos(1.3 * t) * 0.4)
    }
    val y = ys.toArray
    val beta = VectorAR.fitLocal(y, p).get
    val m = 1 + n * p
    val dot = Array.ofDim[Double](m, n) // sum_t x_t(r) * resid_t(j)
    var scale = 0.0
    for (t <- p until y.length) {
      val x = new Array[Double](m)
      x(0) = 1.0
      for (l <- 1 to p; i <- 0 until n) x(1 + (l - 1) * n + i) = y(t - l)(i)
      for (j <- 0 until n) {
        var pred = 0.0
        for (r <- 0 until m) pred += beta(r)(j) * x(r)
        val resid = y(t)(j) - pred
        for (r <- 0 until m) dot(r)(j) += x(r) * resid
      }
      scale += x.map(math.abs).sum
    }
    for (r <- 0 until m; j <- 0 until n)
      math.abs(dot(r)(j)) / scale should be < 1e-9
    // constant series -> singular Gram -> None, not a fabricated fit
    VectorAR.fitLocal(Array.fill(50)(Array(1.0, 1.0)), p) shouldBe None
    // under-determined -> None
    VectorAR.fitLocal(y.take(6), p) shouldBe None
  }

  test("featureHashEmbedding large-dim path matches the conditional-sum path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"), (2L, "delta epsilon"),
      (3L, "zeta zeta zeta eta theta iota"), (4L, "single")
    ).toDF("doc_id", "text")
    def collect(threshold: Int) =
      TextFunctions.featureHashEmbedding(docs, dim = 64,
          largeDimThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dense = collect(256) // conditional-sum path at dim=64
    val sparse = collect(1)  // forced map path at the same dim
    dense.keySet shouldBe sparse.keySet
    for (k <- dense.keySet; i <- dense(k).indices)
      math.abs(dense(k)(i) - sparse(k)(i)) should be < 1e-12
  }

  test("featureHashEmbedding at dim=4096 stays sane (plan and vectors)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma alpha beta"), (2L, "delta"))
      .toDF("doc_id", "text")
    val emb = TextFunctions.featureHashEmbedding(docs, dim = 4096)
    // plan must NOT carry per-dimension aggregate expressions
    val agg = emb.queryExecution.executedPlan.toString
    agg should not include "__c1024"
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows(1L).length shouldBe 4096
    // unit norm
    math.abs(rows(1L).map(x => x * x).sum - 1.0) should be < 1e-9
    // doc 2 has one token -> exactly one nonzero bucket at value 1.0
    rows(2L).count(_ != 0.0) shouldBe 1
    rows(2L).max shouldBe 1.0 +- 1e-12
    // doc 1: 2x alpha, 2x beta, 1x gamma -> norm 3, nonzero multiset {2/3,2/3,1/3}
    rows(1L).filter(_ != 0.0).sorted shouldBe Seq(1.0 / 3, 2.0 / 3, 2.0 / 3)
  }

  test("stratumCapSample is partitioning-independent, bounded, and windowless") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"src${i % 3}", s"doc text $i"))
      .toDF("doc_id", "source", "text")
    def sel(df: org.apache.spark.sql.DataFrame) =
      TextFunctions.stratumCapSample(df, cap = 7).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val one = sel(docs.coalesce(1))
    val many = sel(docs.repartition(17))
    many shouldBe one
    one.groupBy(_._1).foreach { case (_, rows) => rows.size shouldBe 7 }
    // no rank window anywhere in the plan
    val plan = TextFunctions.stratumCapSample(docs, cap = 7)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    // matches the rank-window definition computed naively
    val naive = docs.withColumn("sample_key",
        org.apache.spark.sql.functions.md5($"text".cast("binary")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy($"sample_key", $"doc_id")))
      .filter($"rk" <= 7)
      .select($"source", $"doc_id", $"sample_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    one shouldBe naive
  }

  test("silhouette is ~1 for tight separated clusters and negative for a misassigned point") {
    import spark.implicits._
    import graft.sim.Embeddings
    val tight = Seq(
      (0L, 0, Array(0.0, 0.0)), (1L, 0, Array(0.1, 0.0)), (2L, 0, Array(0.0, 0.1)),
      (10L, 1, Array(10.0, 10.0)), (11L, 1, Array(10.1, 10.0)), (12L, 1, Array(10.0, 10.1))
    ).toDF("vec_id", "label", "embedding")
    val s1 = Embeddings.silhouette(tight).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("silhouette")).toMap
    all(s1.values) should be > 0.95
    // move one label-0 point into cluster 1's territory: its s goes deeply
    // negative and drags the label-0 average below the tight value
    val bad = Seq(
      (0L, 0, Array(0.0, 0.0)), (1L, 0, Array(0.1, 0.0)), (2L, 0, Array(10.0, 10.0)),
      (10L, 1, Array(10.0, 10.0)), (11L, 1, Array(10.1, 10.0)), (12L, 1, Array(10.0, 10.1))
    ).toDF("vec_id", "label", "embedding")
    val s2 = Embeddings.silhouette(bad).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("silhouette")).toMap
    s2(0) should be < s1(0)
    // single group -> no "other" centroid -> no rows, not a crash
    val one = Seq((0L, 0, Array(1.0, 2.0))).toDF("vec_id", "label", "embedding")
    Embeddings.silhouette(one).count() shouldBe 0L
  }

  test("decayScore halves a value per half-life and anchors at the global max") {
    import spark.implicits._
    import graft.events.EventOps
    // user a: events at t=0 (2 half-lives old) and t=200 (the global max);
    // user b: one event 1 half-life old
    val ev = Seq(
      ("a", 0L, 4.0), ("a", 200L, 1.0), ("b", 100L, 2.0)
    ).toDF("user_id", "ts_us", "value")
    val rows = EventOps.decayScore(ev, halfLifeUs = 100L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    rows("a") shouldBe ((2L, 5.0, 2.0))  // 4/4 + 1
    rows("b") shouldBe ((1L, 2.0, 1.0))  // 2/2
    // null values excluded from both sums
    val withNull = ev.union(Seq(("b", 200L, null.asInstanceOf[java.lang.Double]))
      .map(t => (t._1, t._2, t._3: java.lang.Double)).toDF("user_id", "ts_us", "value")
      .select($"user_id", $"ts_us", $"value".cast("double")))
    val r2 = EventOps.decayScore(withNull, halfLifeUs = 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    r2("b") shouldBe 1L
  }

  test("grangerLagP at p=1 equals the closed-form grangerF") {
    import spark.implicits._
    import graft.models.VectorAR
    val rows = for (k <- Seq("a", "b"); t <- 0 until 80) yield {
      val x = math.sin(0.3 * t) + 0.1 * t % 3
      val y = 0.5 * math.sin(0.3 * (t - 1)) + math.cos(0.9 * t) * 0.4
      (k, t.toLong, y, x)
    }
    val df = rows.toDF("key", "ts_nanos", "y", "x")
    val gen = VectorAR.grangerLagP(df, 1).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("f_stat")).toMap
    val closed = graft.ts.TimeSeriesOps.grangerF(df).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("granger_f")).toMap
    gen.keySet shouldBe closed.keySet
    for (k <- gen.keySet)
      math.abs(gen(k) - closed(k)) / math.max(math.abs(closed(k)), 1e-12) should be < 1e-6
  }

  test("Tables.events normalizes ts to micros for both long-nanos and timestamp schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evt").toString
    // timestamp[us] flavor (the current driver schema)
    // Timestamp.from(Instant): timezone-independent — valueOf would parse
    // the wall-clock string in the JVM default zone and break off-UTC
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:01Z")),
        7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val us = Tables.events(spark, dir).select("ts_us").head().getLong(0)
    us shouldBe 1704067201000000L
    // long flavor (nanos), the pre-round-10 driver schema
    val dir2 = java.nio.file.Files.createTempDirectory("evt2").toString
    Seq((1L, 1704067201000000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val us2 = Tables.events(spark, dir2).select("ts_us").head().getLong(0)
    us2 shouldBe 1704067201000000L
  }
}
