package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sim.{Embeddings, SemDedup}
import graft.ts.{RollAlign, TimeSeriesOps => TS}

/** Round-14 regression pins (ADVICE r13): rollQuantile rank rounding,
  * semanticKeepers defaults, kCenterSample edge behavior, binaryMetrics
  * guards. */
class Round14Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("rollQuantile rank survives binary q*n rounding (q=0.55, n=100)") {
    import spark.implicits._
    // 0.55*100 = 55.000000000000007 in binary; plain ceil gave rank 56
    val df = (1 to 100).map(i => ("k", i.toLong, i.toDouble))
      .toDF("key", "ts_nanos", "value")
    val out = TS.rollQuantile(df, 100, 0.55).collect()
    out.length shouldBe 1
    out(0).getAs[Double]("value") shouldBe 55.0
    val out7 = TS.rollQuantile(df, 100, 0.07).collect()
    out7(0).getAs[Double]("value") shouldBe 7.0 // 0.07*100 = 7.000…001
    // unaffected control case from ts49
    val df10 = (1 to 10).map(i => ("k", i.toLong, i.toDouble))
      .toDF("key", "ts_nanos", "value")
    TS.rollQuantile(df10, 10, 0.9).collect()(0)
      .getAs[Double]("value") shouldBe 9.0
  }

  test("semanticKeepers defaults: nprobe=2 delegation to keepersOfPairs") {
    import spark.implicits._
    // two tight clusters + one straddler so nprobe matters structurally
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.01f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.01f, 0.999f)),
      (5L, Array(0.72f, 0.69f)))
    val df = vecs.toDF("vec_id", "embedding")
    val viaDefault = SemDedup.semanticKeepers(df, k = 2, threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted
    val viaComposition = SemDedup.keepersOfPairs(df,
        SemDedup.semanticDuplicates(df, k = 2, threshold = 0.95, nprobe = 2))
      .select("vec_id").as[Long].collect().sorted
    viaDefault shouldBe viaComposition
    // and the default differs from nprobe=1 in GENERAL; here just pin that
    // the default path produced a valid keeper set (non-empty, subset of ids)
    viaDefault.length should be > 0
    viaDefault.toSet.subsetOf(vecs.map(_._1).toSet) shouldBe true
  }

  test("kCenterSample rejects empty input and stops at distinct count") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Embeddings.kCenterSample(empty, 3)
    }
    ex.getMessage should include("empty input")
    // 2 distinct vectors duplicated: k=5 must yield 2 centers, no radius-0 dupes
    val dup = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(3.0f, 4.0f)), (4L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.kCenterSample(dup, 5).collect()
    out.length shouldBe 2
    out.map(_.getAs[Long]("vec_id")).sorted shouldBe Array(1L, 3L)
  }

  test("batched kCenterSample is bit-identical to sequential Gonzalez") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 4f - 2f)))
    val df = vecs.toDF("vec_id", "embedding")
    // driver-side one-at-a-time Gonzalez (the contract)
    val pts = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val k = 13
    val centers = collection.mutable.ArrayBuffer(
      (pts.minBy(_._1)._1, Double.NaN))
    val minD = collection.mutable.Map(pts.map(p =>
      p._1 -> sq(p._2, pts.minBy(_._1)._2)): _*)
    while (centers.length < k) {
      val (bid, bd) = minD.toSeq.maxBy { case (id, d) => (d, -id) }
      centers += ((bid, math.sqrt(bd)))
      val bv = pts.find(_._1 == bid).get._2
      pts.foreach(p => minD(p._1) = math.min(minD(p._1), sq(p._2, bv)))
    }
    // the distributed batched version, small batch to force several passes
    val got = graft.sim.Embeddings.kCenterSample(df, k, batch = 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("radius")))
    got.map(_._1) shouldBe centers.map(_._1).toArray
    got.drop(1).map(_._2).zip(centers.drop(1).map(_._2)).foreach {
      case (a, b) => a shouldBe b +- 1e-9
    }
  }

  test("TimeSeriesFilter filters i.i.d. innovations into model dynamics") {
    import graft.models.{ARModel, GARCHModel, TimeSeriesFilter}
    val ar: TimeSeriesFilter = ARModel(0.5, Array(0.3))
    val iid = Array(1.0, -0.5, 0.25, 0.8)
    val dest = new Array[Double](iid.length)
    val out = ar.filter(iid, dest)
    (out eq dest) shouldBe true
    out shouldBe ARModel(0.5, Array(0.3)).addTimeDependentEffects(iid)
    // dest may alias the input
    val inPlace = iid.clone()
    ar.filter(inPlace, inPlace) shouldBe out
    // GARCH implements it too (variance-scaling filter)
    val g = GARCHModel(0.1, 0.2, 0.5)
    val gd = new Array[Double](iid.length)
    g.filter(iid, gd) shouldBe g.addTimeDependentEffects(iid)
  }

  test("EGARCH: leverage asymmetry, inverse pair, and recovery") {
    import graft.models.{EGARCH, EGARCHModel}
    import org.apache.commons.math3.random.MersenneTwister
    val truth = EGARCHModel(omega = -0.2, alpha = 0.25, gamma = -0.15, beta = 0.9)
    // leverage: a negative shock must raise next-step variance MORE than an
    // equal positive shock (gamma < 0)
    val lhNeg = truth.logVariances(Array(-2.0, 0.0))(1)
    val lhPos = truth.logVariances(Array(2.0, 0.0))(1)
    lhNeg should be > lhPos
    // inverse pair at machine epsilon
    val ts = truth.sample(2000, new MersenneTwister(5L))
    val rt = truth.addTimeDependentEffects(truth.removeTimeDependentEffects(ts))
    rt.zip(ts).foreach { case (a, b) => a shouldBe b +- 1e-10 }
    // recovery (mr20's seed-101 instance)
    val m = EGARCH.fitModel(truth.sample(8000, new MersenneTwister(101L)))
    m.omega shouldBe -0.2 +- 0.12
    m.alpha shouldBe 0.25 +- 0.08
    m.gamma shouldBe -0.15 +- 0.08
    m.beta shouldBe 0.9 +- 0.06
  }

  test("binaryMetrics: single-class AUC is null; out-of-range scores clamp") {
    import spark.implicits._
    val onlyPos = Seq((1.0, 0.9), (1.0, 0.3)).toDF("label", "score")
    val r1 = graft.models.Logistic.binaryMetrics(onlyPos).collect()(0)
    r1.isNullAt(r1.fieldIndex("auc")) shouldBe true
    // a negative and a >1 score land in buckets 0 and buckets-1, not outside
    val odd = Seq((1.0, -0.2), (0.0, 1.3), (1.0, 0.8), (0.0, 0.1))
      .toDF("label", "score")
    val r2 = graft.models.Logistic.binaryMetrics(odd).collect()(0)
    // perfect separation on the two in-range + clamped pairs except the
    // negative-score positive: AUC = 2/4 concordant + ... just assert sane
    val auc = r2.getAs[Double]("auc")
    auc should (be >= 0.0 and be <= 1.0)
  }
}
