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
    SemDedup.suggestedK(n) shouldBe 23 // ceil(sqrt(500)), above the k=16 default
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
}
