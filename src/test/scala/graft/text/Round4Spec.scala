package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.graph.ConnectedComponents
import graft.sim.Embeddings
import graft.ts.{RollAlign, TimeSeriesOps}

/** Specs for the round-4 operators: connected components / dup clusters,
  * repetition signals, duplicated spans, stratified sampling, embedding
  * centroids + quantization, z-score outliers, rolling stddev. */
class Round4Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("connected components: two components, a chain, and an isolated vertex") {
    val s = spark
    import s.implicits._
    val vertices = (0L to 8L).toDF("id")
    // component {0,1,2,3} as a chain, {5,6,7} as a triangle, 4 and 8 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("src", "dst")
    val comp = ConnectedComponents.run(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L)
  }

  test("connected components: long chain converges via pointer jumping") {
    val s = spark
    import s.implicits._
    val n = 40L // diameter 40 must converge well inside maxIter via jumps
    val vertices = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = ConnectedComponents.run(vertices, edges).collect()
    comp.map(_.getLong(1)).toSet shouldBe Set(0L)
  }

  test("dupClusters elects the smallest doc id as canonical") {
    val s = spark
    import s.implicits._
    val corpus = (0L to 4L).toDF("doc_id")
    val pairs = Seq((3L, 1L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(corpus, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    out shouldBe Set((0L, 0L, true), (1L, 1L, true), (3L, 1L, false),
      (4L, 1L, false), (2L, 2L, true))
  }

  test("repetitionSignals on a hand-computed doc") {
    val s = spark
    import s.implicits._
    // 6 words, 4 distinct, top word "aa" x3, lengths 2*3+3+2+1=12, alpha 5/6
    val df = Seq((0L, "aa aa aa bbb cc 1")).toDF("doc_id", "text")
    val r = TextFunctions.repetitionSignals(df).collect()(0)
    r.getAs[Long]("n_words") shouldBe 6L
    r.getAs[Double]("mean_word_len") shouldBe (12.0 / 6.0)
    r.getAs[Double]("dup_word_ratio") shouldBe (2.0 / 6.0)
    r.getAs[Double]("top_word_ratio") shouldBe (3.0 / 6.0)
    r.getAs[Double]("alpha_word_ratio") shouldBe (5.0 / 6.0)
  }

  test("duplicateSpans marks spans shared across docs and skips short docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b c d e f"),      // spans: "a b c d e", "b c d e f"
      (1L, "a b c d e x"),      // shares "a b c d e"? no — spans "a b c d e"(yes) and "b c d e x"
      (2L, "short doc")         // < 5 words: no spans
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, k = 5).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    out(0L) shouldBe ((2L, 1L)) // "a b c d e" shared with doc 1
    out(1L) shouldBe ((2L, 1L))
    out.contains(2L) shouldBe false
  }

  test("stratifiedSample: rate 1 keeps all, rate 0 drops all, deterministic") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"doc number $i", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val all = TextFunctions.stratifiedSample(df, Map("a" -> 1.0, "b" -> 0.0))
    all.select("source").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("a")
    all.count() shouldBe 50L
    val half = TextFunctions.stratifiedSample(df, Map("a" -> 0.5), defaultRate = 0.0)
    val c1 = half.count(); val c2 = half.count()
    c1 shouldBe c2 // content-hash: stable across runs
    c1 should be < 50L
  }

  test("embedding centroids average per (group, pos)") {
    val s = spark
    import s.implicits._
    val df = Seq((0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)), (1, Array(5.0f, 6.0f)))
      .toDF("label", "embedding")
    val out = Embeddings.centroids(df).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out((0, 0L)) shouldBe 2.0
    out((0, 1L)) shouldBe 3.0
    out((1, 0L)) shouldBe 5.0
  }

  test("quantize8bit: codes bounded, small reconstruction error, constant vec -> null") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, Array.tabulate(16)(i => i.toFloat)), (1L, Array.fill(16)(2.0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.quantize8bit(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // linear ramp: code_i = floor(i * 255/15) = 17*i, sum = 17*120
    rows(0L).getAs[Long]("code_sum") shouldBe (0 until 16).map(_ * 17L).sum
    rows(0L).getAs[Double]("recon_mse") should be < 1e-3
    rows(1L).isNullAt(1) shouldBe true // constant vector: null codes via try_divide
  }

  test("z-score outliers flag only extreme points") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(20)(10.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.outliers(df, threshold = 3.0)
    out.count() shouldBe 1L
    out.collect()(0).getAs[Double]("value") shouldBe 100.0
  }

  test("rollStd matches a hand-computed sliding stddev and keeps full windows only") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.rollStd(df, 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    out.keySet shouldBe Set(2L, 3L, 4L)
    out(2L) shouldBe (1.0 +- 1e-12)               // stddev(1,2,3)
    out(4L) shouldBe (math.sqrt(14.333333333333334) +- 1e-9) // stddev(3,4,10)
  }
}
