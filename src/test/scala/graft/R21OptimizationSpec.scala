package graft.models

import graft.Tables
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite


/** r21 optimization round: focused pins for the kernels whose INTERNALS
  * changed for performance. Each test asserts the optimized path is
  * bit-identical to the formulation it replaced (the round's contract:
  * never change what a query computes).
  */
class R21OptimizationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    Tables.configure(SparkSession.builder().master("local[4]")
      .appName("r21-opt-spec"), "4").getOrCreate()

  // --- HoltWinters: hoisted initial state ---------------------------------

  test("HW sseFrom with hoisted initial state is bit-identical to sse") {
    val rnd = new scala.util.Random(7)
    for (period <- Seq(4, 7); additive <- Seq(true, false)) {
      val n = 6 * period
      val ts = Array.tabulate(n) { t =>
        20.0 + 0.1 * t + 2.0 * math.sin(2 * math.Pi * t / period) +
          rnd.nextGaussian() * 0.3
      }
      val (l0, b0, s0) = HoltWinters.initialState(ts, period, additive)
      for (a <- Seq(0.2, 0.7); b <- Seq(0.05, 0.4); g <- Seq(0.1, 0.9)) {
        val m = HoltWintersModel(period, a, b, g, additive)
        // java.lang.Double.compare: bit-level equality incl. -0.0 and NaN
        assert(java.lang.Double.compare(
          m.sseFrom(ts, l0, b0, s0), m.sse(ts)) == 0,
          s"period=$period additive=$additive a=$a b=$b g=$g")
      }
    }
  }

  // --- NormalizedVector: native kernel vs the old HOF chain ---------------

  /** The exact column chain Similarity.normalized used before r21. */
  private def hofNormalized(a: org.apache.spark.sql.Column) = {
    val d = transform(a, x => x.cast("double"))
    val nn = sqrt(aggregate(transform(d, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(nn === 0.0, d).otherwise(transform(d, x => x / nn))
  }

  test("NormalizedVector matches the HOF chain bit-exactly (float input + edges)") {
    val rows = Seq(
      Row(1L, Array(1.0f, 2.0f, -3.0f, 0.5f)),
      Row(2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero norm -> unnormalized
      Row(3L, Array.empty[Float]),               // empty -> empty
      Row(4L, null),                             // null input -> null
      Row(5L, Array(-0.0f, 0.0f, -0.0f, 0.0f)))  // sign preservation at n=0
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val got = df.select(col("id"),
        graft.sim.Similarity.normalized(col("v")).as("n"),
        hofNormalized(col("v")).as("h"))
      .orderBy("id").collect()
    got.foreach { r =>
      val n = Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]])
      val h = Option(r.get(2)).map(_.asInstanceOf[scala.collection.Seq[Double]])
      assert(n.map(_.length) == h.map(_.length), s"id=${r.getLong(0)}")
      (n, h) match {
        case (Some(nv), Some(hv)) =>
          nv.zip(hv).foreach { case (x, y) =>
            assert(java.lang.Double.compare(x, y) == 0,
              s"id=${r.getLong(0)}: $x vs $y") }
        case (None, None) => ()
        case other => fail(s"id=${r.getLong(0)}: nullability diverged $other")
      }
    }
  }

  test("NormalizedVector null element yields an all-null array like the HOF fold") {
    val rows = Seq(Row(1L, Seq[java.lang.Double](1.0, null, 2.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val r = df.select(graft.sim.Similarity.normalized(col("v")).as("n"),
      hofNormalized(col("v")).as("h")).head()
    val n = r.getSeq[Any](0)
    val h = r.getSeq[Any](1)
    assert(n.length == 3 && h.length == 3)
    assert(n.forall(_ == null), s"native: $n")
    assert(h.forall(_ == null), s"hof: $h")
  }

  // --- FeatureHashEmbedding: fused kernel vs the unfused chain ------------

  test("FeatureHashEmbedding matches the unfused counts->norm->divide chain") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "  "),            // token-less -> NULL (was dropped by norm > 0)
      (3L, ""),
      (4L, "x y z x y z x"),
      (5L, null.asInstanceOf[String]))
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val raw = graft.text.FeatureHashCounts.ofColumn(col("text"), 16)
    val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    val unfused = df.select(col("doc_id"),
        when(nrm > 0, transform(raw, x => x / nrm)).as("e"))
    val fused = df.select(col("doc_id"),
      graft.text.FeatureHashEmbedding.ofColumn(col("text"), 16).as("e"))
    val u = unfused.orderBy("doc_id").collect()
    val f = fused.orderBy("doc_id").collect()
    u.zip(f).foreach { case (a, b) =>
      val av = Option(a.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]])
      val bv = Option(b.get(1)).map(_.asInstanceOf[scala.collection.Seq[Double]])
      assert(av.isDefined == bv.isDefined, s"doc=${a.getLong(0)}")
      for (x <- av; y <- bv)
        x.zip(y).foreach { case (p, q) =>
          assert(java.lang.Double.compare(p, q) == 0, s"doc=${a.getLong(0)}") }
    }
  }
}
