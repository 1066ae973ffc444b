package graft.text

import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Specs for the r18 sequence-packing operator: hand-computed offsets,
  * the two-phase == single-range equivalence (the distributed cumsum must
  * not depend on the range count), and the planner summary. */
class PackingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("sequencePacking: hand-computed offsets and sequence spans") {
    val s = spark
    import s.implicits._
    val df = Seq(
      0L -> "a b c d",            // 4 tokens, offset 0,  seq 0..0
      1L -> "e f g h i j k l",    // 8 tokens, offset 4,  tokens 4..11 -> seq 0..1
      2L -> "m n o p q r"         // 6 tokens, offset 12, tokens 12..17 -> seq 1..1
    ).toDF("doc_id", "text")
    val out = Packing.sequencePacking(df, capacity = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    out(0L) shouldBe ((4L, 0L, 0L, 0L))
    out(1L) shouldBe ((8L, 4L, 0L, 1L))
    out(2L) shouldBe ((6L, 12L, 1L, 1L))
  }

  test("sequencePacking: range count does not change the result") {
    val s = spark
    import s.implicits._
    // sparse, shuffled ids so ranges are non-trivial
    val df = (0 until 200).map(i => ((i * 937) % 100000).toLong ->
      (("tok " * (1 + i % 17)).trim)).toDF("doc_id", "text")
    def run(ranges: Int) = Packing.sequencePacking(df, 64, numRanges = ranges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    run(1) shouldBe run(7)
    run(7) shouldBe run(32)
  }

  test("binPacking: next-fit closes bins on overflow; oversized doc gets its own") {
    val s = spark
    import s.implicits._
    val df = Seq(
      0L -> ("w " * 4).trim,   // 4 -> bin 0 (fill 4)
      1L -> ("w " * 8).trim,   // 4+8 > 10 -> bin 1 (fill 8)
      2L -> ("w " * 6).trim,   // 8+6 > 10 -> bin 2 (fill 6)
      3L -> ("w " * 12).trim,  // oversized -> bin 3 alone
      4L -> ("w " * 3).trim    // 12+3 > 10 -> bin 4
    ).toDF("doc_id", "text")
    // explicit whole-corpus domain: the next-fit rule itself is under test
    val out = Packing.binPacking(df, capacity = 10, domainSize = 1000).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    // tighter fits share bins; an exact fill (3+3+4 = 10) does NOT overflow
    val df2 = Seq(0L -> "a b c", 1L -> "d e f", 2L -> "g h i j",
      3L -> "k l m n m o").toDF("doc_id", "text")
    val out2 = Packing.binPacking(df2, capacity = 10, domainSize = 1000).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out2 shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L)
  }

  test("binPacking: domainSize 0 auto-derives multiple parallel domains") {
    val s = spark
    import s.implicits._
    // 2000 docs; until r20 the default was ONE global sequential domain
    val df = (0L until 2000L).map(i => i -> ("w " * (1 + (i % 5)).toInt).trim)
      .toDF("doc_id", "text")
    val out = Packing.binPacking(df, capacity = 10)
    val nDomains = out.select("domain").distinct().count()
    nDomains should be > 1L
    // ~rows/defaultParallelism per domain: population is near-balanced
    val sizes = out.groupBy("domain").count().collect().map(_.getLong(1))
    sizes.max.toDouble / sizes.min should be < 3.0
    // each domain still obeys next-fit: no bin exceeds capacity (every
    // doc here is <= capacity, so no single-doc overflow bins exist)
    out.groupBy("domain", "bin").agg(sum("n_tokens").as("fill"))
      .filter(col("fill") > 10).count() shouldBe 0L
    // and the id->domain assignment is monotone (range sharding)
    val byDomain = out.collect().map(r => (r.getLong(2), r.getLong(0)))
      .groupBy(_._1).view.mapValues(v => (v.map(_._2).min, v.map(_._2).max))
    byDomain.toSeq.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => hi should be < lo
      case _ =>
    }
  }

  test("binPacking: domains pack independently with bins restarting per domain") {
    val s = spark
    import s.implicits._
    val df = (0L until 40L).map(i => i -> ("w " * 7).trim).toDF("doc_id", "text")
    val out = Packing.binPacking(df, capacity = 10, domainSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // 7 tokens per doc, capacity 10: every doc gets its own bin, numbered
    // 0..9 within each 10-doc domain
    out.foreach { case (id, domain, bin) =>
      domain shouldBe id / 10
      bin shouldBe id % 10
    }
  }

  test("sequencePacking: non-numeric ids fail fast with the contract message") {
    val s = spark
    import s.implicits._
    val df = Seq("doc-a" -> "x y z", "doc-b" -> "w").toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Packing.sequencePacking(df, capacity = 10)
    }
    e.getMessage should include("must be a numeric column")
    e.getMessage should include("corpusShuffle")
  }

  test("corpusShuffle: positions are a dense md5-ordered permutation, range-invariant") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (((i * 937) % 100000).toLong, s"doc $i"))
      .toDF("doc_id", "text")
    def run(ranges: Int) = Packing.corpusShuffle(df, Seq("doc_id"), ranges)
      .select("doc_id", "shuffle_key", "position").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = run(0)
    // dense 0..n-1
    out.map(_._3).sorted shouldBe (0L until 500L).toArray
    // ascending by shuffle key
    out.sortBy(_._3).map(_._2).sliding(2).foreach {
      case Array(a, b) => a should be < b
      case _ =>
    }
    // the local driver-side truth: rank of md5(doc_id)
    val expected = out.map { case (id, _, _) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      id -> d.map("%02x".format(_)).mkString
    }.sortBy(_._2).map(_._1).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    out.foreach { case (id, _, pos) => pos shouldBe expected(id) }
    // two-phase machinery is range-count-invariant
    run(1).toSet shouldBe out.toSet
    run(7).toSet shouldBe out.toSet
  }

  test("tokenBudgetSample: md5-order prefix, boundary doc included, range-invariant") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, ("w " * (5 + i % 11)).trim))
      .toDF("doc_id", "text")
    def run(ranges: Int) = Packing.tokenBudgetSample(df, budget = 200L,
        numRanges = ranges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run(0)
    // driver-side truth: hashlib-equivalent md5 order, greedy prefix
    val md = (id: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var acc = 0L
    val want = (0L until 100L).map(i => (i, 5L + i % 11)).sortBy(t => md(t._1))
      .flatMap { case (id, n) =>
        val keep = acc < 200L; val off = acc; acc += n
        if (keep) Some((id, n, off)) else None
      }.toSet
    out.toSet shouldBe want
    // the crossing doc is INCLUDED: total reaches at least the budget
    out.map(_._2).sum should be >= 200L
    // and no kept doc starts at/after the budget
    out.foreach(_._3 should be < 200L)
    // two-phase machinery is range-count-invariant
    run(1).toSet shouldBe out.toSet
    run(7).toSet shouldBe out.toSet
  }

  test("packingSummary: totals, boundary docs, and tail waste") {
    val s = spark
    import s.implicits._
    val df = Seq(
      0L -> "a b c d",
      1L -> "e f g h i j k l",
      2L -> "m n o p q r"
    ).toDF("doc_id", "text")
    val r = Packing.packingSummary(df, capacity = 10).head()
    r.getLong(0) shouldBe 18L // total_tokens
    r.getLong(1) shouldBe 3L  // n_docs
    r.getLong(2) shouldBe 2L  // n_sequences
    r.getLong(3) shouldBe 1L  // n_boundary_docs (doc 1 spans seq 0->1)
    r.getLong(4) shouldBe 2L  // tail waste: 2*10 - 18
  }
}
