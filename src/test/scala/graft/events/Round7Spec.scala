package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.sim.Embeddings
import graft.text.TextFunctions
import graft.ts.TimeSeriesOps

/** Specs for the round-6 diagnostic operators: drawdown, gap stats, value
  * entropy, mean crossings, shingle commonality, n-gram top-k, quality-tier
  * sampling, centroid similarity, inter-event gaps. */
class Round7Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("maxDrawdown finds the largest peak-to-trough drop and earliest trough") {
    val s = spark
    import s.implicits._
    // series: 1, 3, 2, 5, 1, 4 -> peak 5 at t=4, trough 1 at t=5: dd 4
    // key b: monotone rising -> dd 0, trough at the first instant
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 2.0),
      ("a", 4L, 5.0), ("a", 5L, 1.0), ("a", 6L, 4.0),
      ("b", 1L, 1.0), ("b", 2L, 2.0))
      .toDF("key", "ts_nanos", "value")
    val out = TimeSeriesOps.maxDrawdown(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    out shouldBe Map("a" -> (4.0, 5L), "b" -> (0.0, 1L))
  }

  test("gapStats reports count, max, sum and exact median of ts deltas") {
    val s = spark
    import s.implicits._
    // gaps for key a: 10, 30, 20 -> n=3, max=30, sum=60, p50=20
    val df = Seq(("a", 0L), ("a", 10L), ("a", 40L), ("a", 60L), ("b", 5L))
      .toDF("key", "ts_nanos")
    val out = TimeSeriesOps.gapStats(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    out shouldBe Map("a" -> (3L, 30L, 60L, 20.0)) // b has one obs: no gaps
  }

  test("valueEntropy is 0 for constant series and ln(2) for a 50/50 split") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("const", 7.0), ("const", 7.0), ("const", 7.0),
      ("split", 0.0), ("split", 0.0), ("split", 1.0), ("split", 1.0))
      .toDF("key", "value")
    val out = TimeSeriesOps.valueEntropy(df, bins = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    out("const")._1 shouldBe 3L
    out("const")._2 shouldBe 1L
    out("const")._3 shouldBe (0.0 +- 1e-12)
    out("split")._1 shouldBe 4L
    out("split")._2 shouldBe 2L
    out("split")._3 shouldBe (math.log(2.0) +- 1e-6)
  }

  test("meanCrossings counts sign flips around the mean and the longest run") {
    val s = spark
    import s.implicits._
    // values 1,5,1,5,5 (mean 3.4): above = 0,1,0,1,1 -> 3 crossings,
    // 3 above, longest above-run 2
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 5.0), ("a", 3L, 1.0),
      ("a", 4L, 5.0), ("a", 5L, 5.0)).toDF("key", "ts_nanos", "value")
    val r = TimeSeriesOps.meanCrossings(df).collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
      ((5L, 3L, 3L, 2L))
  }

  test("meanCrossings: all-below series has a zero longest run, not null") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 2.0)).toDF("key", "ts_nanos", "value")
    val r = TimeSeriesOps.meanCrossings(df).collect().head
    (r.getLong(2), r.getLong(4)) shouldBe ((0L, 0L)) // nothing strictly above the mean
  }

  test("shingleCommonality scores shared phrases, 0 for unique docs") {
    val s = spark
    import s.implicits._
    // doc 1 and 2 share their one 3-shingle; doc 3 is disjoint
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val out = TextFunctions.shingleCommonality(df, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    out(1L) shouldBe ((1L, 1L, 1.0))
    out(2L) shouldBe ((1L, 1L, 1.0))
    out(3L) shouldBe ((2L, 0L, 0.0))
  }

  test("topKNgrams counts 5-grams with doc frequency, ordered by count") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f"),       // 5-grams: "a b c d e", "b c d e f"
      (2L, "a b c d e"),         // "a b c d e"
      (3L, "x y"))               // too short: none
      .toDF("doc_id", "text")
    val out = TextFunctions.topKNgrams(df, n = 5, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(("a b c d e", 2L, 2L), ("b c d e f", 1L, 1L))
  }

  test("topKNgramsSketched equals the exact path above its support floor") {
    val s = spark
    import s.implicits._
    val docs = (1 to 40).map { i =>
      // "common phrase one two three" appears in every doc; per-doc noise
      // n-grams appear once each and sit below any support floor > 1
      (i.toLong, s"common phrase one two three noise$i a b c d")
    }.toDF("doc_id", "text")
    val exact = TextFunctions.topKNgrams(docs, n = 5, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sketched = TextFunctions.topKNgramsSketched(docs, n = 5, k = 5,
        minCount = 2, width = 1 << 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every exact top-5 entry with count >= minCount must appear identically
    sketched shouldBe exact.filter(_._2 >= 2)
    // and with minCount = 1 the two paths are exactly identical
    val sketchedAll = TextFunctions.topKNgramsSketched(docs, n = 5, k = 5,
        minCount = 1, width = 1 << 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    sketchedAll shouldBe exact
  }

  test("qualityTierSample keeps every high-tier doc and is deterministic") {
    val s = spark
    import s.implicits._
    // long stopword-rich docs score high; terse punctuation soup scores low
    val good = "the cat and the dog sat on the mat with a hat for the rat " +
      "and a bat in the vat of this that it was on and for with as is are"
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, s"$good extra$i") else (i, s"@@@!!! ## x$i")
    }.toDF("doc_id", "text")
    val once = TextFunctions.qualityTierSample(docs).collect()
    val twice = TextFunctions.qualityTierSample(docs.repartition(7)).collect()
    once.map(_.getLong(0)).sorted shouldBe twice.map(_.getLong(0)).sorted
    // a high-tier doc passes the 'g' bound unconditionally
    val nHigh = TextFunctions.qualityScore(docs)
      .filter(col("quality_score") >= 0.85).count()
    nHigh should be > 0L
    once.count(_.getString(1) == "high") shouldBe nHigh
  }

  test("centroidSimilarity: identical groups score 1, orthogonal score 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 1), // same direction
      (3L, Seq(0.0f, 2.0f), 2))                           // orthogonal
      .toDF("vec_id", "embedding", "label")
    val out = Embeddings.centroidSimilarity(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    out((0, 1)) shouldBe 1.0
    out((0, 2)) shouldBe 0.0
    out((1, 2)) shouldBe 0.0
  }

  test("linearTrendQuantized matches linearTrend to the grid resolution") {
    val s = spark
    import s.implicits._
    val df = (0 until 50).flatMap { i =>
      Seq(("a", i.toLong, 2.5 * i + 7.25 + math.sin(i) * 3.0),
        ("b", i.toLong, -0.75 * i + 100.0 + math.cos(i)))
    }.toDF("key", "ts_nanos", "value")
    val raw = TimeSeriesOps.linearTrend(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val qd = TimeSeriesOps.linearTrendQuantized(df, 1e6).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    for (k <- Seq("a", "b")) {
      qd(k)._1 shouldBe (raw(k)._1 +- 1e-4)
      qd(k)._2 shouldBe (raw(k)._2 +- 1e-3)
    }
  }

  test("theilSen grid quantization moves the estimate by at most the grid") {
    val s = spark
    import s.implicits._
    val df = ((0 until 30).map(i => ("a", i.toLong, 3.0 * i + 1.0)) :+
      (("a", 15L, 1000.0))).toDF("key", "ts_nanos", "value")
    val raw = graft.stats.RobustRegression.theilSen(df).collect().head
    val qd = graft.stats.RobustRegression
      .theilSen(df, gridScale = Some(1e9)).collect().head
    qd.getDouble(2) shouldBe (raw.getDouble(2) +- 1e-8)
    qd.getDouble(3) shouldBe (raw.getDouble(3) +- 1e-8)
  }

  test("madStats computes the exact median and median absolute deviation") {
    val s = spark
    import s.implicits._
    // values 1,2,3,10: median 2.5; |x-med| = 1.5,0.5,0.5,7.5 -> MAD 1.0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0))
      .toDF("key", "value")
    val r = TimeSeriesOps.madStats(df).collect().head
    (r.getLong(1), r.getDouble(2), r.getDouble(3)) shouldBe ((4L, 2.5, 1.0))
  }

  test("bursts finds the peak event count in a trailing time window") {
    val s = spark
    import s.implicits._
    // user 1: events at 0,10,20 then 3000 -> with a 100us window the first
    // three cluster (burst 3), the last is alone
    val df = Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 3000L), (2L, 5L))
      .toDF("user_id", "ts_us")
    val out = EventOps.bursts(df, windowUs = 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out shouldBe Map(1L -> (4L, 3L), 2L -> (1L, 1L))
  }

  test("interEventStats attributes the idle gap to the later event's type") {
    val s = spark
    import s.implicits._
    // user 1: a(0) b(10) a(40); user 2: b(0) b(5)
    // gaps: type b gets {10, 5}, type a gets {30}
    val df = Seq(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 40L, "a"),
      (2L, 0L, "b"), (2L, 5L, "b"))
      .toDF("user_id", "ts_us", "event_type")
    val out = EventOps.interEventStats(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    out shouldBe Map("b" -> (2L, 10L, 15L, 7.5), "a" -> (1L, 30L, 30L, 30.0))
  }

  test("intervalJoin: multi-bucket intervals, boundaries, and no duplicate matches") {
    val s = spark
    import s.implicits._
    // bucket = 10us; the 0..35 interval spans 4 buckets, the point at 15
    // must match it exactly ONCE; end is exclusive, start inclusive
    val intervals = Seq(
      (1L, 0L, 35L, "long"), (1L, 20L, 30L, "mid"),
      (1L, 50L, 50L, "empty"), (2L, 0L, 100L, "otherkey"))
      .toDF("user_id", "start_us", "end_us", "tag")
    val points = Seq((1L, 15L), (1L, 20L), (1L, 29L), (1L, 30L), (1L, 35L))
      .toDF("user_id", "ts_us")
    val out = EventOps.intervalJoin(points, intervals, bucketUs = 10L)
      .select("ts_us", "tag").collect().map(r => (r.getLong(0), r.getString(1)))
    out.groupBy(identity).view.mapValues(_.length).toMap.values.forall(_ == 1) shouldBe true
    out.toSet shouldBe Set(
      (15L, "long"), (20L, "long"), (29L, "long"), (30L, "long"), // 35 excluded
      (20L, "mid"), (29L, "mid")) // 30 excluded (end exclusive), empty matches nothing
  }

  test("intervalJoin matches the naive theta join on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val intervals = (0 until 60).map { i =>
      val st = rnd.nextInt(1000).toLong
      (rnd.nextInt(3).toLong, st, st + 1 + rnd.nextInt(120), i.toLong)
    }.toDF("user_id", "start_us", "end_us", "iv_id")
    val points = (0 until 200).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(1100).toLong, i.toLong))
      .toDF("user_id", "ts_us", "pt_id")
    val fast = EventOps.intervalJoin(points, intervals, bucketUs = 64L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.as("p").join(intervals.as("i"),
        $"p.user_id" === $"i.user_id" &&
          $"p.ts_us" >= $"i.start_us" && $"p.ts_us" < $"i.end_us")
      .select($"p.pt_id", $"i.iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    fast shouldBe naive
  }

  test("intervalJoin auto bucket (0) survives a long-interval mix exactly") {
    // r18 (VERDICT r17 #7): an EXPLICIT bucket far below the longest
    // interval is a silent fan-out blow-up (a year-long interval at a
    // 1-minute bucket explodes to ~525k rows). The default bucketUs=0
    // sizes the bucket from the data (longest interval length), capping
    // fan-out at 2 exploded rows per interval, and must stay exact.
    val s = spark
    import s.implicits._
    val yearUs = 31536000000000L
    val intervals = Seq(
      (1L, 0L, yearUs, "year"), (1L, 100L, 200L, "short"),
      (2L, 500L, 1500L, "otherkey"))
      .toDF("user_id", "start_us", "end_us", "tag")
    val points = Seq((1L, 0L), (1L, 150L), (1L, yearUs - 1), (1L, yearUs),
      (2L, 999L)).toDF("user_id", "ts_us")
    val auto = EventOps.intervalJoin(points, intervals)
      .select("ts_us", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    auto shouldBe Set((0L, "year"), (150L, "year"), (150L, "short"),
      (yearUs - 1, "year"), (999L, "otherkey"))
    // documented fan-out cap under the auto bucket (b = longest length):
    // (end-1) div b - start div b + 1 <= 2 for every interval
    val fanout = Seq((0L, yearUs), (100L, 200L), (500L, 1500L))
      .map { case (st, en) => (en - 1) / yearUs - st / yearUs + 1 }
    fanout.foreach(_ should be <= 2L)
    // degenerate: no valid intervals -> empty result, no failure
    EventOps.intervalJoin(points, intervals.filter(lit(false))).count() shouldBe 0L
  }

  test("intervalJoin auto bucket handles IntegerType interval columns") {
    // r20 (VERDICT r19 #5): the auto-bucket scalar agg's type follows the
    // interval columns — with Int start/end, max(end-start) is an Int and
    // the old row.getLong(0) threw ClassCastException before any join ran
    val s = spark
    import s.implicits._
    val intervals = Seq((1, 0, 35, "long"), (1, 20, 30, "mid"))
      .toDF("user_id", "start_us", "end_us", "tag")
    intervals.schema("start_us").dataType.typeName shouldBe "integer"
    val points = Seq((1, 15), (1, 25), (1, 35)).toDF("user_id", "ts_us")
    val out = EventOps.intervalJoin(points, intervals)
      .select("ts_us", "tag").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    out shouldBe Set((15, "long"), (25, "long"), (25, "mid"))
  }
}
