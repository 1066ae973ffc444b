package graft.text

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Specs for the r18 boilerplate-span removal: the [[UncoveredTokens]]
  * pointer-merge expression and the [[Dedup.removeDuplicatedSpans]] plan. */
class RemoveSpansSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def arr(xs: String*) = new GenericArrayData(
    xs.map(x => UTF8String.fromString(x): AnyRef).toArray)
  private def ints(xs: Int*) = new GenericArrayData(xs.map(x => Int.box(x): AnyRef).toArray)
  private def run(toks: Seq[String], starts: Seq[Int], k: Int): Seq[String] = {
    val out = UncoveredTokens.compute(arr(toks: _*), ints(starts: _*), k)
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  test("UncoveredTokens: empty starts keeps everything, in order") {
    run(Seq("a", "b", "c"), Seq(), 5) shouldBe Seq("a", "b", "c")
  }

  test("UncoveredTokens: single span drops exactly k positions") {
    run(Seq("a", "b", "c", "d", "e", "f", "g"), Seq(0), 5) shouldBe Seq("f", "g")
    run(Seq("a", "b", "c", "d", "e", "f", "g"), Seq(2), 5) shouldBe Seq("a", "b")
  }

  test("UncoveredTokens: overlapping spans cover their union") {
    // starts 0 and 3 with k=5 cover positions 0..7 of 10
    val toks = ('a' to 'j').map(_.toString)
    run(toks, Seq(0, 3), 5) shouldBe Seq("i", "j")
  }

  test("UncoveredTokens: disjoint spans leave the gap between them") {
    // k=2, starts 0 and 4 over 6 tokens: covered {0,1,4,5}, kept {2,3}
    run(Seq("a", "b", "c", "d", "e", "f"), Seq(0, 4), 2) shouldBe Seq("c", "d")
  }

  test("UncoveredTokens: span past the array end clamps; full cover empties") {
    run(Seq("a", "b"), Seq(0), 5) shouldBe Seq.empty
    run(Seq.empty[String], Seq(), 3) shouldBe Seq.empty
  }

  test("removeDuplicatedSpans: cross-doc 5-grams are cut from all carriers") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b c d e f g"),        // "a b c d e" shared with doc 1 -> cut 0..4
      (1L, "z a b c d e"),          // shared span starts at 1 -> cut 1..5
      (2L, "x x x x x x x x x x"),  // within-doc repeat only: df(distinct)=1, kept
      (3L, "tiny")                  // shorter than k: passes through
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, k = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("n_words"), r.getAs[Long]("n_kept")))).toMap
    out(0L) shouldBe (("f g", 7L, 2L))
    out(1L) shouldBe (("z", 6L, 1L))
    out(2L) shouldBe (("x x x x x x x x x x", 10L, 10L))
    out(3L) shouldBe (("tiny", 1L, 1L))
  }

  test("removeDuplicatedSpans: minDocFreq raises the cut threshold") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e g"),
      (2L, "h i j k l m")
    ).toDF("doc_id", "text")
    // the shared span appears in 2 docs; minDocFreq=3 must keep everything
    val out = Dedup.removeDuplicatedSpans(df, k = 5, minDocFreq = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_kept")).toMap
    out shouldBe Map(0L -> 6L, 1L -> 6L, 2L -> 6L)
  }
}
