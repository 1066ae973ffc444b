package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Gopher n-gram repetition signals (tx26): hand-computed fixtures for both
  * signal families (the sf0.01 corpus never repeats a 5-gram, so the driver
  * row only exercises the top-n path — the dup-n path is pinned HERE), plus
  * an exact equivalence sweep against an independent collections-based
  * reimplementation. */
class NgramRepetitionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def signals(texts: String*): Seq[Map[String, Any]] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextFunctions.ngramRepetitionSignals(df).orderBy("doc_id").collect().toSeq
      .map(r => r.schema.fieldNames.map(f => f -> r.getAs[Any](f)).toMap)
  }

  test("top n-gram char fractions, hand-computed (may exceed 1 on degenerate text)") {
    val m = signals("a b a b a b c").head
    m("n_tokens") shouldBe 7L
    m("n_token_chars") shouldBe 7L
    // "a b" occurs 3x, 2 chars -> 6/7
    m("top_2gram_char_frac") shouldBe 6.0 / 7.0
    // "a b a" / "b a b" both 2x, 3 chars -> 6/7
    m("top_3gram_char_frac") shouldBe 6.0 / 7.0
    // "a b a b" occurs 2x, 4 chars -> 8/7 > 1 (published definition)
    m("top_4gram_char_frac") shouldBe 8.0 / 7.0
    // no 5-gram repeats
    (5 to 10).foreach(n => m(s"dup_${n}gram_char_frac") shouldBe 0.0)
  }

  test("duplicate n-gram char fractions cover each character once") {
    val m = signals("x y x y x y x y z").head
    m("n_tokens") shouldBe 9L
    // 5-grams at 0..4: positions 0..7 covered by the two duplicated grams
    m("dup_5gram_char_frac") shouldBe 8.0 / 9.0
    // 6-grams: "x y x y x y" at 0 and 2 -> positions 0..7
    m("dup_6gram_char_frac") shouldBe 8.0 / 9.0
    // no duplicated 7..10-grams
    (7 to 10).foreach(n => m(s"dup_${n}gram_char_frac") shouldBe 0.0)
  }

  test("short and empty documents score zero") {
    val Seq(one, empty) = signals("hello", "")
    one("n_tokens") shouldBe 1L
    one("n_token_chars") shouldBe 5L
    empty("n_tokens") shouldBe 1L // split semantics: "" -> [""]
    empty("n_token_chars") shouldBe 0L
    for (m <- Seq(one, empty); k <- m.keys if k.endsWith("_frac"))
      m(k) shouldBe 0.0
  }

  test("matches an independent collections-based implementation exactly") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "c", "dd", "e")
    val texts = Seq.fill(60) {
      Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    def naive(text: String): Seq[Double] = {
      val toks = text.split(" ", -1).toVector
      val total = toks.map(_.length).sum
      val tops = (2 to 4).map { n =>
        if (toks.length < n || total == 0) 0.0
        else {
          val byG = toks.sliding(n).toVector.groupBy(identity)
            .view.mapValues(_.size).toMap
          val maxCnt = byG.values.max
          val maxChars = byG.collect {
            case (g, c) if c == maxCnt => g.map(_.length).sum
          }.max
          maxCnt.toDouble * maxChars / total
        }
      }
      val dups = (5 to 10).map { n =>
        if (toks.length < n || total == 0) 0.0
        else {
          val grams = toks.sliding(n).toVector
          val cnt = grams.groupBy(identity).view.mapValues(_.size).toMap
          val covered = grams.indices
            .flatMap(i => if (cnt(grams(i)) >= 2) i until i + n else Nil).toSet
          covered.toSeq.map(p => toks(p).length).sum.toDouble / total
        }
      }
      tops ++ dups
    }
    val fracNames = Seq("top_2gram_char_frac", "top_3gram_char_frac",
      "top_4gram_char_frac") ++ (5 to 10).map(n => s"dup_${n}gram_char_frac")
    val got = signals(texts: _*)
    texts.zip(got).foreach { case (t, m) =>
      val expect = naive(t)
      fracNames.zip(expect).foreach { case (name, e) =>
        withClue(s"text='$t' $name: ") { m(name) shouldBe e }
      }
    }
  }
}
