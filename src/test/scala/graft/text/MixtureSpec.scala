package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Specs for the r18 mixture operators: the per-source token allocation
  * plan and its deterministic epoch-upsampling materialization. */
class MixtureSpec extends AnyFunSuite with Matchers with SparkTestSession {

  // two sources: "big" 20 tokens over 2 docs, "small" 5 tokens over 1 doc
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "big", ("w " * 12).trim),
      (1L, "big", ("w " * 8).trim),
      (2L, "small", ("w " * 5).trim)
    ).toDF("doc_id", "source", "text")
  }

  test("mixturePlan: allocation honours weights and the epoch cap") {
    val plan = TextFunctions.mixturePlan(corpus,
        Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 100L, maxEpochs = 4.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    // big: min(100*0.5, 20*4) = 50 tokens -> 2.5 epochs
    plan("big") shouldBe ((2L, 20L, 50.0, 2.5))
    // small: min(50, 5*4=20) = 20 -> capped at maxEpochs 4.0
    plan("small") shouldBe ((1L, 5L, 20.0, 4.0))
  }

  test("mixtureUpsample: floor copies everywhere plus md5-selected fractional copies") {
    val out = TextFunctions.mixtureUpsample(corpus,
        Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 100L, maxEpochs = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val copies = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // big epochs 2.5: frac rule u = md5(id)[0,8)/16^8 < 0.5 -> u(0)=0.8117,
    // u(1)=0.7687, both >= 0.5 -> no extra copy, 2 whole copies each
    copies(0L) shouldBe Seq(1L, 2L)
    copies(1L) shouldBe Seq(1L, 2L)
    // small epochs 4.0 exactly: frac 0 -> no extra, 4 whole copies
    copies(2L) shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("mixtureUpsample: fractional selection is unbiased for structured ids") {
    val s = spark
    import s.implicits._
    // block-allocated ids, all congruent 0 mod 10000 — the r18 positional
    // rule (id%10000)/10000 < frac selected ALL of them for any frac > 0;
    // the md5 rule keys on the hash, so the realized fraction tracks frac
    val planted = (0 until 8).map(k =>
      (k * 10000L, "src", ("w " * 4).trim)).toDF("doc_id", "source", "text")
    // 8 docs x 4 tokens = 32; alloc = min(80, 32*4) = 80 -> epochs 2.5
    val out = TextFunctions.mixtureUpsample(planted, Map("src" -> 1.0),
      tokenBudget = 80L, maxEpochs = 4.0)
    val perDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // u < 0.5 for ids 30000/40000/50000/60000/70000 -> exactly 5 of 8 get
    // the third copy (realized 0.625 ~ frac 0.5; old rule: 8 of 8 = 1.0)
    perDoc.values.count(_ == 3L) shouldBe 5
    perDoc.values.count(_ == 2L) shouldBe 3
    Seq(30000L, 40000L, 50000L, 60000L, 70000L).foreach(id =>
      perDoc(id) shouldBe 3L)
  }

  test("mixturePlan: degenerate text and weight-0 sources never yield NaN epochs") {
    val s = spark
    import s.implicits._
    // null text, empty text, unweighted source — the nearest degenerate
    // inputs (split(' ') counts '' as one token, so n_tokens = 0 only via
    // the guarded branch; the guard pins 0.0 there rather than 0/0 = NaN)
    val df = Seq((0L, "full", "a b c"), (1L, "empty", ""),
        (2L, "nulls", null: String))
      .toDF("doc_id", "source", "text")
    val plan = TextFunctions.mixturePlan(df,
        Map("full" -> 0.5, "empty" -> 0.5), tokenBudget = 10L)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    plan.values.exists(_.isNaN) shouldBe false
    // unweighted source: alloc 0 -> epochs 0.0 -> upsample emits no copies
    plan("nulls") shouldBe 0.0
    TextFunctions.mixtureUpsample(df, Map("full" -> 0.5, "empty" -> 0.5),
      tokenBudget = 10L).filter("source = 'nulls'").count() shouldBe 0L
  }

  test("mixtureUpsample: weight 0 sources emit nothing") {
    // budget 30 -> big epochs 1.5, so every big doc keeps >= 1 whole copy
    // regardless of which ids the md5 rule picks for the fractional one
    val out = TextFunctions.mixtureUpsample(corpus, Map("big" -> 1.0),
      tokenBudget = 30L, maxEpochs = 4.0)
    out.filter("source = 'small'").count() shouldBe 0L
    out.filter("source = 'big'").count() should be > 0L
  }
}
