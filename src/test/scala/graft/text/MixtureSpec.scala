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

  test("mixtureUpsample: floor copies everywhere plus positional fractional copies") {
    val out = TextFunctions.mixtureUpsample(corpus,
        Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 100L, maxEpochs = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val copies = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // big epochs 2.5: frac rule (id%10000)/10000 < 0.5 -> ids 0 and 1 both
    // get the extra copy (0/10000=0 < 0.5, 1/10000 < 0.5) -> 3 copies each
    copies(0L) shouldBe Seq(1L, 2L, 3L)
    copies(1L) shouldBe Seq(1L, 2L, 3L)
    // small epochs 4.0 exactly: frac 0 -> no extra, 4 whole copies
    copies(2L) shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("mixtureUpsample: weight 0 sources emit nothing") {
    val out = TextFunctions.mixtureUpsample(corpus, Map("big" -> 1.0),
      tokenBudget = 10L, maxEpochs = 4.0)
    out.filter("source = 'small'").count() shouldBe 0L
    out.filter("source = 'big'").count() should be > 0L
  }
}
