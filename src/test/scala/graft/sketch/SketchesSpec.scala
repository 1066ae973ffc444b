package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The qs* certifications must hold at the smallest SF too — a sketch whose
  * error bound only holds on big data is mis-parameterized. */
class SketchesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def allOk(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    rows should not be empty
    for (r <- rows)
      withClue(s"${r.getString(0)}/${r.getString(1)}: ") {
        r.getBoolean(2) shouldBe true
      }
  }

  test("qs01: HLL distinct within 3 rsd, global and per-group") {
    allOk(Sketches.hll(spark, sfDir))
  }

  test("qs02: GK quantiles within the published rank error") {
    allOk(Sketches.quantiles(spark, sfDir))
  }

  test("qs03: count-min never underestimates, overestimate bounded") {
    allOk(Sketches.cms(spark, sfDir))
  }

  test("qs04: Bloom has no false negatives and bounded fp rate") {
    allOk(Sketches.bloom(spark, sfDir))
  }
}
