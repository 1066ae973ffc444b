package graft.models

import org.scalatest.funsuite.AnyFunSuite

/** Certification-kernel spec: every recovery check passes locally, and the
  * kernel-emitted check names match the static lists the DuckDB oracles are
  * built from (drift here would silently turn a driver green into a red). */
class RecoverySpec extends AnyFunSuite {

  private lazy val all = Recovery.allLocal()

  test("every recovery check passes") {
    val failed = for ((g, cs) <- all; c <- cs if !c.ok)
      yield s"$g/${c.key}/${c.check} err=${c.err}"
    assert(failed.isEmpty, s"failed checks: ${failed.mkString(", ")}")
  }

  test("kernel check names match the oracle lists") {
    for ((g, cs) <- all) {
      val emitted = cs.filter(_.key == "s1").map(_.check)
      assert(emitted == Recovery.checkNames(g), s"group $g drifted")
      // every key present emits the same checks in the same order
      for (k <- cs.map(_.key).distinct if k != "s1")
        assert(cs.filter(_.key == k).map(_.check) == emitted, s"$g/$k differs")
    }
  }

  test("oracle SQL enumerates keys x checks") {
    for ((g, names) <- Recovery.checkNames) {
      val sql = Recovery.oracleFor(g)
      assert(sql.startsWith("SELECT * FROM (VALUES"))
      for (n <- names) assert(sql.contains(s"'$n'"), s"$g missing $n")
      assert(sql.sliding(6).count(_ == "('s1',") == names.size)
    }
  }

  test("kernels are deterministic across invocations") {
    val again = Recovery.arimaKernel("s1", 101L)
    val first = all.toMap.apply("arima").filter(_.key == "s1")
    assert(again.map(c => (c.check, c.ok, c.err)) ==
      first.map(c => (c.check, c.ok, c.err)))
  }
}
