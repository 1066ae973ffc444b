package graft

import java.io.File
import java.util.concurrent.TimeUnit

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Python parity as an ENFORCED gate (VERDICT r17 #4): `sbt test` alone used
 * to stay green when a py4j facade drifted, because the Python package and
 * parity sweeps were REQUIRED-by-documentation only
 * (`.claude/skills/verify/SKILL.md` §4). This spec shells out to the two
 * gate scripts, so a red facade now fails the suite itself. Cancels
 * (not passes) when python3/pyspark are unavailable, so the gate can't be
 * silently satisfied by a missing interpreter.
 *
 * The scripts each start their own PySpark JVM over the compiled classes
 * (`target/scala-2.13/classes`, present under sbt test by construction) —
 * ~60 s combined, the price of making facade drift a build failure.
 */
class PythonGateSpec extends AnyFunSuite with Matchers {

  private val repo = new File(".").getCanonicalFile

  private def pythonWithPyspark: Option[String] =
    Seq("python3", "python").find { py =>
      try Process(Seq(py, "-c", "import pyspark"), repo).!(ProcessLogger(_ => ())) == 0
      catch { case _: Exception => false }
    }

  private def runGate(py: String, script: String): (Int, String) = {
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'), l => buf.append(l).append('\n'))
    val proc = Process(Seq(py, s"tools/$script", "/root/testdata/sf0.001"), repo).run(logger)
    // generous ceiling; a hung gateway should fail the gate, not wedge sbt
    val exit = concurrent.Future(proc.exitValue())(concurrent.ExecutionContext.global)
    val code = try concurrent.Await.result(exit,
      concurrent.duration.Duration(10, TimeUnit.MINUTES))
    catch { case _: concurrent.TimeoutException => proc.destroy(); -1 }
    (code, buf.toString)
  }

  test("python package + pyspark parity gates are green (facade drift fails sbt test)") {
    val py = pythonWithPyspark
    assume(py.isDefined, "python3 with pyspark not available — gate cancelled, not passed")
    for (script <- Seq("test_python_package.py", "pyspark_parity.py")) {
      val (code, out) = runGate(py.get, script)
      withClue(s"$script (tail):\n${out.linesIterator.toSeq.takeRight(25).mkString("\n")}\n") {
        code shouldBe 0
        out should include("OK")
      }
    }
  }

  test("refreeze dry-run: the cheapest manifested twin regenerates byte-identically") {
    // r20 (VERDICT r19 #7): digest drift — or a refreeze tool that would
    // rewrite an unchanged manifest row differently — must be red inside
    // `sbt test`, not discovered at the next sanctioned re-freeze.
    val py = pythonWithPyspark
    assume(py.isDefined, "python3 with pyspark not available — gate cancelled, not passed")
    val hasDuck =
      try Process(Seq(py.get, "-c", "import duckdb"), repo).!(ProcessLogger(_ => ())) == 0
      catch { case _: Exception => false }
    assume(hasDuck, "duckdb not available — gate cancelled, not passed")
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'), l => buf.append(l).append('\n'))
    val proc = Process(Seq(py.get, "tools/refreeze.py", "--check",
      "m44_ewma_fit_digest", "/root/testdata/sf0.01"), repo).run(logger)
    val exit = concurrent.Future(proc.exitValue())(concurrent.ExecutionContext.global)
    val code = try concurrent.Await.result(exit,
      concurrent.duration.Duration(10, TimeUnit.MINUTES))
    catch { case _: concurrent.TimeoutException => proc.destroy(); -1 }
    withClue(s"refreeze --check (tail):\n${buf.toString.linesIterator.toSeq.takeRight(15).mkString("\n")}\n") {
      code shouldBe 0
      buf.toString should include("REFREEZE CHECK OK")
    }
  }
}
