package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Machine-checkable digest re-freeze contract (VERDICT r17 #2; ADVICE r16
 * carried). The 21 sf0.01-frozen `*_digest` constants in
 * `SparkEntry.oracleSql` are regression locks, not independent oracles — a
 * failing twin must never be silenced by re-freezing unless the paired
 * recovery/recall certification is green on the new code. That contract
 * used to live only in README prose; this spec makes a violation a build
 * failure:
 *
 *  - every frozen constant in the code must byte-match its row in
 *    `src/test/resources/digest_manifest.json` — so changing a constant
 *    WITHOUT updating the manifest (i.e. without producing fresh evidence)
 *    fails `sbt test`;
 *  - every manifest row must name its paired cert queries (which must
 *    exist in `SparkEntry.queries`, so a renamed cert can't silently
 *    orphan a twin) and carry dated evidence text;
 *  - `tools/refreeze.py <twin>` is the sanctioned way to produce a new
 *    manifest row: it re-runs the twin and its certs at sf0.01, refuses
 *    unless every cert compares OK against its DuckDB oracle, and writes
 *    the new digest + cert compare lines here, making the re-freeze
 *    auditable from the git history of the manifest alone.
 */
class DigestFreezeSpec extends AnyFunSuite with Matchers {

  private val constantRe =
    """(?s)^\s*SELECT '([0-9a-f]{32})' AS digest, (\d+)::BIGINT AS n_pairs\s*$""".r

  private def frozenConstants: Map[String, (String, Long)] =
    SparkEntry.oracleSql.collect {
      case (name, sql) if name.endsWith("_digest") =>
        sql.trim match {
          case constantRe(md5, n) => name -> (md5, n.toLong)
          case other => fail(s"$name: digest oracle is not a frozen constant SELECT: $other")
        }
    }

  private def manifest: Map[String, Map[String, Object]] = {
    val in = getClass.getResourceAsStream("/digest_manifest.json")
    in should not be null
    val root = new ObjectMapper().readValue(in, classOf[java.util.Map[String, Object]])
    root.get("twins").asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      .map { case (k, v) => k -> v.asInstanceOf[java.util.Map[String, Object]].asScala.toMap }
  }

  test("every frozen digest constant matches the committed manifest (re-freeze needs evidence)") {
    val code = frozenConstants
    val man = manifest
    withClue("twin set drift between SparkEntry.oracleSql and digest_manifest.json: ") {
      code.keySet shouldBe man.keySet
    }
    for ((name, (md5, n)) <- code) {
      val row = man(name)
      withClue(s"$name: constant re-frozen without manifest evidence — run tools/refreeze.py $name: ") {
        row("digest") shouldBe md5
        row("n_pairs").asInstanceOf[Number].longValue shouldBe n
      }
    }
  }

  test("every manifest row names live paired certs and carries dated evidence") {
    val queryNames = SparkEntry.queries.keySet
    for ((name, row) <- manifest) {
      val certs = row("certs").asInstanceOf[java.util.List[Object]].asScala.map(_.toString)
      withClue(s"$name: ") {
        certs should not be empty
        for (c <- certs if !c.startsWith("GoldenSpec:"))
          withClue(s"paired cert $c must be a live driver query: ") {
            queryNames should contain(c)
          }
        val ev = row("evidence").asInstanceOf[java.util.Map[String, Object]].asScala
        ev("date").toString should fullyMatch regex """\d{4}-\d{2}-\d{2}"""
        ev("detail").toString should not be empty
        // evidence must speak to every named cert
        for (c <- certs)
          withClue(s"evidence detail must cover cert $c: ") {
            ev("detail").toString should include(c.split(":").head)
          }
      }
    }
  }
}
