package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden-file checks for the seeded LSH / ANN queries (dd03/dd04/dd06/
 * sm02/sm03). These outputs are deterministic (fixed seeds) but not
 * SQL-expressible, so the driver's DuckDB harness can only count their rows —
 * a silent drift in the PAIR SETS would go unnoticed. The sf0.01 outputs are
 * frozen as checked-in CSVs; any change to signatures, banding, probing, or
 * verification that alters a single pair fails here with a line-level diff.
 *
 * Doubles are rounded to 6 decimals on both sides, so the check pins the
 * selected pairs and their similarity values, not the last float bits.
 */
class GoldenSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.01"

  private def fmt(v: Any): String = v match {
    case d: Double => f"$d%.6f"
    case f: Float  => f"${f.toDouble}%.6f"
    case x         => x.toString
  }

  private def lines(df: DataFrame, cols: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.col
    df.select(cols.map(col): _*)
      .collect()
      .map(r => cols.indices.map(i => fmt(r.get(i))).mkString(","))
      .sorted.toSeq
  }

  private def golden(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/goldens/$name.csv")
    require(in != null, s"missing golden $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.sorted
    finally in.close()
  }

  private def check(name: String, df: DataFrame, cols: Seq[String]): Unit = {
    val got = lines(df, cols)
    val want = golden(name)
    val missing = want.diff(got)
    val extra = got.diff(want)
    assert(missing.isEmpty && extra.isEmpty,
      s"$name drifted: ${missing.size} missing (${missing.take(3).mkString("; ")}), " +
        s"${extra.size} extra (${extra.take(3).mkString("; ")})")
  }

  test("dd03 minhash near-dup pairs match the frozen sf0.01 golden") {
    check("dd03_minhash_neardup",
      SparkEntry.queries("dd03_minhash_neardup")(spark, sfDir),
      Seq("id_a", "id_b", "jaccard"))
  }

  test("dd04 simhash near-dup pairs match the frozen sf0.01 golden") {
    check("dd04_simhash_neardup",
      SparkEntry.queries("dd04_simhash_neardup")(spark, sfDir),
      Seq("id_a", "id_b", "hamming"))
  }

  test("dd06 embedding near-dup pairs match the frozen sf0.01 golden") {
    check("dd06_embedding_neardup",
      SparkEntry.queries("dd06_embedding_neardup")(spark, sfDir),
      Seq("id_a", "id_b", "cosine"))
  }

  test("sm02 LSH top-k matches the frozen sf0.01 golden") {
    check("sm02_knn_lsh",
      SparkEntry.queries("sm02_knn_lsh")(spark, sfDir),
      Seq("query_id", "rank", "neighbor_id", "cosine"))
  }

  test("sm03 IVF top-k matches the frozen sf0.01 golden") {
    check("sm03_knn_ivf",
      SparkEntry.queries("sm03_knn_ivf")(spark, sfDir),
      Seq("query_id", "rank", "neighbor_id", "cosine"))
  }

  test("sp01 spline pipeline matches the frozen sf0.01 golden") {
    // the spline KERNEL is driver-certified by mr12's closed-form literals;
    // this pins the full daily-resample -> conform -> fill -> melt pipeline
    // (not SQL-expressible: DuckDB has no natural-cubic interpolator)
    check("sp01_spline_series",
      SparkEntry.queries("sp01_spline_series")(spark, sfDir),
      Seq("key", "day_us", "value"))
  }

  test("sm04 PQ top-k matches the frozen sf0.01 golden") {
    check("sm04_knn_pq",
      SparkEntry.queries("sm04_knn_pq")(spark, sfDir),
      Seq("query_id", "rank", "neighbor_id", "cosine"))
  }
}
