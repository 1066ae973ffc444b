package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footers, scheduler) so the first
    // timed query doesn't absorb ~10s of one-time startup cost
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    // a crashed query must fail LOUDLY: its error is recorded per-query in
    // the JSON (never a silent time-to-crash masquerading as a fast pass)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val tag = if (err.isDefined) " FAILED" else ""
      System.err.println(f"[bench] $name%-28s $secs%8.2f s$tag")
      (name, secs, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the driver keeps only a bounded tail of stdout; with 70+ queries a
    // full-precision line overflows it and head-truncates into unparseable
    // JSON (BENCH_r03 "parsed": null) — 3-decimal seconds keep it compact
    def f3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => s"\"$k\":${f3(v)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val failed = results.count(_._3.isDefined)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) {
      System.err.println(s"[bench] $failed quer${if (failed == 1) "y" else "ies"} FAILED")
      sys.exit(1)
    }
  }
}
