package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for [[graft.text.Packing.corpusShuffle]] over the FULL
  * documents table (the smp18 driver query is output-bounded by the
  * mixture token budget, so it under-exercises the rank machinery at
  * scale; this ranks every doc). args: [reps]. */
object ProbeShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.text.Packing.corpusShuffle(docs, Seq("doc_id"))
        .queryExecution.toRdd.count()
      println(f"[probeshuffle] rep$r ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
