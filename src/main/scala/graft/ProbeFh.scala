package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Matched A/B: old explode+groupBy feature-hash plan vs the
  * FeatureHashCounts expression plan, interleaved reps in one session. */
object ProbeFh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val dim = 64
    def oldPlan(df: DataFrame): DataFrame = {
      val bucketed = df
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("__b", pmod(graft.text.RollingHash.ofColumn(col("tok")), lit(dim.toLong)))
      val sums = (0 until dim).map(b =>
        sum(when(col("__b") === b, 1L).otherwise(0L)).as(s"__c$b"))
      bucketed.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .withColumn("__raw", array((0 until dim).map(b => col(s"__c$b").cast("double")): _*))
        .withColumn("__norm", sqrt(aggregate(col("__raw"), lit(0.0), (a, x) => a + x * x)))
        .select(col("doc_id"), transform(col("__raw"), x => x / col("__norm")).as("embedding"))
    }
    def newPlan(df: DataFrame): DataFrame =
      graft.text.TextFunctions.featureHashEmbedding(df, dim)
    def time(name: String, f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[fhab] $name%-6s ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    for (rep <- 1 to 4) {
      time(s"old$rep", oldPlan(docs).select(posexplode(col("embedding"))).count())
      time(s"new$rep", newPlan(docs).select(posexplode(col("embedding"))).count())
    }
    spark.stop()
  }
}
