package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for st04's checkpoint-restore replay path at scale (r19
  * verdict item #5): the same two-phase harness as the driver query, with
  * the phases timed separately —
  *   phase1  = on-time replay that writes the checkpoint;
  *   restore = restart from that checkpoint with NO new input (pure
  *             recovery: offset-log read, state-store reload, no-op
  *             trigger — the overhead a production restart pays before
  *             any data flows);
  *   phase2  = restart with the late rows appended (restore + one real
  *             micro-batch against the recovered watermark).
  * args: [reps]. Env: SPARK_GRAFT_SF_DIR. */
object ProbeSt04 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dayUs = 86400000000L
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir)
      .withColumn("bucket", col("ts_us") - pmod(col("ts_us"), lit(dayUs)))
    val maxB = ev.agg(max("bucket")).head().getLong(0)
    val wmThresh = maxB - 2 * dayUs
    val lateCond = pmod(col("user_id"), lit(5)) === 2 && col("bucket") =!= wmThresh
    val feed = ev.select(col("user_id"),
      timestamp_micros(col("ts_us")).as("ts"), col("value"), lateCond.as("late"))
    feed.persist().count()

    for (r <- 1 to reps) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_probest04_").toString
      feed.filter(!col("late")).drop("late")
        .write.mode("overwrite").parquet(s"$tmp/in")
      val inSchema = feed.drop("late").schema
      def replay(): Unit = {
        val stream = spark.readStream.schema(inSchema).parquet(s"$tmp/in")
        val out = graft.streaming.StreamingResample.tumblingModes(stream,
          dayUs, count(_), closedRight = false, stampRight = false,
          watermark = "2 days", key = "user_id")
        val q = out.writeStream
          .outputMode("update")
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.write.mode("append").parquet(s"$tmp/out")
          }
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val t1 = timed(replay())
      val tRestore = timed(replay()) // no new files: pure recovery
      feed.filter(col("late")).drop("late")
        .write.mode("append").parquet(s"$tmp/in")
      val t2 = timed(replay())
      val n = spark.read.parquet(s"$tmp/out").count()
      println(f"[probest04] rep$r phase1=$t1%7.2f s  restore=$tRestore%6.2f s  " +
        f"phase2=$t2%7.2f s  outRows=$n")
      // best-effort cleanup
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => try java.nio.file.Files.deleteIfExists(p)
          catch { case _: Exception => () })
    }
    spark.stop()
  }
}
