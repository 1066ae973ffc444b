package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev evidence runner (r21): counts Spark JOBS and completed STAGES while a
  * named SparkEntry query builds + materializes — the honest "plan" metric
  * for queries whose returned frame is a LocalRelation of eagerly-computed
  * booleans (rc*, mr*): their cost is job count, not the final plan shape.
  * Args: name... (one warm-up construction first, then the counted run). */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    for (name <- args.toSeq; fn = SparkEntry.queries(name)) {
      fn(spark, sfDir).count() // warm-up: codegen + any first-run setup
      Thread.sleep(300)        // let the listener bus drain
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probejobs] $name%-28s jobs=${jobs.get}%3d stages=${stages.get}%3d $secs%7.2f s")
    }
    spark.stop()
  }
}
