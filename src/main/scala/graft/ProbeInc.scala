package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe (r18): incremental dedup vs full re-run. The production question
 * [[graft.text.Dedup.incrementalMinhashNearDuplicates]] exists to answer:
 * when a daily batch (here the top 1% of doc ids) lands on an already-indexed
 * corpus, what does deduping the batch cost vs re-running the full pipeline
 * on corpus+batch? The index ([[graft.text.Dedup.minhashIndex]] of the other
 * 99%) is MATERIALIZED to parquet before timing, as in production where it
 * persists between ingests; its one-off build cost is reported separately.
 * Run with SPARK_GRAFT_SF_DIR at sf0.1 / /tmp/sf1 / /tmp/sf10 for the
 * 1x/10x/100x series (see SCALE.md). Pair counts ride along as the
 * correctness invariant: inc pairs == full pairs touching the batch.
 */
object ProbeInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    // batch = top ~1% of DOCS by id (quantile, not max-id arithmetic: the
    // scale fixtures replicate ids into sparse ranges)
    val cut = docs.stat.approxQuantile("doc_id", Array(0.99), 0.0001)(0)
    val old = docs.filter(col("doc_id") <= cut)
    val batch = docs.filter(col("doc_id") > cut)
    println(s"[probeinc] sf=$sfDir corpus=${old.count()} batch=${batch.count()}")

    val idxDir = java.nio.file.Files.createTempDirectory("graft_inc_index_")
      .toAbsolutePath.toString
    val t0 = System.nanoTime()
    graft.text.Dedup.minhashIndex(old).write.mode("overwrite").parquet(idxDir)
    println(f"[probeinc] index build+write ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    // streaming replay fixture: the batch with synthetic event times (2020
    // base — epoch 0 would fall behind the initial watermark and drop)
    val replayDir = java.nio.file.Files.createTempDirectory("graft_inc_replay_")
      .toAbsolutePath.toString
    val batchTs = batch.withColumn("event_time",
      timestamp_seconds(lit(1577836800L) + col("doc_id") % 3600))
    batchTs.write.mode("overwrite").parquet(replayDir)
    try {
      for (r <- 1 to reps) {
        val t1 = System.nanoTime()
        val nFull = graft.text.Dedup.minhashNearDuplicates(docs,
          k = 3, numHashes = 64, bands = 16, threshold = 0.3).count()
        val t2 = System.nanoTime()
        val idx = spark.read.parquet(idxDir)
        val incDf = graft.text.Dedup.incrementalMinhashNearDuplicates(batch, idx,
          k = 3, numHashes = 64, bands = 16, threshold = 0.3)
        val nInc = incDf.count()
        val t3 = System.nanoTime()
        val nIncIdx = incDf.filter(col("from_index")).count() // untimed: parity ref
        val t3b = System.nanoTime()
        // streaming leg: availableNow replay of the SAME batch against the
        // SAME index through the stream-static operator; its pair count
        // must equal inc's from_index pairs (parity invariant at scale)
        val stream = spark.readStream.schema(batchTs.schema).parquet(replayDir)
        val sink = s"probeinc_sink_$r"
        val q = graft.streaming.StreamingDedup.streamingNearDupAgainstIndex(
            stream, idx, threshold = 0.3)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        val nStream = spark.table(sink).count()
        val t4 = System.nanoTime()
        println(f"[probeinc] rep$r full=${(t2 - t1) / 1e9}%7.2f s pairs=$nFull" +
          f"  inc=${(t3 - t2) / 1e9}%7.2f s pairs=$nInc (vs-index $nIncIdx)" +
          f"  stream=${(t4 - t3b) / 1e9}%7.2f s pairs=$nStream" +
          (if (nStream == nIncIdx) " PARITY" else " MISMATCH"))
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(replayDir)).deleteRecursively()
      new Directory(new java.io.File(idxDir)).deleteRecursively()
    }
    spark.stop()
  }
}
