package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DateTimeIndex

/**
 * Sources/sinks with index sidecars (capability of reference
 * saveAsParquetDataFrame / timeSeriesRDDFromParquet / CSV round trip —
 * TimeSeriesRDD.scala:498-551, 750-780 — re-expressed: plain parquet/CSV via
 * the DataFrame writer plus a `_index` sidecar holding DateTimeIndex.tag).
 */
object TimeSeriesIO {

  private def sidecar(path: String) = Paths.get(path, "_index")

  /** Write a series-layout frame `(key, series ARRAY<DOUBLE>)` + index sidecar. */
  def writeSeriesParquet(df: DataFrame, index: DateTimeIndex, path: String): Unit = {
    df.write.mode("overwrite").parquet(path)
    Files.writeString(sidecar(path), index.tag)
  }

  /** Read a series-layout frame and its sidecar index back. */
  def readSeriesParquet(spark: SparkSession, path: String): (DataFrame, DateTimeIndex) = {
    val idx = DateTimeIndex.parse(
      new String(Files.readAllBytes(sidecar(path)), StandardCharsets.UTF_8).trim)
    (spark.read.parquet(path), idx)
  }

  /** CSV round trip for the series layout: key,v0,v1,... + sidecar. */
  def writeSeriesCsv(df: DataFrame, index: DateTimeIndex, path: String): Unit = {
    val n = index.size
    val cols = col("key") +: (0 until n).map(i => col("series").getItem(i).as(s"v$i"))
    df.select(cols: _*).write.mode("overwrite").option("header", "true").csv(path)
    Files.writeString(sidecar(path), index.tag)
  }

  def readSeriesCsv(spark: SparkSession, path: String): (DataFrame, DateTimeIndex) = {
    val idx = DateTimeIndex.parse(
      new String(Files.readAllBytes(sidecar(path)), StandardCharsets.UTF_8).trim)
    val raw = spark.read.option("header", "true").csv(path)
    val n = idx.size
    val series = array((0 until n).map(i => col(s"v$i").cast("double")): _*)
    (raw.select(col("key"), series.as("series")), idx)
  }

  /**
   * Yahoo-finance-style OHLCV CSV reader (capability of reference
   * parsers/YahooParser.scala:24-48): header Date,Open,High,Low,Close,
   * Volume,Adj Close; possibly reverse-chronological; one or many files.
   * Emits long observations `(key, ts_nanos, value)` with the key prefixed
   * per source file ("<prefix>Open", ...), like the reference's per-file
   * keying — but via input_file_name(), not wholeTextFiles.
   */
  /**
   * Bucketed-table sink for co-located joins at scale: hash-bucket the
   * observations by series key (and sort within buckets) so every
   * subsequent key-join or key-window against an identically-bucketed
   * table plans WITHOUT an exchange — the shuffle is paid once at write
   * time, not per query. This is the batch-layout half of the 100 TB
   * story: persist the canonical observations bucketed by key, and the
   * per-key operators (lags/fills/fits) read shuffle-free.
   */
  def writeBucketedObservations(df: DataFrame, table: String, buckets: Int,
      key: String = "key", ts: String = "ts_nanos"): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key, ts)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed observations table (bucket metadata comes from the
    * catalog, so Catalyst plans bucket-local joins/aggregations). */
  def readBucketedObservations(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def readYahooCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
      .withColumn("__file", regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))
    val fields = Seq("Open", "High", "Low", "Close", "Volume", "Adj Close")
    val stacked = fields.map { f =>
      raw.select(
        concat(col("__file"), lit("_"), lit(f.replace(" ", ""))).as("key"),
        (unix_timestamp(to_date(col("Date"))) * 1000000000L).as("ts_nanos"),
        col(s"`$f`").cast("double").as("value"))
    }.reduce(_ unionByName _)
    stacked.filter(col("value").isNotNull)
  }
}
