package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders (driver-generated parquet, see TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /**
   * events plus a derived `ts_us` column (microseconds since epoch, LONG).
   * The driver has shipped `ts` as either TIMESTAMP(NANOS) parquet (read as
   * LONG nanos via spark.sql.legacy.parquet.nanosAsLong=true) or
   * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); both normalize to the same
   * `ts_us`. Oracle comparisons use `ts_us` = DuckDB `epoch_us(ts)`; the
   * session timezone is pinned to UTC so the NTZ→epoch cast is deterministic.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsUs)
  }

  /** Session config every entry point needs (nanos parquet + stable shuffles). */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
}
