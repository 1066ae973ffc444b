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
   * events with `ts` read as LONG nanos (requires
   * spark.sql.legacy.parquet.nanosAsLong=true — Spark cannot read
   * TIMESTAMP(NANOS) parquet natively) plus a derived `ts_us` column.
   * Oracle comparisons use `ts_us` because DuckDB truncates the same
   * parquet to microsecond timestamps on read.
   */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts_us", expr("ts div 1000"))

  /** Session config every entry point needs (nanos parquet + stable shuffles). */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
}
