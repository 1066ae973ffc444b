package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Robust trend estimation, relationally. The reference's trend tooling is
 * OLS-based (e.g. the regression inside its stat tests); OLS slope breaks
 * down under the spike outliers a raw event log carries, so a robust
 * estimator is the practical companion to `TimeSeriesOps.outliers`.
 */
object RobustRegression {

  /**
   * Theil–Sen estimator per key: slope = exact median over all point pairs
   * (i < j) of (v_j - v_i) / (j - i) on the series' 0-based position index,
   * intercept = median(v_i - slope * i). Breakdown point 29%.
   *
   * Spark-first shape: the pair set is a SELF-JOIN WITHIN THE KEY — one
   * hash shuffle of the indexed points, then pairs form inside each key's
   * partition. Pair count is O(len²) per series, bounded by series length,
   * NOT corpus size: the engine's design point (SURVEY §6) is each series
   * fits in memory, so len² stays executor-local work (len=1000 → 500k
   * pairs) while keys scale out arbitrarily. Medians are exact
   * `percentile`, partial-aggregated — nothing collects.
   */
  /**
   * `gridScale`: when set (e.g. 1e9), every median INPUT is first quantized
   * to integers on the 1/gridScale grid. A p50 over integer-valued doubles
   * is exact no matter which interpolation formula an engine uses (sums and
   * halves of integers below 2^52 are exactly representable), so the result
   * is bit-identical across engines — whereas medians of raw doubles differ
   * in the last ulp between interpolation formulas, and a 1500-key run
   * reliably lands a few of those on any rounding boundary. The quantized
   * estimator differs from the raw one by at most 1/gridScale — far inside
   * the estimator's own noise.
   */
  def theilSen(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value", gridScale: Option[Double] = None): DataFrame = {
    val q: Column => Column = gridScale match {
      case Some(g) => c => round(c * g, 0)
      case None => identity
    }
    val unq: Column => Column = gridScale match {
      case Some(g) => c => c / g
      case None => identity
    }
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val idx = df
      .select(col(key), col(ts), col(value).cast("double").as("v"))
      .withColumn("i", (row_number().over(w) - 1).cast("double"))
      .drop(ts)
    val a = idx.select(col(key), col("i").as("i1"), col("v").as("v1"))
    val b = idx.select(col(key), col("i").as("i2"), col("v").as("v2"))
    val slopes = a.join(b, Seq(key)).filter(col("i1") < col("i2"))
      .select(col(key), q((col("v2") - col("v1")) / (col("i2") - col("i1"))).as("s"))
    val slope = slopes.groupBy(col(key))
      .agg(unq(percentile(col("s"), lit(0.5))).as("slope"))
    idx.join(slope, Seq(key))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        first(col("slope")).as("slope"),
        unq(percentile(q(col("v") - col("slope") * col("i")), lit(0.5)))
          .as("intercept"))
  }
}
