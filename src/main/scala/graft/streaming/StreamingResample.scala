package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Structured Streaming surface for the engine. The reference is batch-only
 * (SURVEY §2.7); these lift the resample/stats semantics onto streams the
 * Spark-native way: event-time windows + watermarks for late data, and
 * mapGroupsWithState for custom per-key running state (EWMA).
 */
object StreamingResample {

  /**
   * Tumbling resample on a stream of observations
   * `(key, ts TIMESTAMP, value)`: per-key windowed aggregate with a
   * watermark bounding state for late data.
   */
  def tumbling(stream: DataFrame, width: String, watermark: String,
      aggFn: Column => Column, key: String = "key", ts: String = "ts",
      value: String = "value"): DataFrame =
    stream.withWatermark(ts, watermark)
      .groupBy(col(key), window(col(ts), width))
      .agg(aggFn(col(value)).as(value))
      .select(col(key), col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col(value))

  /** Sliding-window mean on a stream (window duration + slide). */
  def sliding(stream: DataFrame, width: String, slide: String, watermark: String,
      key: String = "key", ts: String = "ts", value: String = "value"): DataFrame =
    stream.withWatermark(ts, watermark)
      .groupBy(col(key), window(col(ts), width, slide))
      .agg(avg(col(value)).as("mean"), count(lit(1)).as("n"))
      .select(col(key), col("window.start").as("bucket_start"), col("mean"), col("n"))

  case class Obs(key: String, value: Double)
  case class EwmaState(s: Double)
  case class EwmaOut(key: String, smoothed: Double)

  /**
   * Streaming EWMA: per-key exponential smoothing state maintained with
   * mapGroupsWithState — the streaming twin of models.EWMAModel's recursion.
   */
  def streamingEwma(stream: DataFrame, alpha: Double, key: String = "key",
      value: String = "value"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(key).cast("string").as("key"), col(value).cast("double").as("value"))
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout()) {
        (k: String, rows: Iterator[Obs], state: GroupState[EwmaState]) =>
          var s = state.getOption.map(_.s).getOrElse(Double.NaN)
          rows.foreach { o =>
            s = if (s.isNaN) o.value else alpha * o.value + (1 - alpha) * s
          }
          state.update(EwmaState(s))
          EwmaOut(k, s)
      }.toDF()
  }
}
