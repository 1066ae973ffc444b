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

  /**
   * Tumbling resample with the batch operator's four closedRight x
   * stampRight boundary modes (reference Resample.scala:62-86, same
   * semantics as ts.TimeSeriesOps.resample): the bucket is computed with
   * the SAME long arithmetic on the event-time micros, so an availableNow
   * replay of a batch table produces bit-identical buckets. closed-right
   * sends an exact-boundary timestamp to the PRECEDING bucket; stamp-right
   * labels the bucket by its end instead of its start.
   *
   * The watermark is declared on the DERIVED bucket timestamp, not the raw
   * event time: Spark's event-time metadata does not survive expression
   * arithmetic, so watermarking `ts` and then grouping by a computed column
   * would leave the aggregation state unbounded and append mode rejected by
   * the analyzer (the watermark would be inert). With the watermark on the
   * group key itself, append mode emits and evicts a bucket once the
   * watermark passes its label.
   *
   * ==Watermark sizing (BEHAVIOR CHANGE in r17)==
   * `watermark` here is lateness measured on BUCKET LABELS, not raw event
   * times. Because a bucket's label can precede its latest member event by
   * up to one width (closed-left stamping), size `watermark` as the
   * tolerated raw-event lateness PLUS one bucket width — a raw event `t`
   * whose label `t - (t mod width)` has fallen behind the watermark is
   * dropped even when `t` itself is within the stated delay. Before r17 the
   * watermark was declared on the raw event column and was INERT (state
   * never evicted, append mode rejected); callers who sized it as raw
   * lateness must widen by one width when upgrading, or use
   * [[tumblingModesLateness]], which does that widening internally and
   * keeps the raw-lateness contract. Both the drop rule and the state
   * eviction are pinned by `StreamingSpec` ("update mode: late rows drop
   * and state evicts").
   */
  def tumblingModes(stream: DataFrame, widthUs: Long, aggFn: Column => Column,
      closedRight: Boolean, stampRight: Boolean, watermark: String,
      originUs: Long = 0L, key: String = "key", ts: String = "ts",
      value: String = "value"): DataFrame = {
    val tsUs = unix_micros(col(ts))
    val m = pmod(tsUs - originUs, lit(widthUs))
    val bucketStart =
      if (!closedRight) tsUs - m
      else when(m === 0, tsUs - widthUs).otherwise(tsUs - m)
    val stamp = if (stampRight) bucketStart + widthUs else bucketStart
    stream
      .withColumn("__bucket", timestamp_micros(stamp.cast("long")))
      .withWatermark("__bucket", watermark)
      .groupBy(col(key), col("__bucket"))
      .agg(aggFn(col(value)).as(value))
      .select(col(key), col("__bucket").as("bucket_ts"), col(value))
  }

  /**
   * [[tumblingModes]] with the watermark expressed as tolerated lateness on
   * RAW event times (the pre-r17 mental model): internally widens the
   * bucket-column watermark by one bucket width, so an event no more than
   * `lateness` behind the newest event seen is always merged into its
   * bucket regardless of where the bucket boundary falls. `lateness` is a
   * calendar-interval string ("15 minutes"); the widened delay is
   * `lateness + widthUs microseconds`.
   */
  def tumblingModesLateness(stream: DataFrame, widthUs: Long,
      aggFn: Column => Column, closedRight: Boolean, stampRight: Boolean,
      lateness: String, originUs: Long = 0L, key: String = "key",
      ts: String = "ts", value: String = "value"): DataFrame =
    tumblingModes(stream, widthUs, aggFn, closedRight, stampRight,
      watermark = s"$lateness $widthUs microseconds", originUs, key, ts, value)

  /**
   * Streaming gap sessionization: Spark's native `session_window` merges
   * events whose gaps are under `gap` into one growing window per key; a
   * session emits once the watermark passes its close. The streaming twin of
   * `events.EventOps.sessionize` — same gap semantics, with
   * `session_end = last event + gap` (the window's close, Spark's
   * convention) rather than the batch operator's last-event timestamp.
   * State per open session is one window + the aggregates — bounded by the
   * watermark, not by history.
   */
  def streamingSessions(stream: DataFrame, gap: String, watermark: String,
      key: String = "key", ts: String = "ts", value: String = "value"): DataFrame =
    stream.withWatermark(ts, watermark)
      .groupBy(col(key), session_window(col(ts), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(value)).as("sum_value"))
      .select(col(key), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

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

  case class TsObs(key: String, seq: Long, value: Double)
  case class WelfordState(n: Long, mean: Double, m2: Double)
  case class OutlierOut(key: String, seq: Long, value: Double, zScore: Double)

  /**
   * Streaming z-score outlier detection: per-key running mean/variance via
   * Welford's algorithm in flatMapGroupsWithState, emitting observations
   * whose z-score against the statistics seen SO FAR exceeds the threshold.
   * The online twin of TimeSeriesOps.outliers (which scores against the
   * whole series); state is three numbers per key, so cardinality — not
   * history length — bounds memory. For unbounded key cardinality pass
   * `stateTtl` (e.g. "1 hour"): idle keys' state is dropped after that
   * much processing time, matching how a production stateful operator
   * bounds its state store (a key seen again later simply re-warms).
   *
   * Constant-prefix semantics: while all values seen so far are identical
   * (sample sd == 0) the z-score is undefined, so nothing is flagged — not
   * even an obvious spike — mirroring the batch operator, where
   * TimeSeriesOps.zScores yields null z on a zero-sd series. The spike
   * itself inflates sd, so SUBSEQUENT deviations are flagged normally.
   */
  def streamingOutliers(stream: DataFrame, threshold: Double, minObs: Int = 10,
      key: String = "key", seq: String = "ts_nanos",
      value: String = "value", stateTtl: Option[String] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream.select(col(key).cast("string").as("key"), col(seq).cast("long").as("seq"),
        col(value).cast("double").as("value"))
      .as[TsObs]
      .groupByKey(_.key)
      .flatMapGroupsWithState[WelfordState, OutlierOut](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        (k: String, rows: Iterator[TsObs], state: GroupState[WelfordState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
            val out = Seq.newBuilder[OutlierOut]
            // micro-batch arrival order is not event order; sort the batch so
            // results are deterministic given the same batch boundaries
            rows.toSeq.sortBy(_.seq).foreach { o =>
              if (st.n >= minObs) {
                val sd = math.sqrt(st.m2 / (st.n - 1))
                if (sd > 0 && math.abs((o.value - st.mean) / sd) > threshold)
                  out += OutlierOut(k, o.seq, o.value, (o.value - st.mean) / sd)
              }
              val n1 = st.n + 1
              val d = o.value - st.mean
              val mean1 = st.mean + d / n1
              st = WelfordState(n1, mean1, st.m2 + d * (o.value - mean1))
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }.toDF()
  }

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
