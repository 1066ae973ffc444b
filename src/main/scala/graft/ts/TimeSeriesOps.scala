package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{DateTimeIndex, Frequency, DurationFrequency, TimeUtils}

/**
 * Window alignment for rolling operators, mirroring the reference's
 * Left/Center/Right alignment on rollSum/rollMean
 * (reference: src/main/scala/com/cloudera/sparkts/TimeSeriesRDD.scala:611-642).
 */
object RollAlign extends Enumeration {
  val Left, Center, Right = Value
}

/**
 * Relational (observations-layout) time-series operators.
 *
 * The canonical layout is `(key STRING, ts_nanos LONG, value DOUBLE)` — one row
 * per observation; missing values are SQL nulls (NaN only inside array
 * payloads, converted at the boundary). Every operator is expressed with
 * Spark SQL window functions / aggregations so Catalyst plans the shuffles,
 * pushes filters to the scan, and whole-stage-codegens the arithmetic — there
 * is no driver-side iteration anywhere.
 *
 * Capability map (reference: src/main/scala/com/cloudera/sparkts/
 * TimeSeriesRDD.scala, UnivariateTimeSeries.scala — re-expressed, not ported):
 * lags, differences, quotients, returnRates, rollSum/rollMean, fills
 * (previous/next/nearest/linear/value/zero), trims, slice, seriesStats,
 * downsample/upsample, filterByInstant, removeInstantsWithNaNs, align/rebase,
 * resample, instants pivot.
 */
object TimeSeriesOps {

  private def wKey(key: String, ts: String) =
    Window.partitionBy(col(key)).orderBy(col(ts))

  /** NaN → null at the relational boundary (reference stores NaN; we use null). */
  def nanToNull(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.withColumn(valueCol, when(isnan(col(valueCol)), lit(null)).otherwise(col(valueCol)))

  /** null → NaN when handing arrays to model kernels. */
  def nullToNan(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol), lit(Double.NaN)))

  // ---------------------------------------------------------------- lagging

  /**
   * Add lag_1..lag_maxLag columns per key (equivalent of the reference's
   * `lags` with trimming — TimeSeriesRDD.scala:86-100; lag emitted as columns
   * rather than mangled keys, per SURVEY §1.2).
   * Rows whose full lag window precedes the series start are dropped when
   * `trim` is set (the reference always trims).
   */
  def lags(df: DataFrame, maxLag: Int, trim: Boolean = true,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    var out = df
    for (i <- 1 to maxLag) out = out.withColumn(s"lag_$i", lag(col(value), i).over(w))
    if (trim) {
      out = out.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > maxLag).drop("__rn")
    }
    out
  }

  /**
   * Per-key lag specification (reference TimeSeries.scala:58-158 /
   * Lag.scala:25-129: `lagsPerColumn` maps each series to its own
   * (keepOriginal, maxLag)). In the observations layout each key k gets
   * columns lag_1..lag_(spec(k)._2) populated (null beyond its own max),
   * rows with an incomplete lag window for THAT key are trimmed, and keys
   * with keepOriginal=false get a null value column. Keys absent from the
   * spec pass through untouched (no lags, no trimming) — matching the
   * reference, where unlisted columns are simply copied.
   * The spec is embedded as a literal map (driver-small by contract), so the
   * whole operator stays one window over the key partitioning — no join.
   */
  def lags(df: DataFrame, lagSpec: Map[String, (Boolean, Int)],
      key: String, ts: String, value: String): DataFrame = {
    require(lagSpec.nonEmpty, "lagSpec must not be empty")
    val globalMax = lagSpec.values.map(_._2).max
    val maxByKey = typedlit(lagSpec.map { case (k, (_, m)) => k -> m })
    val keepByKey = typedlit(lagSpec.map { case (k, (keep, _)) => k -> keep })
    val w = wKey(key, ts)
    val myMax = coalesce(element_at(maxByKey, col(key)), lit(0))
    var out = df.withColumn("__max", myMax)
    for (i <- 1 to globalMax)
      out = out.withColumn(s"lag_$i",
        when(lit(i) <= col("__max"), lag(col(value), i).over(w)))
    out.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > col("__max"))
      .withColumn(value,
        when(coalesce(element_at(keepByKey, col(key)), lit(true)), col(value)))
      .drop("__rn", "__max")
  }

  /** x_t - x_{t-n} per key; first n rows dropped (reference differences: TimeSeriesRDD.scala:113-119). */
  def differences(df: DataFrame, n: Int = 1, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(value, col(value) - lag(col(value), n).over(w))
      .filter(col("__rn") > n).drop("__rn")
  }

  /** x_t / x_{t-n} per key (reference quotients: TimeSeriesRDD.scala:121-127).
    * try_divide: a zero lagged value yields null (matching non-ANSI Spark and
    * the DuckDB double x/0 semantics) instead of throwing under ANSI mode. */
  def quotients(df: DataFrame, n: Int = 1, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(value, try_divide(col(value), lag(col(value), n).over(w)))
      .filter(col("__rn") > n).drop("__rn")
  }

  /** x_t / x_{t-1} - 1 (reference returnRates: TimeSeriesRDD.scala:129-131).
    * try_divide: null on a zero base value rather than an ANSI-mode throw. */
  def returnRates(df: DataFrame, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(value, try_divide(col(value), lag(col(value), 1).over(w)) - 1.0)
      .filter(col("__rn") > 1).drop("__rn")
  }

  // ---------------------------------------------------------------- rolling

  private def rollFrame(w: org.apache.spark.sql.expressions.WindowSpec,
      n: Int, align: RollAlign.Value) = align match {
    case RollAlign.Right  => w.rowsBetween(-(n - 1), 0)
    case RollAlign.Left   => w.rowsBetween(0, n - 1)
    case RollAlign.Center => w.rowsBetween(-((n - 1) / 2), n / 2)
  }

  /**
   * Sliding sum of width n. Only rows with a full window survive, mirroring
   * the reference's index re-slicing (TimeSeriesRDD.scala:611-626).
   */
  def rollSum(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, sum, key, ts, value)

  /** Sliding mean of width n (reference rollMean: TimeSeriesRDD.scala:631-647). */
  def rollMean(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, avg, key, ts, value)

  /** Sliding sample standard deviation of width n — the rolling-volatility
    * companion to rollMean (an extension beyond the reference's sum/mean). */
  def rollStd(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, stddev_samp, key, ts, value)

  /** Sliding minimum of width n. */
  def rollMin(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, min, key, ts, value)

  /** Sliding maximum of width n. */
  def rollMax(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, max, key, ts, value)

  private def rollAgg(df: DataFrame, n: Int, align: RollAlign.Value,
      aggFn: Column => Column, key: String, ts: String, value: String): DataFrame = {
    val w = wKey(key, ts)
    val cnt = count(col(value)).over(rollFrame(w, n, align))
    df.withColumn("__agg", aggFn(col(value)).over(rollFrame(w, n, align)))
      .withColumn("__cnt", cnt)
      .filter(col("__cnt") === n) // full windows only
      .withColumn(value, col("__agg"))
      .drop("__agg", "__cnt")
  }

  /** Sliding exact median of width n (robust rolling center — insensitive to
    * the spikes rollMean smears). Exact `percentile(0.5)`, not the t-digest
    * approximation: window width is a small constant, so the per-row sort
    * cost is O(n log n) with n fixed — engine-comparable results, no
    * approximation parameter to tune. */
  def rollMedian(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame =
    rollAgg(df, n, align, percentile(_, lit(0.5)), key, ts, value)

  /**
   * Sliding exact nearest-rank quantile of width n: the ceil(q·n)-th
   * smallest value of each full window (the quantile_disc convention —
   * an ELEMENT of the window, no interpolation arithmetic, so the result
   * is engine-exact and tie-robust where a continuous quantile is not).
   * Rolling p95/p99 is the standard latency/threshold monitor over event
   * series. Full windows only, same contract as the other roll ops.
   */
  def rollQuantile(df: DataFrame, n: Int, q: Double,
      align: RollAlign.Value = RollAlign.Right, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    require(q > 0 && q <= 1, "0 < q <= 1")
    // ceil with an epsilon: q*n can land just above an exact integer in
    // binary (0.07*100 = 7.000000000000001), which plain ceil rounds to the
    // NEXT rank, off-by-one vs the documented ceil(q·n)-th-smallest contract
    val idx = math.max(1, math.ceil(q * n - 1e-9).toInt)
    // the OVER must attach to the aggregate itself (collect_list); the
    // sort + element pick are post-window scalar ops
    val frame = rollFrame(wKey(key, ts), n, align)
    df.withColumn("__l", collect_list(col(value)).over(frame))
      .withColumn("__cnt", count(col(value)).over(frame))
      .filter(col("__cnt") === n) // full windows only
      .withColumn(value, element_at(sort_array(col("__l")), idx))
      .drop("__l", "__cnt")
  }

  /**
   * Classical additive seasonal decomposition (decompose-style):
   * trend = centered moving average of width `period` — for ODD periods a
   * plain `period`-row centered mean; for EVEN periods the standard
   * 2x-period MA (half weight on the two outermost of period+1 rows, the
   * R `stats::decompose` convention for monthly/quarterly data) — full
   * windows only, null at the edges; seasonal = per-phase mean of the
   * detrended values, phase = 0-based position in the series modulo
   * period; residual = value - trend - seasonal. Adds `trend`,
   * `seasonal`, `resid`.
   *
   * One shuffle on the key: the trend window, the phase column, and the
   * per-(key, phase) seasonal means all reuse the same hash partitioning
   * (the phase grouping key has the series key as a prefix), so no second
   * exchange is planned for the seasonal window.
   */
  def seasonalDecompose(df: DataFrame, period: Int, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    require(period >= 2, "seasonalDecompose needs period >= 2")
    val w = wKey(key, ts)
    val half = period / 2
    val frame = w.rowsBetween(-half, half)
    val trendExpr =
      if (period % 2 == 1)
        when(count(col(value)).over(frame) === period, avg(col(value)).over(frame))
      else
        // 2x-period MA over period+1 rows: endpoints at half weight, so
        // each of the period phases carries total weight 1/period
        when(count(col(value)).over(frame) === period + 1,
          (sum(col(value)).over(frame) -
            (first(col(value)).over(frame) + last(col(value)).over(frame)) / 2)
            / period)
    val trended = df
      .withColumn("__phase", ((row_number().over(w) - 1) % period).cast("long"))
      .withColumn("trend", trendExpr)
      .withColumn("__detr", col(value) - col("trend"))
    val wPhase = Window.partitionBy(col(key), col("__phase"))
    trended
      .withColumn("seasonal", avg(col("__detr")).over(wPhase))
      .withColumn("resid", col("__detr") - col("seasonal"))
      .drop("__detr", "__phase")
  }

  /**
   * Seasonal and trend strength per key (the STL-era diagnostics): over the
   * instants where the decomposition's trend exists,
   * `seasonal_strength = max(0, 1 − var(resid) / var(seasonal + resid))` and
   * `trend_strength = max(0, 1 − var(resid) / var(trend + resid))` — 0 means
   * the component explains nothing, near 1 means it dominates. One extra
   * aggregation over [[seasonalDecompose]]'s output, reusing its key
   * partitioning.
   */
  def seasonalStrength(df: DataFrame, period: Int, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame =
    seasonalDecompose(df, period, key, ts, value)
      .filter(col("trend").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        greatest(lit(0.0), lit(1.0) - try_divide(var_samp(col("resid")),
          var_samp(col("seasonal") + col("resid")))).as("seasonal_strength"),
        greatest(lit(0.0), lit(1.0) - try_divide(var_samp(col("resid")),
          var_samp(col("trend") + col("resid")))).as("trend_strength"))

  /**
   * Standardized CUSUM for mean-shift changepoint detection: the running
   * sum of (x - series mean) scaled by (series sd * sqrt(n)). A series with
   * a single mean shift has |cusum| peaking AT the shift; `cusumChangepoint`
   * reduces to one row per key — the argmax location and its statistic
   * (compare against ~1.36 for 95% confidence, Kolmogorov-style bound).
   * Two windows over ONE shuffle: the whole-partition stats window and the
   * cumulative window share the key partitioning.
   */
  def cusum(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    val wCum = wKey(key, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__mu", avg(col(value)).over(wAll))
      .withColumn("__den",
        stddev_samp(col(value)).over(wAll) * sqrt(count(col(value)).over(wAll)))
      .withColumn("cusum", try_divide(sum(col(value) - col("__mu")).over(wCum), col("__den")))
      .drop("__mu", "__den")
  }

  /** One row per key: the location where |cusum| peaks (earliest on ties)
    * and the peak statistic. */
  def cusumChangepoint(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame =
    cusum(df, key, ts, value)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(key)).orderBy(abs(col("cusum")).desc, col(ts))))
      .filter(col("__rk") === 1)
      .select(col(key), col(ts).as("changepoint_ts"), abs(col("cusum")).as("cusum_stat"))

  /**
   * Cross-correlation of two aligned series columns at leads 0..maxLag:
   * ccf_k = corr(x_t, y_{t+k}) per key, over the instants where both sides
   * exist. Wide output (`n_obs`, `ccf_0..ccf_maxLag`) — one lead window +
   * one aggregate reusing the key's partitioning.
   */
  def crossCorrelation(df: DataFrame, maxLag: Int, key: String = "key",
      ts: String = "ts_nanos", x: String = "x", y: String = "y"): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val w = wKey(key, ts)
    val withLeads = (1 to maxLag).foldLeft(df) { (d, l) =>
      d.withColumn(s"__y_$l", lead(col(y), l).over(w))
    }
    val aggs = count(lit(1)).as("n_obs") +:
      corr(col(x), col(y)).as("ccf_0") +:
      (1 to maxLag).map(l => corr(col(x), col(s"__y_$l")).as(s"ccf_$l"))
    withLeads.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------- fills

  /**
   * Missing-value imputation; methods mirror the reference dispatcher `fillts`
   * (UnivariateTimeSeries.scala:144-154). Missing = null here.
   */
  def fill(df: DataFrame, method: String, fillValue: Double = 0.0,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wPrevIncl = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(1, Window.unboundedFollowing)
    val wNextIncl = w.rowsBetween(0, Window.unboundedFollowing)
    method match {
      case "previous" => // LOCF
        df.withColumn(value, coalesce(col(value),
          last(col(value), ignoreNulls = true).over(wPrevIncl)))
      case "next" => // NOCB
        df.withColumn(value, coalesce(col(value),
          first(col(value), ignoreNulls = true).over(wNextIncl)))
      case "nearest" =>
        // closer of previous/next non-null; ties -> previous
        // (reference fillNearest semantics, UnivariateTimeSeries.scala:176-208)
        val loc = row_number().over(w)
        df.withColumn("__loc", loc)
          .withColumn("__pv", last(col(value), ignoreNulls = true).over(wPrev))
          .withColumn("__ploc", last(when(col(value).isNotNull, col("__loc")),
            ignoreNulls = true).over(wPrev))
          .withColumn("__nv", first(col(value), ignoreNulls = true).over(wNext))
          .withColumn("__nloc", first(when(col(value).isNotNull, col("__loc")),
            ignoreNulls = true).over(wNext))
          .withColumn(value, when(col(value).isNotNull, col(value))
            .when(col("__pv").isNotNull && (col("__nv").isNull ||
              (col("__loc") - col("__ploc") <= col("__nloc") - col("__loc"))), col("__pv"))
            .otherwise(col("__nv")))
          .drop("__loc", "__pv", "__ploc", "__nv", "__nloc")
      case "linear" =>
        // interior-gap interpolation on index position, like the reference
        // (UnivariateTimeSeries.scala:267-290: interpolates on loc, not time)
        val loc = row_number().over(w)
        df.withColumn("__loc", loc)
          .withColumn("__pv", last(col(value), ignoreNulls = true).over(wPrev))
          .withColumn("__ploc", last(when(col(value).isNotNull, col("__loc")),
            ignoreNulls = true).over(wPrev))
          .withColumn("__nv", first(col(value), ignoreNulls = true).over(wNext))
          .withColumn("__nloc", first(when(col(value).isNotNull, col("__loc")),
            ignoreNulls = true).over(wNext))
          .withColumn(value, when(col(value).isNotNull, col(value))
            .when(col("__pv").isNotNull && col("__nv").isNotNull,
              col("__pv") + try_divide((col("__nv") - col("__pv")) *
                (col("__loc") - col("__ploc")), col("__nloc") - col("__ploc"))))
          .drop("__loc", "__pv", "__ploc", "__nv", "__nloc")
      case "value" =>
        df.withColumn(value, coalesce(col(value), lit(fillValue)))
      case "zero" =>
        df.withColumn(value, coalesce(col(value), lit(0.0)))
      case "linearTime" =>
        // time-weighted variant (extension; interpolates on ts distance)
        df.withColumn("__pv", last(col(value), ignoreNulls = true).over(wPrev))
          .withColumn("__pts", last(when(col(value).isNotNull, col(ts)),
            ignoreNulls = true).over(wPrev))
          .withColumn("__nv", first(col(value), ignoreNulls = true).over(wNext))
          .withColumn("__nts", first(when(col(value).isNotNull, col(ts)),
            ignoreNulls = true).over(wNext))
          .withColumn(value, when(col(value).isNotNull, col(value))
            .when(col("__pv").isNotNull && col("__nv").isNotNull,
              col("__pv") + try_divide((col("__nv") - col("__pv")) *
                (col(ts) - col("__pts")).cast("double"),
                (col("__nts") - col("__pts")).cast("double"))))
          .drop("__pv", "__pts", "__nv", "__nts")
      case other => throw new IllegalArgumentException(s"no such fill method: $other")
    }
  }

  /** Keep only series whose first non-null observation is at or before t
    * (reference filterStartingBefore: TimeSeriesRDD.scala:140-145).
    * No broadcast hint: the kept-key set is one row per series, which on a
    * wide panel is unbounded — AQE picks the join strategy at runtime. */
  def filterStartingBefore(df: DataFrame, tTicks: Long, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val keep = df.filter(col(value).isNotNull)
      .groupBy(col(key)).agg(min(col(ts)).as("__first"))
      .filter(col("__first") <= tTicks).select(col(key))
    df.join(keep, Seq(key), "left_semi")
  }

  /** Keep only series whose last non-null observation is at or after t
    * (reference filterEndingAfter: TimeSeriesRDD.scala:147-151). */
  def filterEndingAfter(df: DataFrame, tTicks: Long, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val keep = df.filter(col(value).isNotNull)
      .groupBy(col(key)).agg(max(col(ts)).as("__last"))
      .filter(col("__last") >= tTicks).select(col(key))
    df.join(keep, Seq(key), "left_semi")
  }

  /** Spline fill on the series (array) layout — whole-series kernel via
    * mapSeries, since natural cubic splines need global knots. */
  def fillSpline(df: DataFrame, key: String = "key",
      seriesCol: String = "series"): DataFrame =
    mapSeries(df, graft.models.ArrayOps.fillSpline, key, seriesCol)

  /** Drop leading null observations per key (reference trimLeading: UnivariateTimeSeries.scala:101-110). */
  def trimLeading(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__seen", count(col(value)).over(w))
      .filter(col("__seen") > 0).drop("__seen")
  }

  /** Drop trailing null observations per key (reference trimTrailing: UnivariateTimeSeries.scala:112-120). */
  def trimTrailing(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts).rowsBetween(0, Window.unboundedFollowing)
    df.withColumn("__ahead", count(col(value)).over(w))
      .filter(col("__ahead") > 0).drop("__ahead")
  }

  // ---------------------------------------------------------------- slicing / decimation

  /** Keep observations with start <= ts <= end — pure pushdown-friendly predicate
    * (reference slice: TimeSeriesRDD.scala:218-233). */
  def slice(df: DataFrame, startNanos: Long, endNanos: Long,
      ts: String = "ts_nanos"): DataFrame =
    df.filter(col(ts) >= startNanos && col(ts) <= endNanos)

  /** Every-nth-observation decimation with phase (reference downsample:
    * UnivariateTimeSeries.scala:332-348). */
  def downsample(df: DataFrame, n: Int, phase: Int = 0, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    df.withColumn("__loc", row_number().over(w) - 1)
      .filter(pmod(col("__loc"), lit(n)) === phase)
      .drop("__loc")
  }

  /** Expand each series onto a denser index; new instants are null (then
    * optionally filled) — reference upsample semantics
    * (UnivariateTimeSeries.scala:350-373) expressed as align to the denser
    * grid. */
  def upsample(df: DataFrame, denseIndex: DateTimeIndex,
      fillMethod: Option[String] = None, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame =
    align(df, denseIndex, fillMethod, key, ts, value)

  /**
   * x_t minus the latest value at or before t - interval, per key — the
   * reference's differencesByFrequency as-of pattern (TimeSeries.scala:
   * 200-235, locAtOrBefore probe) as one RANGE window: no self-join, one
   * shuffle on the key.
   */
  def differencesByInterval(df: DataFrame, intervalTicks: Long,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rangeBetween(Window.unboundedPreceding, -intervalTicks)
    df.withColumn("__base", last(col(value), ignoreNulls = true).over(w))
      .withColumn(value, col(value) - col("__base"))
      .drop("__base")
  }

  /** Point lookup of one series (reference findSeries: TimeSeriesRDD.scala:105-107). */
  def findSeries(df: DataFrame, keyValue: String, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): Array[(Long, Double)] =
    df.filter(col(key) === keyValue).orderBy(col(ts))
      .select(col(ts).cast("long"), col(value).cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

  /** First-non-missing union of N observation frames, first frame winning
    * ties (reference TimeSeriesUtils.union: TimeSeriesUtils.scala:30-44 —
    * element-wise first-non-NaN sweep; its unbounded-scan/infinite-loop
    * bugs are not reproduced). Distributed as one tagged unionByName + a
    * min_by keyed aggregate: a single shuffle regardless of frame count,
    * NaN treated as missing like the reference. */
  def unionSeries(frames: Seq[DataFrame], key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    require(frames.nonEmpty, "union of no frames")
    val tagged = frames.zipWithIndex.map { case (f, i) =>
      f.select(col(key), col(ts), col(value).cast("double").as(value),
        lit(i).as("__pri"))
    }.reduce(_ unionByName _)
    tagged.filter(col(value).isNotNull && !isnan(col(value)))
      .groupBy(col(key), col(ts))
      .agg(min_by(col(value), col("__pri")).as(value))
  }

  /** Collect a series-layout frame `(key, series ARRAY<DOUBLE>)` into local
    * (keys, matrix) arrays sorted by key (reference collectAsTimeSeries:
    * TimeSeriesRDD.scala:96-103 — the whole panel must fit on the driver,
    * which is the reference's stated contract for this call too). */
  def collectAsTimeSeries(df: DataFrame, key: String = "key",
      seriesCol: String = "series"): (Array[String], Array[Array[Double]]) = {
    val rows = df.select(col(key).cast("string"), col(seriesCol))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Per-series whole-vector transform on the series layout (reference
    * mapSeries: TimeSeriesRDD.scala:249-260): each key's ARRAY<DOUBLE> is
    * passed through `f` executor-locally. */
  def mapSeries(df: DataFrame, f: Array[Double] => Array[Double],
      key: String = "key", seriesCol: String = "series"): DataFrame = {
    val fn = udf { (v: Seq[Double]) => f(v.toArray).toSeq }
    df.withColumn(seriesCol, fn(col(seriesCol)))
  }

  /** [[mapSeries]] with the series key visible to the transform closure
    * (reference mapSeriesWithKey: TimeSeries.scala:340 /
    * JavaTimeSeries.scala:193) — for key-dependent kernels (e.g.
    * per-instrument calibration constants). */
  def mapSeriesWithKey(df: DataFrame, f: (String, Array[Double]) => Array[Double],
      key: String = "key", seriesCol: String = "series"): DataFrame = {
    val fn = udf { (k: String, v: Seq[Double]) => f(k, v.toArray).toSeq }
    df.withColumn(seriesCol, fn(col(key).cast("string"), col(seriesCol)))
  }

  /** MLlib interop: instants layout -> RowMatrix / IndexedRowMatrix
    * (reference toRowMatrix/toIndexedRowMatrix: TimeSeriesRDD.scala:456-486). */
  def toRowMatrix(instants: DataFrame, ts: String = "ts_nanos")
      : org.apache.spark.mllib.linalg.distributed.RowMatrix = {
    val valueCols = instants.columns.filter(_ != ts)
    val rows = instants.select(valueCols.map(c => coalesce(col(c), lit(Double.NaN))): _*)
      .rdd.map(r => org.apache.spark.mllib.linalg.Vectors.dense(
        Array.tabulate(valueCols.length)(i => r.getDouble(i))))
    new org.apache.spark.mllib.linalg.distributed.RowMatrix(rows)
  }

  def toIndexedRowMatrix(instants: DataFrame, index: DateTimeIndex,
      ts: String = "ts_nanos")
      : org.apache.spark.mllib.linalg.distributed.IndexedRowMatrix = {
    val valueCols = instants.columns.filter(_ != ts)
    val bcast = instants.sparkSession.sparkContext.broadcast(index)
    val rows = instants
      .select((col(ts).cast("long") +: valueCols.map(c => coalesce(col(c), lit(Double.NaN)))): _*)
      .rdd.map { r =>
        val loc = bcast.value.locAtNanos(r.getLong(0))
        org.apache.spark.mllib.linalg.distributed.IndexedRow(loc.toLong,
          org.apache.spark.mllib.linalg.Vectors.dense(
            Array.tabulate(valueCols.length)(i => r.getDouble(i + 1))))
      }
    new org.apache.spark.mllib.linalg.distributed.IndexedRowMatrix(rows, index.size.toLong,
      valueCols.length)
  }

  // ---------------------------------------------------------------- cross-series instant filters

  /**
   * Drop every timestamp at which any series is null/missing, across all keys
   * present (reference removeInstantsWithNaNs: TimeSeriesRDD.scala:189-210).
   * One distributed aggregation over ts — no driver-collected mask.
   */
  def removeInstantsWithNaNs(df: DataFrame, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    // the total-key count is folded in as a windowless aggregate joined by a
    // cross of one row — no separate driver count() job; the bad-instant set
    // is unbounded on a sparse panel, so no broadcast hint either (AQE picks
    // the join strategy from the actual size at runtime)
    val nKeys = df.groupBy().agg(
      count_distinct(col(key)).as("__nkeys"))
    val bad = df.groupBy(col(ts))
      .agg(sum(when(col(value).isNull || isnan(col(value)), 1).otherwise(0)).as("__nmiss"),
        count(lit(1)).as("__n"))
      .crossJoin(nKeys)
      .filter(col("__nmiss") > 0 || col("__n") < col("__nkeys"))
      .select(col(ts))
    df.join(bad, Seq(ts), "left_anti")
  }

  /**
   * Keep only timestamps where `predicate` holds for the value of every key in
   * `filterKeys` (reference filterByInstant: TimeSeriesRDD.scala:158-184).
   */
  def filterByInstant(df: DataFrame, predicate: Column => Column,
      filterKeys: Seq[Any], key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    // no broadcast hint: the offending-instant set is unbounded (a predicate
    // failing everywhere selects every ts) — AQE chooses the join strategy
    val bad = df.filter(col(key).isin(filterKeys: _*))
      .filter(!predicate(col(value)))
      .select(col(ts)).distinct()
    df.join(bad, Seq(ts), "left_anti")
  }

  // ---------------------------------------------------------------- stats

  /** Per-series count/mean/stdev/min/max (reference seriesStats: TimeSeriesRDD.scala:265-267). */
  def seriesStats(df: DataFrame, key: String = "key", value: String = "value"): DataFrame =
    df.groupBy(col(key)).agg(
      count(col(value)).as("n"),
      avg(col(value)).as("mean"),
      stddev_samp(col(value)).as("stdev"),
      min(col(value)).as("min"),
      max(col(value)).as("max"))

  /** Per-key z-scores: (value - series mean) / series sample stddev, as an
    * unordered whole-partition window — one shuffle on the key, no second
    * aggregation-join pass. Constant series yield null via try_divide. */
  def zScores(df: DataFrame, key: String = "key", value: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(key))
    df.withColumn("z_score",
      try_divide(col(value) - avg(col(value)).over(w), stddev_samp(col(value)).over(w)))
  }

  /** Z-score anomaly detection: observations more than `threshold` sample
    * standard deviations from their series mean (a training-pipeline
    * outlier filter; extension beyond the reference). */
  def outliers(df: DataFrame, threshold: Double = 3.0, key: String = "key",
      value: String = "value"): DataFrame =
    zScores(df, key, value).filter(abs(col("z_score")) > threshold)

  /**
   * Per-key winsorization: clip every value into its series' exact
   * [lo, hi] percentile band (linear-interpolation percentiles, same
   * semantics as [[seriesPercentiles]]). The robust-preprocessing step run
   * before model fits so a single spike cannot dominate a least-squares
   * objective. Two window aggregates over ONE hash shuffle on the key —
   * both percentile windows share the key partitioning.
   */
  def winsorize(df: DataFrame, lo: Double = 0.05, hi: Double = 0.95,
      key: String = "key", value: String = "value"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val w = Window.partitionBy(col(key))
    df.withColumn("__lo", percentile(col(value), lit(lo)).over(w))
      .withColumn("__hi", percentile(col(value), lit(hi)).over(w))
      .withColumn(s"${value}_winsorized",
        least(greatest(col(value), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /**
   * Per-key OLS linear trend over series position (0-based, in time order):
   * one row per key with `n_obs`, `slope`, `intercept` via the native
   * `regr_slope`/`regr_intercept` aggregates (codegen'd, partial-aggregated
   * map-side). Position, not raw epoch time, is the regressor — epoch-nanos
   * squared overflow double precision and would make the normal equations
   * catastrophically ill-conditioned.
   */
  def linearTrend(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    df.filter(col(value).isNotNull)
      .withColumn("__x", (row_number().over(w) - 1).cast("double"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        regr_slope(col(value), col("__x")).as("slope"),
        regr_intercept(col(value), col("__x")).as("intercept"))
  }

  /**
   * Engine-exact variant of [[linearTrend]]: the regressand is quantized to
   * integers on the 1/gridScale grid and the normal equations are solved
   * from exact DECIMAL(38,0) sums — every intermediate through the final
   * numerator/denominator is integer-exact (independent of partial-
   * aggregation order, unlike the streaming-moment `regr_*` aggregates,
   * whose last-ulp noise differs between engines), so the slope/intercept
   * are bit-identical on any engine computing the same closed form. The
   * estimate differs from [[linearTrend]] by O(1/gridScale). Bounds: with
   * |value|·gridScale ≤ V and series length n, the largest product is
   * n²·V·n ≈ n³·V — DECIMAL(38) holds series up to ~10^9 points at V=10^8.
   */
  def linearTrendQuantized(df: DataFrame, gridScale: Double = 1e6,
      key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    val dec = "decimal(38,0)"
    val sums = df.filter(col(value).isNotNull)
      .withColumn("__x", (row_number().over(w) - 1).cast("double"))
      .withColumn("__vq", round(col(value) * gridScale, 0))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum((col("__x") * col("__x")).cast(dec)).as("__sxx"),
        sum(col("__vq").cast(dec)).as("__sy"),
        sum((col("__x") * col("__vq")).cast(dec)).as("__sxy"))
    val n = col("n_obs").cast(dec)
    // numerator/denominator are exact integers; ONE double division each,
    // then the grid un-scale — deterministic on identical inputs
    val slopeU = try_divide((n * col("__sxy") - col("__sx") * col("__sy")).cast("double"),
      (n * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
    sums
      .withColumn("__slope_u", slopeU)
      .withColumn("slope", col("__slope_u") / gridScale)
      .withColumn("intercept",
        (col("__sy").cast("double") - col("__slope_u") * col("__sx").cast("double"))
          / col("n_obs").cast("double") / gridScale)
      .select(col(key), col("n_obs"), col("slope"), col("intercept"))
  }

  /**
   * Sliding min/max/range of width n (full windows only, like the other
   * rolling ops): the envelope primitive behind range-based volatility and
   * band charts. Three frame aggregates over one key shuffle; min and max
   * are exact, so the output is engine-bit-exact unrounded.
   */
  def rollRange(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val f = rollFrame(wKey(key, ts), n, align)
    df.withColumn("roll_min", min(col(value)).over(f))
      .withColumn("roll_max", max(col(value)).over(f))
      .withColumn("__cnt", count(col(value)).over(f))
      .filter(col("__cnt") === n)
      .withColumn("roll_range", col("roll_max") - col("roll_min"))
      .drop("__cnt")
  }

  /** Per-series beta and correlation against the cross-sectional mean
    * series (the "market"): beta = covar_samp(x, bench) / var_samp(bench)
    * over the instants where both exist. Two keyed shuffles (bench agg on
    * the instant, then per-key agg); the bench join is un-hinted — it is one
    * row per instant, which AQE broadcasts iff it actually fits. */
  def seriesBeta(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val bench = df.groupBy(col(ts)).agg(avg(col(value)).as("__bench"))
    df.join(bench, Seq(ts))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        try_divide(covar_samp(col(value), col("__bench")),
          var_samp(col("__bench"))).as("beta"),
        corr(col(value), col("__bench")).as("r"))
  }

  /** Sample autocorrelation of each series at the given lags, computed
    * relationally: corr(x_t, x_{t-lag}) per key (reference autocorr:
    * UnivariateTimeSeries.scala:70-96 computes the textbook ACF; the
    * relational form here is the Pearson correlation of the lagged pairs). */
  def autocorr(df: DataFrame, lagsWanted: Seq[Int], key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    val withLags = lagsWanted.foldLeft(df) { (d, l) =>
      d.withColumn(s"__lag_$l", lag(col(value), l).over(w))
    }
    val aggs = lagsWanted.map(l => corr(col(value), col(s"__lag_$l")).as(s"acf_$l"))
    withLags.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-key maximum drawdown: the largest peak-to-trough decline of each
   * series (running peak via an ordered window, global max via the
   * unordered key window — both share ONE hash shuffle on the key), plus
   * the timestamp of the earliest trough attaining it. Subtraction and max
   * are exact double ops, so the output is engine-bit-exact unrounded.
   */
  def maxDrawdown(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val wRun = wKey(key, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(key))
    df.withColumn("__dd", max(col(value)).over(wRun) - col(value))
      .withColumn("__mx", max(col("__dd")).over(wAll))
      .filter(col("__dd") === col("__mx"))
      .groupBy(col(key))
      .agg(max(col("__dd")).as("max_drawdown"), min(col(ts)).as("trough_ts"))
  }

  /**
   * Per-key sampling-gap diagnostics: count/max/sum of the deltas between
   * consecutive observation timestamps plus the exact interpolated median
   * gap. The data-quality probe run before choosing a resample width or an
   * as-of tolerance; one window + one aggregate over a single key shuffle.
   */
  def gapStats(df: DataFrame, key: String = "key", ts: String = "ts_nanos"): DataFrame = {
    val w = wKey(key, ts)
    df.withColumn("__gap", col(ts) - lag(col(ts), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("__gap")).as("max_gap"),
        sum(col("__gap")).as("sum_gap"),
        percentile(col("__gap"), lit(0.5)).as("p50_gap"))
  }

  /**
   * Per-key partial autocorrelation at lags 1..maxLag via the
   * Durbin-Levinson recursion on the sample ACF (the statistic behind the
   * reference's `pacfPlot`, which fits ARs of increasing order —
   * EasyPlot.scala:82-96; Durbin-Levinson is the closed form of those
   * successive fits). The autocovariances come from ONE key shuffle
   * (lag windows + a single aggregate); the recursion is unrolled into
   * column algebra on the per-key scalars, so the whole operator is one
   * exchange + whole-stage codegen regardless of series count. `maxLag`
   * is capped at 5 because the unrolled expression tree doubles per lag;
   * deeper diagnostics belong in ModelOps.fitAr.
   */
  def pacf(df: DataFrame, maxLag: Int = 3, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    require(maxLag >= 1 && maxLag <= 5, "pacf supports maxLag in [1, 5]")
    val w = wKey(key, ts)
    val wAll = Window.partitionBy(col(key))
    val d0 = df.withColumn("__e", col(value) - avg(col(value)).over(wAll))
    val withLags = (1 to maxLag).foldLeft(d0) { (d, l) =>
      d.withColumn(s"__e_$l", lag(col("__e"), l).over(w))
    }
    val agg = withLags.groupBy(col(key)).agg(
      sum(col("__e") * col("__e")).as("__c0"),
      (1 to maxLag).map(l => sum(col("__e") * col(s"__e_$l")).as(s"__c$l")): _*)
    // r_k = c_k / c_0; Durbin-Levinson unrolled over Column expressions:
    //   phi_kk = (r_k - sum_j phi_{k-1,j} r_{k-j}) / (1 - sum_j phi_{k-1,j} r_j)
    //   phi_kj = phi_{k-1,j} - phi_kk * phi_{k-1,k-j}
    val r = (1 to maxLag).map(l => try_divide(col(s"__c$l"), col("__c0"))).toVector
    var phiPrev = Vector.empty[Column] // phi_{k-1, 1..k-1}
    var diag = Vector.empty[Column]
    for (k <- 1 to maxLag) {
      val num =
        if (k == 1) r(0)
        else r(k - 1) - phiPrev.zipWithIndex.map { case (p, j) => p * r(k - 2 - j) }.reduce(_ + _)
      val den =
        if (k == 1) lit(1.0)
        else lit(1.0) - phiPrev.zipWithIndex.map { case (p, j) => p * r(j) }.reduce(_ + _)
      val phikk = try_divide(num, den)
      diag = diag :+ phikk
      phiPrev = phiPrev.zipWithIndex.map { case (p, j) =>
        p - phikk * phiPrev(k - 2 - j)
      } :+ phikk
    }
    agg.select(col(key) +: diag.zipWithIndex.map { case (c, i) =>
      c.as(s"pacf_${i + 1}")
    }: _*)
  }

  /**
   * Engle-Granger cointegration statistic of each key's series `y` against
   * a shared regressor series `x` (same row grid — build it with a
   * resample + join, e.g. against the cross-sectional mean as in
   * [[seriesBeta]]). Step 1 (the cointegrating OLS y = a + b x) runs as
   * window aggregates over the key partition — no extra shuffle; step 2 is
   * the Dickey-Fuller t-ratio of the OLS residuals (with constant,
   * maxLag 0), the same regr-aggregate algebra as the ADF statistic. One
   * keyed shuffle end-to-end; compare against the Engle-Granger critical
   * values (-3.34 at 5% for one regressor), NOT the plain DF table.
   */
  def cointegrationEG(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      y: String = "y", x: String = "x"): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    val slope = try_divide(covar_pop(col(y), col(x)).over(wAll),
      var_pop(col(x)).over(wAll))
    val icept = avg(col(y)).over(wAll) - slope * avg(col(x)).over(wAll)
    val w = wKey(key, ts)
    val resid = df.filter(col(y).isNotNull && col(x).isNotNull)
      .withColumn("__e", col(y) - icept - slope * col(x))
      .withColumn("__e1", lag(col("__e"), 1).over(w))
      .filter(col("__e1").isNotNull)
      .withColumn("__de", col("__e") - col("__e1"))
    val agg = resid.groupBy(col(key)).agg(
      count(lit(1)).as("n_obs"),
      try_divide(covar_pop(col("__de"), col("__e1")),
        var_pop(col("__e1"))).as("__phi"),
      corr(col("__de"), col("__e1")).as("__r"),
      var_pop(col("__de")).as("__vyy"),
      var_pop(col("__e1")).as("__vxx"))
    agg.select(col(key), col("n_obs"),
      try_divide(col("__phi"),
        sqrt(try_divide(
          try_divide((lit(1.0) - col("__r") * col("__r")) * col("__vyy") * col("n_obs"),
            col("n_obs") - lit(2)),
          col("__vxx") * col("n_obs")))).as("eg_stat"))
  }

  /**
   * Single-lag Granger-causality F statistic per key: does x_{t-1} improve
   * the AR(1) prediction of y_t? Restricted model y_t = c + b y_{t-1};
   * unrestricted adds x_{t-1}. Both OLS fits reduce to centered second
   * moments of (y_t, y_{t-1}, x_{t-1}) over the SAME sample (rows where
   * both lags exist), solved in closed form (Cramer on the 2x2 normal
   * equations) — one lag window + one aggregate, one keyed shuffle, no
   * matrix code. F ~ F(1, n-3) under the no-causality null.
   */
  def grangerF(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      y: String = "y", x: String = "x"): DataFrame = {
    val w = wKey(key, ts)
    val d = df
      .withColumn("__u", lag(col(y), 1).over(w))
      .withColumn("__v", lag(col(x), 1).over(w))
      .filter(col(y).isNotNull && col("__u").isNotNull && col("__v").isNotNull)
    val n = count(lit(1))
    val agg = d.groupBy(col(key)).agg(
      n.as("n_obs"),
      (covar_pop(col("__u"), col(y)) * n).as("__suy"),
      (covar_pop(col("__v"), col(y)) * n).as("__svy"),
      (covar_pop(col("__u"), col("__v")) * n).as("__suv"),
      (var_pop(col("__u")) * n).as("__suu"),
      (var_pop(col("__v")) * n).as("__svv"),
      (var_pop(col(y)) * n).as("__syy"))
    val det = col("__suu") * col("__svv") - col("__suv") * col("__suv")
    val b1 = try_divide(col("__suy") * col("__svv") - col("__svy") * col("__suv"), det)
    val b2 = try_divide(col("__svy") * col("__suu") - col("__suy") * col("__suv"), det)
    val sseU = col("__syy") - b1 * col("__suy") - b2 * col("__svy")
    val sseR = col("__syy") - try_divide(col("__suy") * col("__suy"), col("__suu"))
    agg.select(col(key), col("n_obs"),
      try_divide(sseR - sseU,
        try_divide(sseU, col("n_obs") - lit(3))).as("granger_f"))
  }

  /**
   * Rolling correlation of two co-sampled columns over an n-row window per
   * key (the moving co-movement diagnostic pairing [[rollRange]]'s shape
   * with [[seriesBeta]]'s statistic). Emits only full windows; pairs where
   * either side is null are skipped by `corr` itself, exactly as in the
   * global [[crossCorrelation]]. One window, zero extra shuffles.
   */
  def rollCorr(df: DataFrame, n: Int, align: RollAlign.Value = RollAlign.Right,
      key: String = "key", ts: String = "ts_nanos",
      x: String = "x", y: String = "y"): DataFrame = {
    require(n >= 2, "rolling correlation needs window >= 2")
    val f = rollFrame(wKey(key, ts), n, align)
    df.withColumn("roll_corr", corr(col(x), col(y)).over(f))
      .withColumn("__cnt", count(lit(1)).over(f))
      .filter(col("__cnt") === n)
      .drop("__cnt")
  }

  /**
   * Per-key Shannon entropy (nats) of the value distribution over `bins`
   * equal-width bins between the series min and max — a distributional
   * collapse detector (constant/degenerate series score 0). Bin edges come
   * from unordered key windows, the histogram is one groupBy(key, bin),
   * the entropy one groupBy(key): all three reuse the same key-hash
   * partitioning, so Catalyst plans a single exchange.
   */
  def valueEntropy(df: DataFrame, bins: Int = 10, key: String = "key",
      value: String = "value"): DataFrame = {
    require(bins > 0, "bins must be positive")
    val wAll = Window.partitionBy(col(key))
    df.filter(col(value).isNotNull)
      .withColumn("__bin",
        least(lit(bins - 1), coalesce(floor(try_divide(
          (col(value) - min(col(value)).over(wAll)) * bins,
          max(col(value)).over(wAll) - min(col(value)).over(wAll))), lit(0L)))
          .cast("int"))
      .groupBy(col(key), col("__bin")).agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(key))))
      .groupBy(col(key))
      .agg(sum(col("__c")).cast("long").as("n_obs"),
        count(lit(1)).cast("long").as("n_bins_used"),
        round(-sum((col("__c") / col("__n")) * log(col("__c") / col("__n"))), 6)
          .as("entropy"))
  }

  /**
   * Per-key mean-crossing statistics: how often the series crosses its own
   * mean, how many observations sit above it, and the longest
   * above-the-mean run (gaps-and-islands: run id = global row_number minus
   * per-side row_number, both over the same key shuffle). A cheap
   * oscillation-vs-drift diagnostic; all outputs are integer-exact.
   */
  def meanCrossings(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    val w = wKey(key, ts)
    val sided = df.filter(col(value).isNotNull)
      .withColumn("__above", (col(value) > avg(col(value)).over(wAll)).cast("int"))
    val crossings = sided
      .withColumn("__prev", lag(col("__above"), 1).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__above")).cast("long").as("n_above"),
        sum(when(col("__prev").isNotNull && col("__above") =!= col("__prev"), 1L)
          .otherwise(0L)).as("n_crossings"))
    val longest = sided
      .withColumn("__grp",
        row_number().over(w) - row_number().over(
          Window.partitionBy(col(key), col("__above")).orderBy(col(ts))))
      .filter(col("__above") === 1)
      .groupBy(col(key), col("__grp")).agg(count(lit(1)).as("__len"))
      .groupBy(col(key)).agg(max(col("__len")).as("longest_above_run"))
    // longest is one row per key — un-hinted join, AQE broadcasts iff it fits
    crossings.join(longest, Seq(key), "left")
      .withColumn("longest_above_run", coalesce(col("longest_above_run"), lit(0L)))
  }

  /**
   * Per-key robust location/dispersion: the exact median and the median
   * absolute deviation (MAD) — the outlier-resistant sibling of
   * [[seriesStats]]' mean/stddev, and the scale estimate robust z-scoring
   * uses (0.6745·(x−med)/mad). Median via one unordered key window, MAD via
   * one keyed aggregation over the same partitioning — a single shuffle.
   * Both quantiles are p50, whose interpolation fraction (0.5) is an exact
   * binary value, so the medians are engine-bit-exact unrounded.
   */
  def madStats(df: DataFrame, key: String = "key", value: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(key))
    df.filter(col(value).isNotNull)
      .withColumn("__med", percentile(col(value), lit(0.5)).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        max(col("__med")).as("median"), // constant per key
        percentile(abs(col(value) - col("__med")), lit(0.5)).as("mad"))
  }

  // ---------------------------------------------------------------- alignment / rebase

  /**
   * Conform all series to a target index: every key gets exactly one row per
   * index instant; observations off the index are dropped, missing instants
   * are null (then optionally filled). This is the reference's rebase /
   * withIndex (TimeSeriesUtils.scala:63-221, TimeSeriesRDD.scala:560-563)
   * expressed as a broadcast left join — the index is driver-small by design
   * (reference design doc src/site/markdown/index.md:35-40).
   */
  def align(df: DataFrame, index: DateTimeIndex, fillMethod: Option[String] = None,
      key: String = "key", ts: String = "ts_nanos", value: String = "value",
      strategy: String = "series"): DataFrame = strategy match {
    case "series" =>
      // One shuffle total: group observations per key (hash on key), scatter
      // into an index-sized array map-side, melt back with the index mapped
      // through an embedded literal (the index is driver-small by design),
      // then fill — the fill window's partitionBy(key) is satisfied by the
      // groupBy's hash partitioning, so Catalyst plans NO further exchange.
      val idxLit = typedlit(index.toNanosArray.toSeq)
      val melted = toSeries(df, index, key, ts, value)
        .select(col(key), posexplode(col("series")).as(Seq("__loc", value)))
        .withColumn(value, when(isnan(col(value)), lit(null)).otherwise(col(value)))
        .withColumn(ts, element_at(idxLit, col("__loc") + 1))
        .drop("__loc")
      fillMethod.map(m => fill(melted, m, key = key, ts = ts, value = value))
        .getOrElse(melted)
    case "join" =>
      // Relational formulation: key-grid left join (shuffles on (key, ts),
      // and a fill would re-shuffle on key). Kept for comparison/debugging.
      val spark = df.sparkSession
      import spark.implicits._
      val idxDf = index.toNanosArray.toSeq.toDF(ts)
      val keys = df.select(col(key)).distinct()
      val grid = keys.crossJoin(broadcast(idxDf))
      val aligned = grid.join(df, Seq(key, ts), "left")
      fillMethod.map(m => fill(aligned, m, key = key, ts = ts, value = value))
        .getOrElse(aligned)
    case other => throw new IllegalArgumentException(s"unknown align strategy: $other")
  }

  /**
   * As-of join: for each left row, the latest right value with
   * right.ts <= left.ts (within an optional tolerance), per key.
   * The reference's `locAtOrBefore` probe pattern (DateTimeIndex.scala:215-243)
   * re-expressed as a union + window — shuffles once on (key), no per-element
   * binary search, scales to any right-side size.
   */
  def asofJoin(left: DataFrame, right: DataFrame, valueOut: String = "asof_value",
      toleranceNanos: Long = Long.MaxValue, key: String = "key",
      ts: String = "ts_nanos", rightValue: String = "value"): DataFrame = {
    // right rows get the smaller side tag so they sort BEFORE left rows at
    // equal ts — "at or before" is inclusive of an equal-timestamp right row
    val l = left.withColumn("__side", lit(1)).withColumn("__rv", lit(null).cast("double"))
    val r = right.select(col(key), col(ts), col(rightValue))
      .withColumn("__side", lit(0)).withColumn("__rv", col(rightValue))
    val lCols = left.columns
    val unioned = l.select((lCols.map(col) ++ Seq(col("__side"), col("__rv"))): _*)
      .unionByName(r.select((col(key) +: col(ts) +: lCols.filter(c => c != key && c != ts)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side") :+ col("__rv")): _*))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the last right ROW is selected via a struct (non-null for every right
    // row), not the last non-null right VALUE — a right row whose value is
    // NULL therefore matches and emits NULL, exactly like SQL ASOF JOIN,
    // instead of silently falling back to an earlier right row
    val filled = unioned
      .withColumn("__r", last(when(col("__side") === 0,
        struct(col(ts).as("__rts"), col("__rv"))), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(valueOut,
        when(col(ts) - col("__r").getField("__rts") <= toleranceNanos,
          col("__r").getField("__rv")))
      .drop("__side", "__rv", "__r")
    filled
  }

  // ---------------------------------------------------------------- resample

  /**
   * Downsample to fixed-duration buckets with the reference's four
   * closedRight x stampRight boundary modes (Resample.scala:47-121).
   * Aggregation is a caller-supplied relational aggregate (codegen'd builtin
   * for sum/mean/min/max — no per-window closure).
   */
  def resample(df: DataFrame, widthNanos: Long, aggFn: Column => Column,
      closedRight: Boolean = false, stampRight: Boolean = false,
      originNanos: Long = 0L, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    // All arithmetic stays in LONG — nanos exceed 2^53 so double math would
    // corrupt bucket boundaries. pmod keeps it exact for any sign of (ts-origin).
    val m = pmod(col(ts) - originNanos, lit(widthNanos))
    // bucket start s such that ts in [s, s+w) (closed-left) or (s, s+w] (closed-right)
    val bucketStart = if (!closedRight) {
      col(ts) - m
    } else {
      when(m === 0, col(ts) - widthNanos).otherwise(col(ts) - m)
    }
    val stamp = if (stampRight) bucketStart + widthNanos else bucketStart
    df.withColumn("__bucket", stamp.cast("long"))
      .groupBy(col(key), col("__bucket").as(ts))
      .agg(aggFn(col(value)).as(value))
  }

  /** Builtin aggregate by name — the py4j-friendly way to pick `aggFn`
    * (Python callers can't construct a Scala `Column => Column`). */
  private def aggByName(name: String): Column => Column = name.toLowerCase match {
    case "avg" | "mean" => avg
    case "sum"          => sum
    case "min"          => min
    case "max"          => max
    case "count"        => c => count(c).cast("double")
    case "first"        => c => first(c, ignoreNulls = true)
    case "last"         => c => last(c, ignoreNulls = true)
    case other => throw new IllegalArgumentException(s"unknown aggregate: $other")
  }

  /** py4j-friendly overload: aggregate picked by name. */
  def resample(df: DataFrame, widthNanos: Long, agg: String, closedRight: Boolean,
      stampRight: Boolean, originNanos: Long, key: String, ts: String,
      value: String): DataFrame =
    resample(df, widthNanos, aggByName(agg), closedRight, stampRight, originNanos,
      key, ts, value)

  /** Calendar resample: bucket by date_trunc unit on a derived timestamp.
    * `tickNanos` = nanoseconds per unit of the ts column (1 for nanos ts,
    * 1000 for micros ts) — unit bugs here silently collapse all buckets,
    * so the tick size is an explicit parameter. */
  def resampleCalendar(df: DataFrame, unit: String, aggFn: Column => Column,
      key: String = "key", ts: String = "ts_nanos", value: String = "value",
      tickNanos: Long = 1L): DataFrame = {
    val tsCol = timestamp_micros((col(ts) * tickNanos / 1000L).cast("long"))
    df.withColumn("__bucket", date_trunc(unit, tsCol))
      .groupBy(col(key), col("__bucket").as("bucket_ts"))
      .agg(aggFn(col(value)).as(value))
  }

  /** py4j-friendly overload: aggregate picked by name. */
  def resampleCalendar(df: DataFrame, unit: String, agg: String, key: String,
      ts: String, value: String, tickNanos: Long): DataFrame =
    resampleCalendar(df, unit, aggByName(agg), key, ts, value, tickNanos)

  /** Exact per-key percentiles (linear interpolation): the cutoff-threshold
    * primitive for quality-filtering pipelines (e.g. drop everything under a
    * key's p10 length). One hash shuffle; exact `percentile`, not the
    * t-digest approximation, so results are engine-comparable. */
  def seriesPercentiles(df: DataFrame, ps: Seq[Double], key: String = "key",
      value: String = "value"): DataFrame = {
    require(ps.nonEmpty, "at least one percentile")
    val cols = ps.map(p => percentile(col(value), lit(p)).as(s"p${(p * 100).round}"))
    df.groupBy(col(key)).agg(cols.head, cols.tail: _*)
  }

  // ---------------------------------------------------------------- layout converters

  /**
   * observations -> instants: one row per ts, one column per key
   * (reference toInstantsDataFrame: TimeSeriesRDD.scala:399-413). The entire
   * custom chunked-transpose machinery of the reference (276-391) reduces to
   * one pivot whose shuffle Catalyst plans.
   */
  def toInstants(df: DataFrame, keys: Seq[String], key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame =
    df.groupBy(col(ts)).pivot(key, keys).agg(first(col(value)))

  /**
   * observations -> series layout `(key, series ARRAY<DOUBLE>)` conformed to
   * `index`: scatter each observation to its index location
   * (reference timeSeriesRDDFromObservations: TimeSeriesRDD.scala:694-745).
   * NaN marks missing inside the array payload, like the reference.
   */
  def toSeries(df: DataFrame, index: DateTimeIndex, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idxDf = index.toNanosArray.zipWithIndex.toSeq.toDF(ts, "__loc")
    df.join(broadcast(idxDf), Seq(ts))
      .groupBy(col(key))
      .agg(graft.plans.ScatterToSeries(col("__loc"), col(value), index.size)
        .as("series"))
  }

  /**
   * Per-key AR(1) mean-reversion diagnostics: phi is the OLS slope of x_t on
   * x_{t-1} (with intercept, native `regr_slope` — partial-aggregated
   * map-side), and the half-life of a shock is -ln(2)/ln(phi), defined only
   * for 0 < phi < 1 (otherwise null: a non-mean-reverting or oscillating
   * series has no half-life). One lag window + one keyed aggregate over a
   * single key shuffle.
   */
  def halfLife(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    val phi = col("phi")
    df.filter(col(value).isNotNull)
      .withColumn("__prev", lag(col(value), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_pairs"),
        regr_slope(col(value), col("__prev")).as("phi"))
      .withColumn("half_life",
        when(phi > 0 && phi < 1, -log(lit(2.0)) / log(phi)))
  }

  /**
   * Per-key Spearman rank correlation of two co-sampled columns: Pearson
   * `corr` over mid-ranks (rank + (ties-1)/2 — the average-rank convention,
   * so tied values contribute identically on any engine). Two unordered tie
   * windows + one ordered rank window + one aggregate, all partitioned by
   * the key: Catalyst plans a single exchange. The rank windows sort within
   * each key — fine at the reference's design point (a series fits in one
   * task), the same bound every other per-key window op here carries.
   */
  def spearmanCorr(df: DataFrame, key: String = "key",
      x: String = "x", y: String = "y"): DataFrame = {
    def midRank(c: String) =
      rank().over(Window.partitionBy(col(key)).orderBy(col(c))) +
        (count(lit(1)).over(Window.partitionBy(col(key), col(c))) - 1) / 2.0
    df.filter(col(x).isNotNull && col(y).isNotNull)
      .withColumn("__rx", midRank(x))
      .withColumn("__ry", midRank(y))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        corr(col("__rx"), col("__ry")).as("spearman_rho"))
  }

  /**
   * Per-key distribution-drift detector: two-sample Kolmogorov-Smirnov D
   * between the FIRST and SECOND half of each series (split at the midpoint
   * in time order). D's numerator max|c₁·n₂ − c₂·n₁| is integer-exact; the
   * final D is one double division. The cumulative half-counts use a RANGE
   * frame on the value ordering, so every row of a tied value group sees the
   * whole group's counts — D is evaluated at distinct values only, the exact
   * KS convention under ties. Two windows plus one aggregate, all over a
   * single key shuffle.
   */
  def ksDrift(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    val wVal = Window.partitionBy(col(key)).orderBy(col(value))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(value).isNotNull)
      .withColumn("__rn", row_number().over(wKey(key, ts)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__n1", (col("__n") / 2).cast("long"))
      .withColumn("__h1", (col("__rn") <= col("__n1")).cast("long"))
      .withColumn("__c1", sum(col("__h1")).over(wVal))
      .withColumn("__c2", sum(lit(1L) - col("__h1")).over(wVal))
      .groupBy(col(key))
      .agg(max(col("__n1")).as("n_first"),
        (max(col("__n")) - max(col("__n1"))).as("n_second"),
        max(abs(col("__c1") * (col("__n") - col("__n1")) -
          col("__c2") * col("__n1"))).as("d_num"))
      .withColumn("ks_d", col("d_num").cast("double") /
        (col("n_first") * col("n_second")).cast("double"))
  }

  /**
   * Hurst exponent by the aggregated-variance method: for each block size m
   * in `blockSizes`, the variance of the m-point block means of the series;
   * Var(X̄_m) ~ m^(2H−2), so H = 1 + slope/2 from the ln-ln OLS over the
   * block sizes. Long-range-dependence diagnostic (H≈0.5 iid, H→1 trending,
   * H→0 mean-reverting). One narrow explode over |blockSizes| copies, then
   * (key, m, block) and (key, m) aggregates and a tiny per-key regression —
   * two shuffles total, both key-prefixed.
   */
  def hurst(df: DataFrame, blockSizes: Seq[Int] = Seq(1, 2, 4, 8, 16),
      key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 1), "block sizes >= 1")
    val blockVar = df.filter(col(value).isNotNull)
      .withColumn("__rn", row_number().over(wKey(key, ts)) - 1)
      .select(col(key), col("__rn"), col(value),
        explode(array(blockSizes.map(lit): _*)).as("__m"))
      .groupBy(col(key), col("__m"), (col("__rn") / col("__m")).cast("long").as("__blk"))
      .agg(avg(col(value)).as("__bmean"), count(lit(1)).as("__bn"))
      // only FULL blocks: a ragged tail mean has lower variance and biases H
      .filter(col("__bn") === col("__m"))
      .groupBy(col(key), col("__m"))
      .agg(var_samp(col("__bmean")).as("__v"), count(lit(1)).as("__nblk"))
      .filter(col("__v").isNotNull && col("__v") > 0 && col("__nblk") >= 2)
    blockVar.groupBy(col(key))
      .agg(count(lit(1)).as("n_scales"),
        regr_slope(log(col("__v")), log(col("__m").cast("double"))).as("__slope"))
      .withColumn("hurst", lit(1.0) + col("__slope") / 2)
      .select(col(key), col("n_scales"), col("hurst"))
  }

  /**
   * Ornstein-Uhlenbeck fit per key from the exact AR(1) discretization
   * x_t = a + b·x_{t−1} + ε (unit time step): κ = −ln b, θ = a/(1−b),
   * σ = σ_ε·√(−2 ln b / (1−b²)), defined for 0 < b < 1 (null otherwise).
   * The regression runs on native covar/var aggregates; σ_ε² is the OLS
   * residual variance sse/(n−2) with sse = S_yy − S_xy²/S_xx. One lag
   * window + one keyed aggregate — a single key shuffle, closed form, no
   * iterative optimizer (the reference fits AR(1) the same way and OU is
   * its continuous-time reading).
   */
  def ouFit(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      value: String = "value"): DataFrame = {
    val w = wKey(key, ts)
    val paired = df.filter(col(value).isNotNull)
      .withColumn("__prev", lag(col(value), 1).over(w))
      .filter(col("__prev").isNotNull)
    val agg = paired.groupBy(col(key))
      .agg(count(lit(1)).as("n_pairs"),
        covar_samp(col("__prev"), col(value)).as("__sxy"),
        var_samp(col("__prev")).as("__sxx"),
        var_samp(col(value)).as("__syy"),
        avg(col(value)).as("__my"), avg(col("__prev")).as("__mx"))
    val b = try_divide(col("__sxy"), col("__sxx"))
    val a = col("__my") - b * col("__mx")
    val nm1 = (col("n_pairs") - 1).cast("double")
    val sse = (col("__syy") - try_divide(col("__sxy") * col("__sxy"), col("__sxx"))) * nm1
    val sigEps2 = try_divide(sse, (col("n_pairs") - 2).cast("double"))
    agg
      .withColumn("__b", b).withColumn("__a", a).withColumn("__se2", sigEps2)
      .withColumn("kappa", when(col("__b") > 0 && col("__b") < 1, -log(col("__b"))))
      .withColumn("theta", when(col("__b") > 0 && col("__b") < 1,
        col("__a") / (lit(1.0) - col("__b"))))
      .withColumn("sigma", when(col("__b") > 0 && col("__b") < 1 && col("__se2") >= 0,
        sqrt(col("__se2") * (lit(-2.0) * log(col("__b"))) /
          (lit(1.0) - col("__b") * col("__b")))))
      .select(col(key), col("n_pairs"), col("kappa"), col("theta"), col("sigma"))
  }

  /**
   * Benford first-digit deviation per key: the distribution of the first
   * significant digit of |value| against Benford's law p_d = log₁₀(1+1/d),
   * reported as the total-variation-style score Σ_d |p̂_d − p_d| over the
   * full 1..9 grid (absent digits contribute their Benford mass). The
   * fraud/synthetic-data smell test. Digit extraction is a narrow map, the
   * histogram one (key, digit) aggregate; the 9-row digit grid is exploded
   * per key so missing digits are counted — nothing driver-side.
   */
  def benfordDeviation(df: DataFrame, key: String = "key",
      value: String = "value"): DataFrame = {
    val absV = abs(col(value))
    // least/greatest clamp: a last-ULP log10 misround at an exact power of
    // ten must not fabricate digit 0 or 10
    val digit = least(lit(9), greatest(lit(1),
      floor(absV / pow(lit(10.0), floor(log10(absV)))).cast("int")))
    val counts = df.filter(col(value).isNotNull && absV > 0)
      .withColumn("__d", digit)
      .groupBy(col(key), col("__d")).agg(count(lit(1)).as("__c"))
    val grid = counts.groupBy(col(key)).agg(sum(col("__c")).as("__n"))
      .select(col(key), col("__n"), explode(sequence(lit(1), lit(9))).as("__d"))
    grid.join(counts, Seq(key, "__d"), "left")
      .withColumn("__p", coalesce(col("__c"), lit(0L)).cast("double") / col("__n"))
      .withColumn("__benford", log(lit(1.0) + lit(1.0) / col("__d")) / log(lit(10.0)))
      .groupBy(col(key))
      .agg(max(col("__n")).as("n_obs"),
        sum(abs(col("__p") - col("__benford"))).as("benford_tvd"))
  }

  /**
   * Forecast-accuracy evaluation per key: MAE, RMSE, MAPE, and MASE of a
   * `(actual, predicted)` pair — the metric block every forecasting
   * pipeline needs next to the fit/forecast operators (the reference
   * ships fits but no evaluation harness). MASE (Hyndman & Koehler 2006,
   * "Another look at measures of forecast accuracy") scales MAE by the
   * in-sample one-step naive MAE — scale-free and defined where MAPE
   * breaks (zero actuals): mase = mae / mean|actual_t − actual_{t−1}|.
   * One lag window + one keyed aggregate — a single key shuffle; MAPE
   * averages only rows with actual ≠ 0 (the count is reported, nothing
   * silently imputed).
   */
  def forecastAccuracy(df: DataFrame, key: String = "key",
      ts: String = "ts_nanos", actual: String = "actual",
      predicted: String = "predicted"): DataFrame = {
    val err = col(actual) - col(predicted)
    val naiveErr = abs(col(actual) - lag(col(actual), 1).over(wKey(key, ts)))
    df.filter(col(actual).isNotNull && col(predicted).isNotNull)
      .withColumn("__ne", naiveErr)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        avg(abs(err)).as("mae"),
        sqrt(avg(err * err)).as("rmse"),
        avg(when(col(actual) =!= 0.0, abs(err) / abs(col(actual)))).as("mape"),
        count(when(col(actual) =!= 0.0, 1)).as("n_mape"),
        avg(col("__ne")).as("__naive_mae"))
      .withColumn("mase", try_divide(col("mae"), col("__naive_mae")))
      .select(col(key), col("n_obs"), col("mae"), col("rmse"),
        col("mape"), col("n_mape"), col("mase"))
  }

  /**
   * Periodogram per key at the Fourier frequencies k/n, k = 1..min(maxK,
   * ⌊n/2⌋): I(k) = (C_k² + S_k²)/n with C_k = Σ_t x̃_t·cos(2πkt/n),
   * S_k = Σ_t x̃_t·sin(2πkt/n) over the MEAN-CENTERED series x̃ (centering
   * removes the DC term that would otherwise dominate every bin) — the
   * classical spectral-density estimate behind dominant-period detection
   * (statsmodels/R `spec.pegram` territory; the reference has autocorr but
   * nothing spectral). The frequency fan-out is a bounded explode (≤ maxK
   * copies); everything else is one (key, k) aggregate over the same key
   * shuffle the window pass created. No FFT needed at maxK ≪ n — the
   * direct O(n·maxK) sums are exact, shuffle-free per frequency, and
   * engine-reproducible (an FFT's butterfly order wouldn't be).
   */
  def periodogram(df: DataFrame, maxK: Int = 16, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame = {
    require(maxK >= 1, "maxK >= 1")
    val w = wKey(key, ts)
    val wAll = Window.partitionBy(col(key))
    val twoPi = 2.0 * math.Pi
    df.filter(col(value).isNotNull)
      .withColumn("__t", (row_number().over(w) - 1).cast("double"))
      .withColumn("__n", count(lit(1)).over(wAll).cast("double"))
      .withColumn("__xc", col(value) - avg(col(value)).over(wAll))
      // n >= 2 guard: sequence(1, 0) would DESCEND in Spark, not empty
      .filter(col("__n") >= 2.0)
      .withColumn("k", explode(sequence(lit(1), least(lit(maxK),
        floor(col("__n") / 2).cast("int")))))
      .groupBy(col(key), col("k"))
      .agg(max(col("__n")).cast("long").as("n_obs"),
        sum(col("__xc") * cos(lit(twoPi) * col("k") * col("__t") / col("__n")))
          .as("__c"),
        sum(col("__xc") * sin(lit(twoPi) * col("k") * col("__t") / col("__n")))
          .as("__s"))
      .select(col(key), col("k").cast("long").as("k"), col("n_obs"),
        ((col("__c") * col("__c") + col("__s") * col("__s"))
          / col("n_obs").cast("double")).as("power"),
        (col("n_obs").cast("double") / col("k")).as("period"))
  }

  /** Dominant period per key: the frequency with maximal periodogram
    * power (earliest k on exact ties) — argmax over [[periodogram]]'s
    * bounded (key × maxK) output, one tiny rank window. */
  def dominantPeriod(df: DataFrame, maxK: Int = 16, key: String = "key",
      ts: String = "ts_nanos", value: String = "value"): DataFrame =
    periodogram(df, maxK, key, ts, value)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("power").desc, col("k").asc)))
      .filter(col("__rk") === 1)
      .select(col(key), col("n_obs"), col("k").as("dominant_k"),
        col("period").as("dominant_period"), col("power"))

  /**
   * Bivariate VAR(1) fit per key — the vector extension of the AR(1)
   * block (reference fits univariate AR only; statsmodels' `VAR` is the
   * model users reach for next):
   *   [x_t, y_t]' = c + A·[x_{t−1}, y_{t−1}]' + ε.
   * Each of the two equations is a 2-regressor OLS with the SAME design
   * matrix, solved in closed form from centered covariances (2×2 normal
   * equations: det = SxxSyy − Sxy²; coefficients are covariance ratios —
   * no iterative optimizer, no matrix library). One lag window + ONE keyed
   * aggregate computing all 5 covariances and 4 means — a single key
   * shuffle for the whole fit; null when det ≤ 0 (degenerate regressors),
   * never a fabricated solve.
   */
  def varFit(df: DataFrame, key: String = "key", ts: String = "ts_nanos",
      x: String = "x", y: String = "y"): DataFrame = {
    val w = wKey(key, ts)
    val paired = df.filter(col(x).isNotNull && col(y).isNotNull)
      .withColumn("__xl", lag(col(x), 1).over(w))
      .withColumn("__yl", lag(col(y), 1).over(w))
      .filter(col("__xl").isNotNull && col("__yl").isNotNull)
    val agg = paired.groupBy(col(key)).agg(
      count(lit(1)).as("n_pairs"),
      var_samp(col("__xl")).as("__sxx"),
      var_samp(col("__yl")).as("__syy"),
      covar_samp(col("__xl"), col("__yl")).as("__sxy"),
      covar_samp(col("__xl"), col(x)).as("__sx_tx"),
      covar_samp(col("__yl"), col(x)).as("__sy_tx"),
      covar_samp(col("__xl"), col(y)).as("__sx_ty"),
      covar_samp(col("__yl"), col(y)).as("__sy_ty"),
      avg(col(x)).as("__mx"), avg(col(y)).as("__my"),
      avg(col("__xl")).as("__mxl"), avg(col("__yl")).as("__myl"))
    val det = col("__sxx") * col("__syy") - col("__sxy") * col("__sxy")
    def solve(sxT: Column, syT: Column): (Column, Column) = (
      when(det > 0, (col("__syy") * sxT - col("__sxy") * syT) / det),
      when(det > 0, (col("__sxx") * syT - col("__sxy") * sxT) / det))
    val (a11, a12) = solve(col("__sx_tx"), col("__sy_tx"))
    val (a21, a22) = solve(col("__sx_ty"), col("__sy_ty"))
    agg.select(col(key), col("n_pairs"),
      a11.as("a11"), a12.as("a12"),
      (col("__mx") - a11 * col("__mxl") - a12 * col("__myl")).as("c1"),
      a21.as("a21"), a22.as("a22"),
      (col("__my") - a21 * col("__mxl") - a22 * col("__myl")).as("c2"))
  }

  /** series layout -> observations (reference toObservationsDataFrame:
    * TimeSeriesRDD.scala:419-443 — NaN observations dropped, like the reference). */
  def fromSeries(df: DataFrame, index: DateTimeIndex, key: String = "key",
      seriesCol: String = "series"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idxDf = index.toNanosArray.zipWithIndex.map(_.swap).toSeq.toDF("__loc", "ts_nanos")
    df.select(col(key), posexplode(col(seriesCol)).as(Seq("__loc", "value")))
      .filter(!isnan(col("value")))
      .join(broadcast(idxDf), Seq("__loc"))
      .select(col(key), col("ts_nanos"), col("value"))
  }
}
