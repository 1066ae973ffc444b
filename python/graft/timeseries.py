"""Per-key time-series operators (parity: reference TimeSeriesRDD methods).

Every function is a thin py4j call to ``graft.ts.TimeSeriesOps`` — the same
lag/fill/resample/align operators the Scala and Java APIs use. DataFrames are
long-form observations ``(key, ts, value)``; ``ts`` is an integer tick column
(any unit — operators taking absolute times take them in the same ticks).
"""

from ._java import ctx, lift, opt, roll_align, to_seq


def lags(df, max_lag, trim=True, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.lags(
        df._jdf, int(max_lag), bool(trim), key, ts, value))


def differences(df, n=1, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.differences(
        df._jdf, int(n), key, ts, value))


def quotients(df, n=1, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.quotients(
        df._jdf, int(n), key, ts, value))


def return_rates(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.returnRates(
        df._jdf, key, ts, value))


def roll_sum(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollSum(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def roll_mean(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollMean(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def roll_std(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollStd(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def roll_min(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollMin(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def roll_max(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollMax(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def z_scores(df, key="key", value="value"):
    """Per-series z-scores: (value - mean) / sample stddev."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.zScores(df._jdf, key, value))


def outliers(df, threshold=3.0, key="key", value="value"):
    """Observations more than `threshold` stddevs from their series mean."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.outliers(
        df._jdf, float(threshold), key, value))


def series_beta(df, key="key", ts="ts_nanos", value="value"):
    """Per-series beta/correlation vs the cross-sectional mean series."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.seriesBeta(
        df._jdf, key, ts, value))


def fill(df, method, fill_value=0.0, key="key", ts="ts_nanos", value="value"):
    """method: previous | next | nearest | linear | value | zero."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.fill(
        df._jdf, method, float(fill_value), key, ts, value))


def trim_leading(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.trimLeading(
        df._jdf, key, ts, value))


def trim_trailing(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.trimTrailing(
        df._jdf, key, ts, value))


def slice(df, start_ticks, end_ticks, ts="ts_nanos"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.slice(
        df._jdf, int(start_ticks), int(end_ticks), ts))


def downsample(df, n, phase=0, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.downsample(
        df._jdf, int(n), int(phase), key, ts, value))


def upsample(df, jindex, fill_method=None, key="key", ts="ts_nanos",
             value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.upsample(
        df._jdf, jindex, opt(jvm, fill_method), key, ts, value))


def align(df, jindex, fill_method=None, key="key", ts="ts_nanos",
          value="value", strategy="series"):
    """Rebase every series onto a DateTimeIndex (graft.index constructors)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.align(
        df._jdf, jindex, opt(jvm, fill_method), key, ts, value, strategy))


def asof_join(left, right, value_out="asof_value", tolerance_ticks=None,
              key="key", ts="ts_nanos", right_value="value"):
    spark, jvm = ctx(left)
    tol = int(tolerance_ticks) if tolerance_ticks is not None else (2 ** 63 - 1)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.asofJoin(
        left._jdf, right._jdf, value_out, tol, key, ts, right_value))


def resample(df, width_ticks, agg="avg", closed_right=False, stamp_right=False,
             origin_ticks=0, key="key", ts="ts_nanos", value="value"):
    """Fixed-width buckets; agg: avg|sum|min|max|count|first|last."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.resample(
        df._jdf, int(width_ticks), agg, bool(closed_right), bool(stamp_right),
        int(origin_ticks), key, ts, value))


def resample_calendar(df, unit, agg="avg", key="key", ts="ts_nanos",
                      value="value", tick_nanos=1):
    """Calendar buckets (unit: DAY, HOUR, WEEK, ...); tick_nanos is the
    nanoseconds per unit of the ts column (1000 for a micros column)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.resampleCalendar(
        df._jdf, unit, agg, key, ts, value, int(tick_nanos)))


def differences_by_interval(df, interval_ticks, key="key", ts="ts_nanos",
                            value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.differencesByInterval(
        df._jdf, int(interval_ticks), key, ts, value))


def filter_starting_before(df, t_ticks, key="key", ts="ts_nanos",
                           value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.filterStartingBefore(
        df._jdf, int(t_ticks), key, ts, value))


def filter_ending_after(df, t_ticks, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.filterEndingAfter(
        df._jdf, int(t_ticks), key, ts, value))


def remove_instants_with_nans(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.removeInstantsWithNaNs(
        df._jdf, key, ts, value))


def series_stats(df, key="key", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.seriesStats(
        df._jdf, key, value))


def autocorr(df, lags_wanted, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.autocorr(
        df._jdf, to_seq(jvm, [int(x) for x in lags_wanted]), key, ts, value))


def series_percentiles(df, ps, key="key", value="value"):
    """Exact per-key percentiles (p50, p90, ...) — quality-cutoff primitive."""
    spark, jvm = ctx(df)
    lst = jvm.java.util.ArrayList()
    for p in ps:
        lst.add(float(p))
    seq = jvm.scala.jdk.javaapi.CollectionConverters.asScala(lst).toSeq()
    return lift(spark, jvm.graft.ts.TimeSeriesOps.seriesPercentiles(
        df._jdf, seq, key, value))


def to_instants(df, keys, key="key", ts="ts_nanos", value="value"):
    """Long-form -> wide: one row per instant, one column per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.toInstants(
        df._jdf, to_seq(jvm, [str(k) for k in keys]), key, ts, value))


def to_series(df, jindex, key="key", ts="ts_nanos", value="value"):
    """Long-form -> series layout: one row per key, array column of values."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.toSeries(
        df._jdf, jindex, key, ts, value))


def from_series(df, jindex, key="key", series_col="series"):
    """Series layout -> long-form observations."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.fromSeries(
        df._jdf, jindex, key, series_col))


def roll_median(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    """Exact rolling median (robust rolling center), full windows only."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollMedian(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def roll_quantile(df, n, q, align="right", key="key", ts="ts_nanos",
                  value="value"):
    """Exact rolling nearest-rank quantile (the ceil(q*n)-th smallest of
    each full window) — rolling p95/p99 latency-style monitors."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollQuantile(
        df._jdf, int(n), float(q), roll_align(jvm, align), key, ts, value))


def seasonal_decompose(df, period, key="key", ts="ts_nanos", value="value"):
    """Additive decomposition: adds trend / seasonal / resid columns."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.seasonalDecompose(
        df._jdf, int(period), key, ts, value))


def cusum(df, key="key", ts="ts_nanos", value="value"):
    """Standardized CUSUM series for mean-shift detection."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.cusum(
        df._jdf, key, ts, value))


def cusum_changepoint(df, key="key", ts="ts_nanos", value="value"):
    """Per-key argmax |CUSUM|: changepoint location + statistic."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.cusumChangepoint(
        df._jdf, key, ts, value))


def cross_correlation(df, max_lag, key="key", ts="ts_nanos", x="x", y="y"):
    """Per-key cross-correlation of two aligned columns at leads 0..max_lag."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.crossCorrelation(
        df._jdf, int(max_lag), key, ts, x, y))


def winsorize(df, lo=0.05, hi=0.95, key="key", value="value"):
    """Clip each value into its key's exact [lo, hi] percentile band."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.winsorize(
        df._jdf, float(lo), float(hi), key, value))


def linear_trend(df, key="key", ts="ts_nanos", value="value"):
    """Per-key OLS slope/intercept over 0-based series position."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.linearTrend(
        df._jdf, key, ts, value))


def roll_range(df, n, align="right", key="key", ts="ts_nanos", value="value"):
    """Sliding min/max/range envelope of width n (full windows only)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollRange(
        df._jdf, int(n), roll_align(jvm, align), key, ts, value))


def seasonal_strength(df, period, key="key", ts="ts_nanos", value="value"):
    """STL-era diagnostics: per-key seasonal and trend strength in [0, 1]."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.seasonalStrength(
        df._jdf, int(period), key, ts, value))


def max_drawdown(df, key="key", ts="ts_nanos", value="value"):
    """Per-key max peak-to-trough decline + earliest trough instant."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.maxDrawdown(
        df._jdf, key, ts, value))


def gap_stats(df, key="key", ts="ts_nanos"):
    """Per-key sampling-gap diagnostics: n/max/sum/median of ts deltas."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.gapStats(df._jdf, key, ts))


def value_entropy(df, bins=10, key="key", value="value"):
    """Per-key Shannon entropy (nats) over equal-width value bins."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.valueEntropy(
        df._jdf, int(bins), key, value))


def mean_crossings(df, key="key", ts="ts_nanos", value="value"):
    """Per-key mean-crossing count, above-mean count, longest above run."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.meanCrossings(
        df._jdf, key, ts, value))


def mad_stats(df, key="key", value="value"):
    """Per-key exact median + median absolute deviation (robust scale)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.madStats(df._jdf, key, value))


def linear_trend_quantized(df, grid_scale=1e6, key="key", ts="ts_nanos",
                           value="value"):
    """Engine-exact OLS trend: integer sums on a 1/grid_scale value grid."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.linearTrendQuantized(
        df._jdf, float(grid_scale), key, ts, value))


def pacf(df, max_lag=3, key="key", ts="ts_nanos", value="value"):
    """Per-key partial autocorrelation at lags 1..max_lag (Durbin-Levinson)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.pacf(
        df._jdf, int(max_lag), key, ts, value))


def cointegration_eg(df, key="key", ts="ts_nanos", y="y", x="x"):
    """Engle-Granger cointegration stat of y vs x per key (residual DF t)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.cointegrationEG(
        df._jdf, key, ts, y, x))


def granger_f(df, key="key", ts="ts_nanos", y="y", x="x"):
    """Single-lag Granger-causality F statistic of x -> y per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.grangerF(
        df._jdf, key, ts, y, x))


def roll_corr(df, n, align="right", key="key", ts="ts_nanos", x="x", y="y"):
    """Rolling correlation of two co-sampled columns over an n-row window."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.rollCorr(
        df._jdf, int(n), roll_align(jvm, align), key, ts, x, y))


def half_life(df, key="key", ts="ts_nanos", value="value"):
    """AR(1) phi + mean-reversion half-life (-ln2/ln(phi)) per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.halfLife(
        df._jdf, key, ts, value))


def spearman_corr(df, key="key", x="x", y="y"):
    """Per-key Spearman rank correlation (mid-ranks for ties)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.spearmanCorr(
        df._jdf, key, x, y))


def ks_drift(df, key="key", ts="ts_nanos", value="value"):
    """First-half vs second-half two-sample KS D per key (drift detector)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.ksDrift(
        df._jdf, key, ts, value))


def hurst(df, key="key", ts="ts_nanos", value="value"):
    """Aggregated-variance Hurst exponent (block sizes 1,2,4,8,16)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.hurst(
        df._jdf, key, ts, value))


def ou_fit(df, key="key", ts="ts_nanos", value="value"):
    """Closed-form Ornstein-Uhlenbeck fit (kappa, theta, sigma) per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.ouFit(
        df._jdf, key, ts, value))


def benford_deviation(df, key="key", value="value"):
    """Benford first-digit total-variation deviation per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.ts.TimeSeriesOps.benfordDeviation(
        df._jdf, key, value))


def map_series(df, fn, series_col="series"):
    """Apply a whole-series Python transform to every key's series array
    (reference map_series: python/sparkts/timeseriesrdd.py:77-94). ``df``
    is in the series layout (see :func:`to_series`); ``fn`` maps a list of
    floats to a same-length list of floats and runs executor-side as a
    Python UDF — the py4j route cannot ship a Python closure to the JVM, so
    this mirrors graft.ts.TimeSeriesOps.mapSeries's UDF shape in Python.
    NaN-safe: the array is passed as-is, gaps included."""
    from pyspark.sql import functions as F, types as T
    u = F.udf(lambda v: None if v is None else [float(x) for x in fn(list(v))],
              T.ArrayType(T.DoubleType()))
    return df.withColumn(series_col, u(F.col(series_col)))


def map_series_with_key(df, fn, key="key", series_col="series"):
    """:func:`map_series` with the series key visible to the transform
    (reference map_series_with_key surface: TimeSeries.scala:340 — the
    Python bindings never exposed it; provided here for key-dependent
    kernels such as per-instrument calibration constants).
    ``fn(key, values) -> values``."""
    from pyspark.sql import functions as F, types as T
    u = F.udf(lambda k, v: None if v is None else [float(x) for x in fn(k, list(v))],
              T.ArrayType(T.DoubleType()))
    return df.withColumn(series_col,
                         u(F.col(key).cast("string"), F.col(series_col)))


def forecast_accuracy(df, key="key", ts="ts_nanos", actual="actual",
                      predicted="predicted"):
    """Per-key forecast evaluation: MAE, RMSE, MAPE (zero-actual rows
    excluded, count reported) and Hyndman-Koehler MASE (MAE scaled by the
    in-sample one-step naive MAE)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.forecastAccuracy(
        df._jdf, key, ts, actual, predicted))


def periodogram(df, max_k=16, key="key", ts="ts_nanos", value="value"):
    """Classical periodogram at Fourier frequencies k=1..max_k over the
    mean-centered series — direct O(n*max_k) sums, engine-reproducible."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.periodogram(
        df._jdf, int(max_k), key, ts, value))


def dominant_period(df, max_k=16, key="key", ts="ts_nanos", value="value"):
    """Dominant period per key: argmax periodogram power (earliest k on
    exact ties)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.dominantPeriod(
        df._jdf, int(max_k), key, ts, value))


def var_fit(df, key="key", ts="ts_nanos", x="x", y="y"):
    """Bivariate VAR(1) fit per key: closed-form 2x2 normal equations from
    one keyed covariance aggregate (coefficients a11..a22 + intercepts)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varFit(
        df._jdf, key, ts, x, y))


def varp_fit(df, p, value_cols, key="key", ts="ts_nanos"):
    """n-variate VAR(p) fit per key: equation-wise OLS with a streamed Gram
    matrix and a local pivoted solve. Long output: one row per (key, eq,
    term, lag) — term 'c' (lag 0) is the intercept. Singular/collinear
    series yield no rows, never a fabricated solve."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpFit(
        df._jdf, int(p), jl, key, ts))


def granger_lag_p(df, p, key="key", ts="ts_nanos", y="y", x="x"):
    """Lag-p Granger causality F per key (restricted vs unrestricted OLS in
    one kernel pass); F ~ F(p, n_obs - 2p - 1) under the null. The p=1
    statistic equals the closed-form granger_f."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.grangerLagP(
        df._jdf, int(p), key, ts, y, x))


def varp_forecast(df, p, h, value_cols, key="key", ts="ts_nanos"):
    """h-step iterated VAR(p) point forecast per key (forecasts fed back
    in); future ts extrapolates the median observed step."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpForecast(
        df._jdf, int(p), int(h), jl, key, ts))


def varp_order_select(df, pmax, value_cols, key="key", ts="ts_nanos"):
    """AIC/BIC/HQIC for VAR orders p = 1..pmax per key, all scored on the
    same effective sample from ONE streamed pass (the pmax Gram matrix
    nests every smaller order). One row per (key, p)."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpOrderSelect(
        df._jdf, int(pmax), jl, key, ts))


def varp_best_order(df, pmax, value_cols, key="key", ts="ts_nanos"):
    """Argmin order per key for each criterion (ties to the smaller p):
    columns (key, best_aic, best_bic, best_hqic)."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpBestOrder(
        df._jdf, int(pmax), jl, key, ts))


def varp_irf(df, p, h, value_cols, key="key", ts="ts_nanos"):
    """Impulse responses of the per-key VAR(p) fit, horizons 0..h: plain
    MA coefficients plus Cholesky-orthogonalized responses (identification
    by variable order). Columns (key, step, impulse, response, irf,
    irf_orth)."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpIrf(
        df._jdf, int(p), int(h), jl, key, ts))


def varp_fevd(df, p, h, value_cols, key="key", ts="ts_nanos"):
    """Forecast-error variance decomposition at horizon h: per (key,
    variable) the share of forecast error variance attributable to each
    orthogonalized shock (shares sum to 1)."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpFevd(
        df._jdf, int(p), int(h), jl, key, ts))


def varp_forecast_intervals(df, p, h, value_cols, level=0.95, key="key",
                            ts="ts_nanos"):
    """h-step VAR(p) forecast with normal-theory prediction bands:
    columns (key, step, ts, eq, value, se, lo, hi); point values identical
    to varp_forecast."""
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in value_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.varpForecastIntervals(
        df._jdf, int(p), int(h), jl, float(level), key, ts))
