"""Distributed per-key model fits and forecasts (parity: reference
python/sparkts/models/*.py — ARIMA, EWMA, GARCH, HoltWinters, plus the
stat-test lifts). Each call runs the Scala kernel per key inside the
executors (mapGroups) and returns a flat DataFrame of fits / forecasts.
"""

from ._java import ctx, lift


def _m(jvm):
    return jvm.graft.models.ModelOps


def fit_arima(df, p, d, q, key="key", ts="ts_nanos", value="value",
              include_intercept=True):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitArima(
        df._jdf, int(p), int(d), int(q), key, ts, value,
        bool(include_intercept)).toDF())


def auto_fit_arima(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).autoFitArima(df._jdf, key, ts, value).toDF())


def forecast_arima(df, p, d, q, h, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).forecastArima(
        df._jdf, int(p), int(d), int(q), int(h), key, ts, value).toDF())


def fit_ewma(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitEwma(df._jdf, key, ts, value).toDF())


def ewma_smoothed(df, alpha, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).ewmaSmoothed(
        df._jdf, float(alpha), key, ts, value).toDF())


def forecast_ewma(df, h, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).forecastEwma(
        df._jdf, int(h), key, ts, value).toDF())


def fit_garch(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitGarch(df._jdf, key, ts, value).toDF())


def fit_egarch(df, key="key", ts="ts_nanos", value="value"):
    """Nelson (1991) EGARCH(1,1) per key: leverage-asymmetric volatility.

    Returns (key, omega, alpha, gamma, beta, logLikelihood). The reference
    stubs this model; graft implements it fully (fit + simulate + exact
    add/remove-effects inverse pair).
    """
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitEgarch(df._jdf, key, ts, value).toDF())


def fit_ar(df, p, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitAr(df._jdf, int(p), key, ts, value).toDF())


def fit_holt_winters(df, period, model_type="additive", key="key",
                     ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitHoltWinters(
        df._jdf, int(period), model_type, key, ts, value).toDF())


def forecast_holt_winters(df, period, h, model_type="additive", key="key",
                          ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).forecastHoltWinters(
        df._jdf, int(period), int(h), model_type, key, ts, value).toDF())


def kpss_all(df, regression="c", key="key", ts="ts_nanos", value="value",
             lags=-1):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).kpssAll(
        df._jdf, regression, key, ts, value, int(lags)).toDF())


def adf_all(df, regression="c", key="key", ts="ts_nanos", value="value",
            max_lag=-1):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).adfAll(
        df._jdf, regression, key, ts, value, int(max_lag)).toDF())


def ljung_box_all(df, lags=10, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).ljungBoxAll(
        df._jdf, int(lags), key, ts, value).toDF())


def durbin_watson_all(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).durbinWatsonAll(df._jdf, key, ts, value).toDF())


def breusch_godfrey_all(df, lags=2, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).breuschGodfreyAll(
        df._jdf, int(lags), key, ts, value).toDF())


def breusch_pagan_all(df, key="key", ts="ts_nanos", value="value"):
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).breuschPaganAll(df._jdf, key, ts, value).toDF())


def theil_sen(df, key="key", ts="ts_nanos", value="value"):
    """Robust Theil-Sen slope/intercept per key (median of pair slopes)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.stats.RobustRegression.theilSen(
        df._jdf, key, ts, value))


def holt_smoothed(df, alpha, beta, key="key", ts="ts_nanos", value="value"):
    """Fixed-parameter Holt linear smoothing: per-point level + trend."""
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).holtSmoothed(
        df._jdf, float(alpha), float(beta), key, ts, value).toDF())


def mann_kendall_all(df, key="key", ts="ts_nanos", value="value"):
    """Mann-Kendall monotone-trend test per key: S, tau, Var(S), z."""
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).mannKendallAll(df._jdf, key, ts, value).toDF())


def logistic_fit(df, label_col, feature_cols, max_iter=25, tol=1e-8,
                 l2=0.0):
    """Distributed Newton/IRLS logistic regression over numeric feature
    columns: one corpus pass per iteration, bit-deterministic partial
    combine; optional ridge l2 (intercept unpenalized) for separation
    robustness. Long output (term, coef, iter, converged)."""
    from ._java import ctx, lift
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in feature_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.logisticFit(
        df._jdf, label_col, jl, int(max_iter), float(tol), float(l2)))


def logistic_score(df, coefs, feature_cols, score_col="score"):
    """Apply a logistic_fit coefficient table: adds sigmoid(beta.x)."""
    from ._java import ctx, lift
    spark, jvm = ctx(df)
    jl = jvm.java.util.ArrayList()
    for c in feature_cols:
        jl.add(str(c))
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.logisticScore(
        df._jdf, coefs._jdf, jl, score_col))


def fit_arx(df, p, x_max_lag, include_current_x=True, key="key",
            ts="ts_nanos", y="y", x="x"):
    """ARX(p, xMaxLag) least-squares fit of y on its own lags and one
    exogenous regressor column, per key (co-sampled (key, ts, y, x) rows;
    reference models/AutoregressionX.scala:48-130)."""
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).fitArx(
        df._jdf, int(p), int(x_max_lag), bool(include_current_x),
        key, ts, y, x).toDF())


def ar_filter_residuals(df, p, key="key", ts="ts_nanos", value="value"):
    """Per-key AR(p) fit, then removeTimeDependentEffects through the
    TimeSeriesFilter trait (first p entries pass through unchanged)."""
    spark, jvm = ctx(df)
    return lift(spark, _m(jvm).arFilterResiduals(
        df._jdf, int(p), key, ts, value).toDF())
