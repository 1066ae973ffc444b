package graft.ts

import org.apache.spark.sql.{Column, DataFrame}

import graft.core.DateTimeIndex

/**
 * Fluent syntax over [[TimeSeriesOps]] for observation-layout frames:
 *
 * {{{
 * import graft.ts.syntax._
 * obs.asTimeSeries("user_id", "ts_us")
 *    .fill("linear").rollMean(7).differences()
 * }}}
 */
object syntax {

  implicit class TimeSeriesDataFrame(private val df: DataFrame) extends AnyVal {
    def asTimeSeries(key: String = "key", ts: String = "ts_nanos",
        value: String = "value"): TsFrame = TsFrame(df, key, ts, value)
  }

  /** A DataFrame tagged with its (key, ts, value) column roles. */
  case class TsFrame(df: DataFrame, key: String, ts: String, value: String) {
    private def next(d: DataFrame): TsFrame = copy(df = d)

    def lags(maxLag: Int, trim: Boolean = true): TsFrame =
      next(TimeSeriesOps.lags(df, maxLag, trim, key, ts, value))
    def differences(n: Int = 1): TsFrame =
      next(TimeSeriesOps.differences(df, n, key, ts, value))
    def quotients(n: Int = 1): TsFrame =
      next(TimeSeriesOps.quotients(df, n, key, ts, value))
    def returnRates: TsFrame =
      next(TimeSeriesOps.returnRates(df, key, ts, value))
    def rollSum(n: Int, align: RollAlign.Value = RollAlign.Right): TsFrame =
      next(TimeSeriesOps.rollSum(df, n, align, key, ts, value))
    def rollMean(n: Int, align: RollAlign.Value = RollAlign.Right): TsFrame =
      next(TimeSeriesOps.rollMean(df, n, align, key, ts, value))
    def fill(method: String, fillValue: Double = 0.0): TsFrame =
      next(TimeSeriesOps.fill(df, method, fillValue, key, ts, value))
    def trimLeading: TsFrame = next(TimeSeriesOps.trimLeading(df, key, ts, value))
    def trimTrailing: TsFrame = next(TimeSeriesOps.trimTrailing(df, key, ts, value))
    def slice(start: Long, end: Long): TsFrame =
      next(TimeSeriesOps.slice(df, start, end, ts))
    def downsample(n: Int, phase: Int = 0): TsFrame =
      next(TimeSeriesOps.downsample(df, n, phase, key, ts, value))
    def upsample(dense: DateTimeIndex, fillMethod: Option[String] = None): TsFrame =
      next(TimeSeriesOps.upsample(df, dense, fillMethod, key, ts, value))
    def align(index: DateTimeIndex, fillMethod: Option[String] = None): TsFrame =
      next(TimeSeriesOps.align(df, index, fillMethod, key, ts, value))
    def asofJoin(right: DataFrame, valueOut: String = "asof_value",
        toleranceTicks: Long = Long.MaxValue): TsFrame =
      next(TimeSeriesOps.asofJoin(df, right, valueOut, toleranceTicks, key, ts, value))
    def resample(widthTicks: Long, aggFn: Column => Column,
        closedRight: Boolean = false, stampRight: Boolean = false): TsFrame =
      next(TimeSeriesOps.resample(df, widthTicks, aggFn, closedRight, stampRight,
        0L, key, ts, value))
    def differencesByInterval(ticks: Long): TsFrame =
      next(TimeSeriesOps.differencesByInterval(df, ticks, key, ts, value))
    def removeInstantsWithNaNs: TsFrame =
      next(TimeSeriesOps.removeInstantsWithNaNs(df, key, ts, value))
    def filterByInstant(pred: Column => Column, keys: Seq[Any]): TsFrame =
      next(TimeSeriesOps.filterByInstant(df, pred, keys, key, ts, value))
    def seriesStats: DataFrame = TimeSeriesOps.seriesStats(df, key, value)
    def toInstants(keys: Seq[String]): DataFrame =
      TimeSeriesOps.toInstants(df, keys, key, ts, value)
    def toSeries(index: DateTimeIndex): DataFrame =
      TimeSeriesOps.toSeries(df, index, key, ts, value)

    def fitArima(p: Int, d: Int, q: Int): DataFrame =
      graft.models.ModelOps.fitArima(df, p, d, q, key, ts, value).toDF()
    def forecastArima(p: Int, d: Int, q: Int, h: Int): DataFrame =
      graft.models.ModelOps.forecastArima(df, p, d, q, h, key, ts, value).toDF()
    def fitEwma: DataFrame = graft.models.ModelOps.fitEwma(df, key, ts, value).toDF()
  }
}
