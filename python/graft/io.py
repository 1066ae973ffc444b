"""Table loaders and time-series IO (parity: reference CSV/parquet loaders)."""

from ._java import ctx, lift


def events(spark, sf_dir):
    """The events observations table (nanos-parquet handled by the library)."""
    _, jvm = ctx(spark)
    return lift(spark, jvm.graft.Tables.events(spark._jsparkSession, sf_dir))


def documents(spark, sf_dir):
    _, jvm = ctx(spark)
    return lift(spark, jvm.graft.Tables.documents(spark._jsparkSession, sf_dir))


def embeddings(spark, sf_dir):
    _, jvm = ctx(spark)
    return lift(spark, jvm.graft.Tables.embeddings(spark._jsparkSession, sf_dir))


def read_yahoo_csv(spark, path):
    """Yahoo-finance-format CSV -> observations DataFrame."""
    _, jvm = ctx(spark)
    return lift(spark, jvm.graft.io.TimeSeriesIO.readYahooCsv(
        spark._jsparkSession, path))


def read_series_parquet(spark, path):
    """Series-layout parquet + index sidecar -> (DataFrame, JVM DateTimeIndex)."""
    _, jvm = ctx(spark)
    t = jvm.graft.io.TimeSeriesIO.readSeriesParquet(spark._jsparkSession, path)
    return lift(spark, t._1()), t._2()


def write_series_parquet(df, jindex, path):
    """Series-layout DataFrame + JVM DateTimeIndex -> parquet with sidecar."""
    _, jvm = ctx(df)
    jvm.graft.io.TimeSeriesIO.writeSeriesParquet(df._jdf, jindex, path)
