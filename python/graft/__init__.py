"""graft — Spark-native time-series + training-data analytics, Python bindings.

The importable Python surface over the graft Scala library, the parity
target being the reference's ``python/sparkts`` package (reference
python/sparkts/timeseriesrdd.py:12-199, datetimeindex.py, models/*.py).
graft is DataFrame-first, so the bindings are thin py4j wrappers: every
function takes and returns plain PySpark ``DataFrame`` objects and calls the
SAME Scala operator the JVM API uses — no logic is duplicated in Python, so
results are identical by construction.

Setup: the graft classes must be on the driver classpath and the SQL
extensions registered::

    from pyspark.sql import SparkSession
    import graft

    spark = graft.session.configure(
        SparkSession.builder.master("local[4]"),
        classes="/root/repo/target/scala-2.13/classes",
    ).getOrCreate()

    events = graft.io.events(spark, "/root/testdata/sf0.001")
    daily = graft.timeseries.resample_calendar(
        events, "DAY", "avg", key="user_id", ts="ts_us", value="value",
        tick_nanos=1000)
    fc = graft.models.forecast_arima(daily, 1, 0, 1, 10,
        key="key", ts="day_us", value="value")
"""

from . import (events, functions, index, io, models, multimodal, session, sim,
               sketch, streaming, text, timeseries)

__all__ = [
    "events", "functions", "index", "io", "models", "multimodal", "session",
    "sim", "sketch", "streaming", "text", "timeseries",
]
__version__ = "0.4.0"
