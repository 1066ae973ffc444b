"""py4j plumbing shared by the wrapper modules (internal)."""

from pyspark.sql import DataFrame, SparkSession


def ctx(df_or_spark):
    """(spark, jvm) from a DataFrame or SparkSession."""
    spark = (
        df_or_spark
        if isinstance(df_or_spark, SparkSession)
        else df_or_spark.sparkSession
    )
    return spark, spark._jvm


def lift(spark, jdf):
    """Wrap a JVM DataFrame as a PySpark DataFrame."""
    return DataFrame(jdf, spark)


def opt(jvm, value):
    """Python value (or None) -> scala.Option."""
    return jvm.scala.Option.apply(value)


def long_array(spark, values):
    """Python ints -> JVM long[]."""
    gateway = spark.sparkContext._gateway
    arr = gateway.new_array(spark._jvm.long, len(values))
    for i, v in enumerate(values):
        arr[i] = int(v)
    return arr


def to_seq(jvm, values):
    """Python iterable -> scala.collection.immutable.Seq."""
    lst = jvm.java.util.ArrayList()
    for v in values:
        lst.add(v)
    return jvm.scala.jdk.javaapi.CollectionConverters.asScala(lst).toSeq()


def roll_align(jvm, align):
    """'left' | 'center' | 'right' -> graft.ts.RollAlign value."""
    ra = jvm.graft.ts.RollAlign
    try:
        return {"left": ra.Left, "center": ra.Center, "right": ra.Right}[
            align.lower()
        ]()
    except KeyError:
        raise ValueError(f"align must be left/center/right, got {align!r}")


def zone_id(jvm, zone):
    """Zone string -> java.time.ZoneId."""
    return jvm.java.time.ZoneId.of(zone)
