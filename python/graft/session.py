"""SparkSession setup for the graft library from Python."""

DEFAULT_CLASSES = "target/scala-2.13/classes"


def configure(builder, classes=None, shuffle_partitions=4):
    """Apply graft's required session config to a SparkSession.Builder.

    Mirrors the Scala side's ``graft.Tables.configure``: nanos-parquet
    handling, UTC session zone, AQE, and the graft SQL extensions
    (rolling_hash, canonical_fingerprint, bpeish_token_count, simhash64,
    hamming64, cosine_similarity, dot_product).

    ``classes`` is the path to the compiled graft classes (or a jar); it is
    added to the driver classpath so the py4j wrappers can resolve the
    library. Pass None if the classpath is already set up (e.g. spark-submit
    --jars).
    """
    b = (
        builder.config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    )
    if classes is not None:
        b = b.config("spark.driver.extraClassPath", classes)
    return b
