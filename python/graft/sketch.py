"""Certified approximate aggregates (HLL / GK quantiles / count-min / Bloom).

Each function runs the qs* certification query: the sketch estimate AND the
exact answer computed in one query, returned as (key, check_name, ok) rows
whose booleans assert the sketch's published error bound with margin. The
production operators themselves are pyspark-native
(`approx_count_distinct`, `percentile_approx`, `df.stat.countMinSketch`,
`df.stat.bloomFilter`); these wrappers certify they are safe to lean on.
"""

from ._java import ctx, lift


def certify_hll(spark, sf_dir):
    """HLL distinct counts vs exact, global + per-group merge (qs01)."""
    spark, jvm = ctx(spark)
    return lift(spark, jvm.graft.sketch.Sketches.hll(
        spark._jsparkSession, sf_dir))


def certify_quantiles(spark, sf_dir):
    """Greenwald-Khanna quantiles vs exact rank positions (qs02)."""
    spark, jvm = ctx(spark)
    return lift(spark, jvm.graft.sketch.Sketches.quantiles(
        spark._jsparkSession, sf_dir))


def certify_cms(spark, sf_dir):
    """Count-min token frequencies vs exact heavy-hitter counts (qs03)."""
    spark, jvm = ctx(spark)
    return lift(spark, jvm.graft.sketch.Sketches.cms(
        spark._jsparkSession, sf_dir))


def certify_bloom(spark, sf_dir):
    """Bloom filter membership: no false negatives, bounded fpp (qs04)."""
    spark, jvm = ctx(spark)
    return lift(spark, jvm.graft.sketch.Sketches.bloom(
        spark._jsparkSession, sf_dir))
