#!/usr/bin/env python3
"""Python-parity smoke for the graft engine.

The reference project shipped Python bindings over its RDD API
(reference: python/sparkts/timeseriesrdd.py:12-199, datetimeindex.py,
models/*.py). graft is DataFrame-first, so Python parity is the
DataFrame + py4j surface: this script drives the SAME Scala library
(compiled classes on the driver classpath) from PySpark through the
flagship pipeline — resample to days, align to the day index with
linear fill, rolling mean, then a per-key ARIMA forecast — and checks
row counts and invariants at every stage.

Run:  python3 tools/pyspark_parity.py [sfDir]
Needs: sbt compile (classes at target/scala-2.13/classes), pyspark 4.x.
"""
import sys

from pyspark.sql import DataFrame, SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = "/root/repo"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-parity")
        # same session config as graft.Tables.configure
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        # the graft library itself + its SQL extension registration
        .config("spark.driver.extraClassPath", f"{repo}/target/scala-2.13/classes")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    jvm = spark._jvm
    jss = spark._jsparkSession

    def lift(jdf) -> DataFrame:
        return DataFrame(jdf, spark)

    # ---- load events through the Scala loader (nanos parquet handling) ----
    events = lift(jvm.graft.Tables.events(jss, sf_dir))
    n_events = events.count()
    assert n_events > 0, "events table is empty"

    # ---- daily resample (calendar buckets) via the Scala operator ----
    from pyspark.sql import functions as F

    daily = (
        events.groupBy(
            F.col("user_id").cast("string").alias("key"),
            F.expr("unix_micros(date_trunc('DAY', timestamp_micros(ts_us)))").alias(
                "day_us"
            ),
        ).agg(F.avg("value").alias("value"))
    )
    n_daily = daily.count()
    assert n_daily > 0

    # ---- align to the full day grid with linear fill (Scala operator) ----
    lo, hi = daily.agg(F.min("day_us"), F.max("day_us")).first()
    instants = list(range(lo, hi + 1, 86_400_000_000))
    gateway = spark.sparkContext._gateway
    j_instants = gateway.new_array(jvm.long, len(instants))
    for i, v in enumerate(instants):
        j_instants[i] = v
    index = jvm.graft.core.IrregularDateTimeIndex(
        j_instants, jvm.java.time.ZoneOffset.UTC
    )
    aligned = lift(
        jvm.graft.ts.TimeSeriesOps.align(
            daily._jdf,
            index,
            jvm.scala.Option.apply("linear"),
            "key",
            "day_us",
            "value",
            "series",
        )
    )
    n_keys = daily.select("key").distinct().count()
    assert aligned.count() == n_keys * index.size(), "align grid incomplete"

    # ---- rolling mean via the Scala operator ----
    roll = lift(
        jvm.graft.ts.TimeSeriesOps.rollMean(
            aligned._jdf,
            3,
            jvm.graft.ts.RollAlign.Right(),
            "key",
            "day_us",
            "value",
        )
    )
    n_roll = roll.count()
    # linear fill leaves leading/trailing gaps null, so full 3-windows are at
    # most (size-2) per key and can be fewer at the series edges
    assert 0 < n_roll <= n_keys * (index.size() - 2), "rollMean trim mismatch"

    # ---- per-key ARIMA(1,0,1) forecast via the Scala model lift ----
    fc = lift(
        jvm.graft.models.ModelOps.forecastArima(
            roll._jdf, 1, 0, 1, 5, "key", "day_us", "value"
        ).toDF()
    )
    n_fc = fc.count()
    assert n_fc == n_keys * 5, f"expected {n_keys * 5} forecast rows, got {n_fc}"

    # ---- SQL extension functions registered by GraftExtensions ----
    spark.sql("SELECT rolling_hash('the quick brown fox') AS h").first()
    fp_row = spark.sql(
        "SELECT canonical_fingerprint('The  Quick FOX!') AS fp, "
        "bpeish_token_count('a b c!') AS n, "
        "simhash64('hello world') AS sh, "
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp"
    ).first()
    assert len(fp_row["fp"]) == 32
    assert fp_row["dp"] == 11.0

    # ---- dedup + similarity through the same Scala library ----
    docs = lift(jvm.graft.Tables.documents(jss, sf_dir))
    n_docs = docs.count()
    dedup = lift(jvm.graft.text.Dedup.exact(docs._jdf, "text", "doc_id", True))
    n_groups = dedup.count()
    assert 0 < n_groups <= n_docs

    # r18 batch-vs-Python parity for the incremental-index surfaces: the
    # Python-side counts must equal the Scala-side counts on the same split
    old_docs = docs.filter("doc_id < 25")
    batch_docs = docs.filter("doc_id >= 25")
    fp_index = lift(jvm.graft.text.Dedup.exactIndex(
        old_docs._jdf, "text", "doc_id", False))
    inc = lift(jvm.graft.api.java.JavaPipelineOps.exactIncremental(
        batch_docs._jdf, fp_index._jdf, "text", "doc_id", False))
    assert inc.count() == batch_docs.count()  # no batch row vanishes
    packed = lift(jvm.graft.api.java.JavaPipelineOps.sequencePacking(
        docs._jdf, 256, "text", "doc_id"))
    n_packed = packed.count()
    assert n_packed == n_docs
    # offsets are a permutation-free global cumsum: max end == token total
    tot = packed.agg({"n_tokens": "sum"}).first()[0]
    last = packed.orderBy(packed.start_offset.desc()).first()
    assert last["start_offset"] + last["n_tokens"] == tot
    # r20: deterministic corpus shuffle — positions are dense 0..n-1 and
    # the md5 ordering matches an independent hashlib recomputation
    import hashlib
    key_cols = jvm.java.util.ArrayList()
    key_cols.add("doc_id")
    shuffled = lift(jvm.graft.api.java.JavaPipelineOps.corpusShuffle(
        docs._jdf, key_cols))
    got = {r["doc_id"]: r["position"]
           for r in shuffled.select("doc_id", "position").collect()}
    assert sorted(got.values()) == list(range(n_docs))
    expect = {i: p for p, i in enumerate(sorted(
        got, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()))}
    assert got == expect, "corpus_shuffle order diverged from hashlib md5"

    emb = lift(jvm.graft.Tables.embeddings(jss, sf_dir))
    knn = lift(
        jvm.graft.sim.Similarity.bruteForceTopK(
            emb._jdf, emb.limit(3)._jdf, 2, "vec_id", "embedding"
        )
    )
    n_knn = knn.count()
    assert n_knn == 3 * 2, f"expected 6 knn rows, got {n_knn}"

    # r20: the LSH recall budget is inspectable from Python BEFORE the
    # operator runs — the explain row mirrors embeddingLshConfig exactly
    cfg = lift(jvm.graft.api.java.JavaPipelineOps.explainEmbeddingLshConfig(
        emb._jdf, "vec_id", 0.95, 0, 0)).first()
    assert cfg["n_vectors"] == emb.count()
    assert cfg["planes_per_band"] >= 8 and cfg["bands"] >= 8
    assert cfg["buckets_per_band"] == 2 ** cfg["planes_per_band"]
    assert 0.0 < cfg["effective_recall"] <= 1.0
    # the auto budget preserves the (8, 8) baseline recall
    assert cfg["effective_recall"] >= cfg["baseline_recall"] - 0.01, cfg

    print(
        f"PYSPARK PARITY OK: events={n_events} daily={n_daily} "
        f"aligned={n_keys * index.size()} roll={n_roll} forecast={n_fc} "
        f"dedup_groups={n_groups} knn={n_knn}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
