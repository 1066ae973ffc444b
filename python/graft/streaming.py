"""Structured Streaming facades: watermarked resample/sessions, stateful
EWMA/outliers, streaming dedup/decontamination, bounded-state sketches.

Each wrapper returns an unbounded pyspark DataFrame ready for
`.writeStream` — the Scala operators carry the state design (watermark
bounds, mapGroupsWithState summaries), so a Python pipeline gets the same
100 TB behavior. `tumbling` is implemented natively here because its Scala
signature takes a Column-function argument py4j cannot cross.
"""

from pyspark.sql import functions as F

from ._java import ctx, lift, opt


def tumbling(stream, width, watermark, agg="sum", key="key", ts="ts",
             value="value"):
    """Watermarked tumbling-window resample; `agg` is a
    pyspark.sql.functions aggregate name (sum/avg/min/max/count)."""
    agg_fn = getattr(F, agg)
    return (stream.withWatermark(ts, watermark)
            .groupBy(F.col(key), F.window(F.col(ts), width))
            .agg(agg_fn(F.col(value)).alias(value))
            .select(F.col(key), F.col("window.start").alias("bucket_start"),
                    F.col("window.end").alias("bucket_end"), F.col(value)))


def tumbling_modes(stream, width_us, watermark, agg="sum",
                   closed_right=False, stamp_right=False, origin_us=0,
                   key="key", ts="ts", value="value"):
    """Tumbling resample with the batch operator's four closedRight x
    stampRight boundary modes (same long arithmetic as
    ts.TimeSeriesOps.resample / StreamingResample.tumblingModes) —
    implemented natively because the Scala signature takes a
    Column-function py4j cannot cross.

    The watermark is declared on the DERIVED bucket column (event-time
    metadata does not survive expression arithmetic; on the raw ts it
    would be inert and append mode rejected). Size it as tolerated
    lateness plus one bucket width."""
    agg_fn = getattr(F, agg)
    ts_us = F.unix_micros(F.col(ts))
    m = F.pmod(ts_us - F.lit(origin_us), F.lit(width_us))
    if closed_right:
        bucket = F.when(m == 0, ts_us - width_us).otherwise(ts_us - m)
    else:
        bucket = ts_us - m
    stamp = (bucket + width_us) if stamp_right else bucket
    return (stream
            .withColumn("__bucket", F.timestamp_micros(stamp.cast("long")))
            .withWatermark("__bucket", watermark)
            .groupBy(F.col(key), F.col("__bucket"))
            .agg(agg_fn(F.col(value)).alias(value))
            .select(F.col(key), F.col("__bucket").alias("bucket_ts"),
                    F.col(value)))


def sliding(stream, width, slide, watermark, key="key", ts="ts",
            value="value"):
    """Sliding-window mean + count on a stream."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingResample.sliding(
        stream._jdf, width, slide, watermark, key, ts, value))


def sessions(stream, gap, watermark, key="key", ts="ts", value="value"):
    """Gap sessionization via session_window; emits on watermark close."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingResample.streamingSessions(
        stream._jdf, gap, watermark, key, ts, value))


def ewma(stream, alpha, key="key", value="value"):
    """Per-key streaming EWMA state via mapGroupsWithState."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingResample.streamingEwma(
        stream._jdf, float(alpha), key, value))


def outliers(stream, threshold, min_obs=10, key="key", seq="ts_nanos",
             value="value", state_ttl=None):
    """Per-key streaming z-score outliers (Welford state)."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingResample.streamingOutliers(
        stream._jdf, float(threshold), int(min_obs), key, seq, value,
        opt(jvm, state_ttl)))


def exact_dedup(stream, text_col="text", ts_col="event_time",
                watermark="10 minutes"):
    """Drop duplicate documents (canonical fingerprint) within the
    watermark window."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingDedup.streamingExactDedup(
        stream._jdf, text_col, ts_col, watermark))


def corpus_buckets(corpus, text_col="text", id_col="doc_id", k=3,
                   num_hashes=64, bands=16):
    """Static minhash band buckets — build once, reuse for every stream."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.streaming.StreamingDedup.corpusBuckets(
        corpus._jdf, text_col, id_col, int(k), int(num_hashes), int(bands)))


def near_dup_against_corpus(stream, corpus_bk, text_col="text",
                            id_col="doc_id", ts_col="event_time",
                            watermark="10 minutes", k=3, num_hashes=64,
                            bands=16, threshold=0.7):
    """Near-dup pairs between a document stream and a static corpus
    (minhash band join + exact Jaccard verify)."""
    spark, jvm = ctx(stream)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.streamingNearDupAgainstCorpus(
                    stream._jdf, corpus_bk._jdf, text_col, id_col, ts_col,
                    watermark, int(k), int(num_hashes), int(bands),
                    float(threshold)))


def exact_dedup_against_index(stream, index, text_col="text",
                              ts_col="event_time", watermark="10 minutes",
                              canonical=False):
    """Drop stream docs whose fingerprint exists in a persisted
    graft.text.exact_index, then dedup survivors within the watermark."""
    spark, jvm = ctx(stream)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.streamingExactDedupAgainstIndex(
                    stream._jdf, index._jdf, text_col, ts_col, watermark,
                    bool(canonical)))


def near_dup_against_index(stream, index, text_col="text", id_col="doc_id",
                           ts_col="event_time", watermark="10 minutes",
                           k=3, num_hashes=64, bands=16, threshold=0.7):
    """Near-dup pairs between a document stream and a persisted
    graft.text.minhash_index — the SAME artifact the batch incremental
    dedup uses, so one index serves both ingest modes."""
    spark, jvm = ctx(stream)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.streamingNearDupAgainstIndex(
                    stream._jdf, index._jdf, text_col, id_col, ts_col,
                    watermark, int(k), int(num_hashes), int(bands),
                    float(threshold)))


def corpus_embedding_buckets(corpus, id_col="vec_id", vec_col="embedding",
                             bands=8, planes_per_band=8, seed=7):
    """Static hyperplane band buckets for streaming embedding near-dup."""
    spark, jvm = ctx(corpus)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.corpusEmbeddingBuckets(
                    corpus._jdf, id_col, vec_col, int(bands),
                    int(planes_per_band), int(seed)))


def embedding_near_dup(stream, corpus_bk, id_col="vec_id",
                       vec_col="embedding", ts_col="event_time",
                       watermark="10 minutes", threshold=0.95, bands=8,
                       planes_per_band=8, seed=7):
    """Near-dup pairs between an embedding stream and a static corpus
    (hyperplane band join + exact cosine verify)."""
    spark, jvm = ctx(stream)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.streamingEmbeddingNearDup(
                    stream._jdf, corpus_bk._jdf, id_col, vec_col, ts_col,
                    watermark, float(threshold), int(bands),
                    int(planes_per_band), int(seed)))


def semantic_decontaminate(stream, holdout_bk, id_col="vec_id",
                           vec_col="embedding", ts_col="event_time",
                           watermark="10 minutes", threshold=0.9, bands=8,
                           planes_per_band=8, seed=7):
    """Flag incoming vectors whose exact cosine to any holdout vector
    reaches the threshold (streaming face of text.semantic_decontaminate;
    holdout_bk = corpus_embedding_buckets(holdout)). One row per
    contaminated stream id within the watermark."""
    spark, jvm = ctx(stream)
    return lift(
        spark,
        jvm.graft.streaming.StreamingDedup.streamingSemanticDecontaminate(
            stream._jdf, holdout_bk._jdf, id_col, vec_col, ts_col,
            watermark, float(threshold), int(bands),
            int(planes_per_band), int(seed)))


def holdout_shingles(holdout, text_col="text", k=3):
    """Static distinct k-shingle set of the evaluation holdout."""
    spark, jvm = ctx(holdout)
    return lift(spark, jvm.graft.streaming.StreamingDedup.holdoutShingles(
        holdout._jdf, text_col, int(k)))


def decontaminate(stream, holdout_sh, text_col="text", id_col="doc_id",
                  ts_col="event_time", watermark="10 minutes", k=3):
    """Flag streamed documents sharing any k-shingle with the holdout."""
    spark, jvm = ctx(stream)
    return lift(spark,
                jvm.graft.streaming.StreamingDedup.streamingDecontaminate(
                    stream._jdf, holdout_sh._jdf, text_col, id_col, ts_col,
                    watermark, int(k)))


def heavy_hitters(stream, text_col="text", shards=8, capacity=64):
    """Sharded Space-Saving heavy hitters: O(shards x capacity) state with
    the Metwally bounds (count - err <= true <= count)."""
    spark, jvm = ctx(stream)
    return lift(spark, jvm.graft.streaming.StreamingSketch.streamingHeavyHitters(
        stream._jdf, text_col, int(shards), int(capacity)).toDF())
