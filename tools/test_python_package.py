#!/usr/bin/env python3
"""Test for the importable python/graft package.

Imports the package (no hand-rolled py4j in the test — everything goes
through the wrappers) and drives the flagship pipeline end-to-end: load →
calendar resample → align to the day grid with linear fill → rolling mean →
per-key ARIMA forecast, plus the dedup / similarity / SQL-function surfaces.

Run:  python3 tools/test_python_package.py [sfDir]
Needs: sbt compile (classes at target/scala-2.13/classes), pyspark 4.x.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))

from pyspark.sql import SparkSession, functions as F

import graft


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    spark = graft.session.configure(
        SparkSession.builder.master("local[4]").appName("graft-python-package"),
        classes=f"{repo}/target/scala-2.13/classes",
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # ---- flagship pipeline through the package wrappers ----
    events = graft.io.events(spark, sf_dir)
    n_events = events.count()
    assert n_events > 0, "events table is empty"

    daily = graft.timeseries.resample_calendar(
        events.withColumn("user_id", F.col("user_id").cast("string")),
        "DAY", "avg", key="user_id", ts="ts_us", value="value",
        tick_nanos=1000,
    ).withColumnRenamed("bucket_ts", "day_ts")
    daily = daily.withColumn("day_us", F.unix_micros(F.col("day_ts")))
    n_daily = daily.count()
    assert n_daily > 0

    lo, hi = daily.agg(F.min("day_us"), F.max("day_us")).first()
    idx = graft.index.irregular(
        spark, list(range(lo, hi + 1, 86_400_000_000)))
    aligned = graft.timeseries.align(
        daily, idx, fill_method="linear", key="user_id", ts="day_us",
        value="value")
    n_keys = daily.select("user_id").distinct().count()
    assert aligned.count() == n_keys * idx.size(), "align grid incomplete"

    roll = graft.timeseries.roll_mean(
        aligned, 3, align="right", key="user_id", ts="day_us", value="value")
    n_roll = roll.count()
    assert 0 < n_roll <= n_keys * (idx.size() - 2), "rollMean trim mismatch"

    fc = graft.models.forecast_arima(
        roll, 1, 0, 1, 5, key="user_id", ts="day_us", value="value")
    n_fc = fc.count()
    assert n_fc == n_keys * 5, f"expected {n_keys * 5} forecast rows, got {n_fc}"

    # ---- a second index flavor: uniform day index, same grid ----
    uidx = graft.index.uniform(
        spark, lo * 1000, idx.size(), graft.index.days(spark, 1))
    assert uidx.size() == idx.size()
    assert uidx.nanosAtLoc(0) == lo * 1000

    # ---- stats lift ----
    dw = graft.models.durbin_watson_all(
        aligned, key="user_id", ts="day_us", value="value")
    assert dw.count() == n_keys

    # ---- EGARCH lift (leverage-asymmetric volatility; reference stubs it) ----
    eg = graft.models.fit_egarch(
        aligned, key="user_id", ts="day_us", value="value")
    assert set(eg.columns) >= {"key", "omega", "alpha", "gamma", "beta"}
    assert eg.count() > 0

    # ---- r16: ARX fit + AR TimeSeriesFilter residuals ----
    daily_mkt = aligned.join(
        aligned.groupBy("day_us").agg(F.avg("value").alias("mkt")), "day_us")
    arx = graft.models.fit_arx(
        daily_mkt, 1, 1, include_current_x=True,
        key="user_id", ts="day_us", y="value", x="mkt")
    assert set(arx.columns) >= {"key", "c", "arCoefs", "xCoefs"}
    assert arx.count() > 0
    arf = graft.models.ar_filter_residuals(
        aligned, 1, key="user_id", ts="day_us", value="value")
    assert set(arf.columns) == {"key", "ts", "residual"}
    assert arf.count() > 0

    # ---- text + dedup ----
    docs = graft.io.documents(spark, sf_dir)
    n_docs = docs.count()
    groups = graft.text.dedup_exact(docs)
    assert 0 < groups.count() <= n_docs
    scored = graft.text.quality_score(docs)
    assert scored.filter(F.col("quality_score").isNull()).count() == 0
    langs = graft.text.lang_scores(docs)
    assert "h_zh" in langs.columns and "lang_pred" in langs.columns
    red = graft.text.redact(docs)
    assert red.filter(F.col("n_redactions") > 0).count() > 0
    samp = graft.text.hash_sample(docs, "4")
    assert 0 < samp.count() < n_docs
    ng_exact = graft.text.top_k_ngrams(docs, 5, 10)
    ng_sk = graft.text.top_k_ngrams_sketched(docs, 5, 10, min_count=1,
                                             width=1 << 16)
    assert [tuple(r) for r in ng_sk.collect()] == \
        [tuple(r) for r in ng_exact.collect()]
    zf = graft.text.zipf_fit(docs).first()
    assert zf["n_vocab"] > 0 and zf["zipf_slope"] < 0

    # ---- multimodal: real PNG decode round trip ----
    feats = graft.multimodal.extract_features(
        graft.multimodal.png_assets_from_documents(docs))
    bad = feats.filter(
        (F.col("decoded_width") != F.col("asset_id") % 7 + 1)
        | (F.col("decoded_height") != F.col("asset_id") % 5 + 1)
        | F.col("px_sum").isNull()).count()
    assert bad == 0 and feats.count() > 0

    # ---- round-4 ops: clustering, repetition, sampling, embeddings ----
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])
    cc = graft.text.dup_clusters(docs.select("doc_id"), pairs)
    assert cc.filter(F.col("cluster_id") == 0).count() == 3
    # r18: quality-aware election + cluster-atomic split through the facades
    reps = graft.text.cluster_representatives(
        docs.select("doc_id", F.col("n_chars").alias("q")), pairs, "q")
    assert reps.filter("keep").count() == reps.select("cluster_id").distinct().count()
    split = graft.text.leakage_free_split(docs.select("doc_id"), pairs, 5)
    assert (split.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("k")).filter("k > 1").count() == 0)
    # r18: sequence packing through the facade
    pk = {r["doc_id"]: (r["start_offset"], r["seq_start"], r["seq_end"])
          for r in graft.text.sequence_packing(spark.createDataFrame(
              [(0, "a b c d"), (1, "e f g h i j k l")], ["doc_id", "text"]),
              capacity=10).collect()}
    assert pk == {0: (0, 0, 0), 1: (4, 0, 1)}, pk
    bins = {r["doc_id"]: r["bin"] for r in graft.text.bin_packing(
        spark.createDataFrame([(0, "a b c"), (1, "d e f"), (2, "g h i j k")],
                              ["doc_id", "text"]), capacity=10,
        domain_size=100).collect()}
    assert bins == {0: 0, 1: 0, 2: 1}, bins  # 3+3 fits, +5 overflows
    # r20: deterministic corpus shuffle through the facade — md5("0") >
    # md5("1") on the first hex digit (cf cd... vs c4 ca...), so doc 1
    # must precede doc 0 in training order
    shuf = {r["doc_id"]: r["position"] for r in graft.text.corpus_shuffle(
        spark.createDataFrame([(0, "x"), (1, "y")], ["doc_id", "text"]))
        .collect()}
    assert shuf == {1: 0, 0: 1}, shuf
    mx = graft.text.mixture_upsample(
        spark.createDataFrame([(0, "s", "a b c d e")], ["doc_id", "source", "text"]),
        {"s": 1.0}, token_budget=10, max_epochs=4.0)
    assert mx.count() == 2, mx.count()  # 10/5 = 2.0 epochs, frac 0
    # r20: token-budget sample through the facade — 3 docs x 2 tokens,
    # budget 3: the md5-order prefix keeps exactly the first two docs
    tb = graft.text.token_budget_sample(
        spark.createDataFrame([(0, "a b"), (1, "c d"), (2, "e f")],
                              ["doc_id", "text"]), budget=3)
    assert tb.count() == 2, tb.count()
    assert sum(r["n_tokens"] for r in tb.collect()) == 4
    # r20: LSH recall budget explain through the facade — a tiny corpus
    # resolves to the (8, 8) baseline shape with recall == baseline
    cfg = graft.text.explain_embedding_lsh_config(
        spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                              ["vec_id", "embedding"])).first()
    assert (cfg["planes_per_band"], cfg["bands"]) == (8, 8), cfg
    assert abs(cfg["effective_recall"] - cfg["baseline_recall"]) < 1e-12
    # r18: boilerplate-span removal through the facade
    span_docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "z a b c d e")], ["doc_id", "text"])
    cleaned = {r["doc_id"]: r["clean_text"]
               for r in graft.text.remove_duplicated_spans(span_docs).collect()}
    assert cleaned == {0: "f g", 1: "z"}, cleaned
    # r18: incremental dedup through the facades
    fp_index = graft.text.exact_index(spark.createDataFrame(
        [(0, "aaa bbb")], ["doc_id", "text"]))
    inc = graft.text.exact_incremental(spark.createDataFrame(
        [(10, "aaa bbb"), (11, "ccc ddd")], ["doc_id", "text"]), fp_index)
    got = {r["doc_id"]: r["is_dup"] for r in inc.collect()}
    assert got == {10: True, 11: False}, got
    rep = graft.text.repetition_signals(docs)
    assert rep.filter(F.col("top_word_ratio") > 1.0).count() == 0
    ngrep = graft.text.ngram_repetition_signals(docs)
    # top fractions are live on the word-soup corpus; dup fractions bounded
    assert ngrep.filter(F.col("top_2gram_char_frac") > 0).count() > 0
    assert ngrep.filter((F.col("dup_5gram_char_frac") < 0)
                        | (F.col("dup_5gram_char_frac") > 1)).count() == 0
    strat = graft.text.stratified_sample(
        docs, {"src0": 1.0}, default_rate=0.0)
    assert set(r["source"] for r in strat.select("source").distinct().collect()) == {"src0"}

    # ---- similarity ----
    emb = graft.io.embeddings(spark, sf_dir)
    knn = graft.sim.brute_force_top_k(emb, emb.filter(F.col("vec_id") < 3), 2)
    assert knn.count() == 6, f"expected 6 knn rows, got {knn.count()}"

    # ---- round-9 ops: SemDeDup, log-odds keywords, temperature mix ----
    sd = graft.sim.semantic_duplicates(emb, k=4, threshold=0.2)
    assert sd.count() > 0 and set(sd.columns) == {"cluster", "id_a", "id_b", "cosine"}
    keep = graft.sim.semantic_keepers(emb, k=4, threshold=0.2)
    assert 0 < keep.count() < emb.count()
    lo = graft.text.log_odds_keywords(docs, top_k=3)
    assert lo.groupBy("source").count().count() == lo.select("source").distinct().count()
    tm = {r["source"]: r for r in graft.text.temperature_mix(docs).collect()}
    assert abs(sum(r["p_temperature"] for r in tm.values()) - 1.0) < 1e-4
    cd = graft.text.code_detect(docs)
    assert cd.count() == n_docs and "is_code" in cd.columns
    sdiff = graft.text.snapshot_diff(
        docs.filter(F.col("doc_id") % 2 == 0), docs)
    assert {r["status"] for r in sdiff.collect()} == {"added", "unchanged"}
    fh = graft.text.feature_hash_embedding(docs, dim=32)
    assert fh.count() == n_docs
    fh_knn = graft.sim.brute_force_top_k(
        fh, fh.filter(F.col("doc_id") < 2), 2, id_col="doc_id")
    assert fh_knn.count() > 0
    cents = graft.sim.centroids(emb)
    assert cents.count() > 0
    q8 = graft.sim.quantize_8bit(emb)
    assert q8.filter(F.col("code_sum").isNull()).count() == 0

    # ---- round-4 time-series ops ----
    rstd = graft.timeseries.roll_std(
        events, 5, key="user_id", ts="ts_us", value="value")
    assert rstd.count() > 0
    outl = graft.timeseries.outliers(
        events, threshold=3.0, key="user_id", value="value")
    assert outl.count() >= 0

    # ---- round-12: VAR(p) / lag-p Granger / stratum cap ----
    daily3 = (
        events.groupBy(
            "user_id",
            F.unix_micros(F.date_trunc("DAY", F.timestamp_micros(
                F.col("ts_us")))).alias("day_us"))
        .agg(F.avg("value").alias("v"),
             F.count(F.lit(1)).cast("double").alias("cnt")))
    vfit = graft.timeseries.varp_fit(
        daily3, 1, ["v", "cnt"], key="user_id", ts="day_us")
    assert vfit.count() > 0
    assert set(vfit.columns) == {"key", "eq", "term", "lag", "coef"}
    vfc = graft.timeseries.varp_forecast(
        daily3, 1, 2, ["v", "cnt"], key="user_id", ts="day_us")
    assert vfc.count() > 0
    gr = graft.timeseries.granger_lag_p(
        daily3, 1, key="user_id", ts="day_us", y="v", x="cnt")
    assert gr.count() > 0 and "f_stat" in gr.columns
    # round-13 multivariate surface: order selection, IRF/FEVD, intervals
    ords = graft.timeseries.varp_order_select(
        daily3, 2, ["v", "cnt"], key="user_id", ts="day_us")
    assert ords.count() > 0 and "bic" in ords.columns
    best = graft.timeseries.varp_best_order(
        daily3, 2, ["v", "cnt"], key="user_id", ts="day_us")
    assert set(best.columns) == {"key", "best_aic", "best_bic", "best_hqic"}
    irf = graft.timeseries.varp_irf(
        daily3, 1, 2, ["v", "cnt"], key="user_id", ts="day_us")
    assert irf.count() > 0 and "irf_orth" in irf.columns
    fev = graft.timeseries.varp_fevd(
        daily3, 1, 3, ["v", "cnt"], key="user_id", ts="day_us")
    assert fev.count() > 0 and "fevd" in fev.columns
    ivs = graft.timeseries.varp_forecast_intervals(
        daily3, 1, 2, ["v", "cnt"], key="user_id", ts="day_us")
    assert ivs.count() > 0 and {"se", "lo", "hi"} <= set(ivs.columns)
    rq = graft.timeseries.roll_quantile(
        events.select("user_id", "ts_us", "value"), 5, 0.9,
        key="user_id", ts="ts_us", value="value")
    assert rq.count() > 0
    # DSIR weights + deterministic resample through the wrappers
    tgt = docs.filter(F.col("source").isin("src0", "src1"))
    dw = graft.text.dsir_log_weights(docs, tgt)
    assert dw.count() == docs.count() and "log_weight" in dw.columns
    ds = graft.text.dsir_sample(docs, tgt, 10)
    assert ds.count() == 10
    # CCNet tiers, scored contamination, conversion latency, logistic
    tiers = graft.text.ccnet_buckets(docs)
    assert set(r["bucket"] for r in tiers.select("bucket").distinct().collect()) \
        <= {"head", "middle", "tail"}
    cs = graft.text.contamination_score(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0))
    assert "contamination_frac" in cs.columns and cs.count() > 0
    cl = graft.events.conversion_latency(events, "view", "purchase")
    assert cl.count() == 1 and "lat_p50_us" in cl.columns
    lab = docs.withColumn(
        "y", F.when(F.col("source").isin("src0", "src1"), 1.0).otherwise(0.0)) \
        .withColumn("x1", F.length("text").cast("double"))
    lf = graft.models.logistic_fit(lab, "y", ["x1"], l2=0.1)
    assert lf.count() == 2
    sc = graft.models.logistic_score(lab, lf, ["x1"])
    assert "score" in sc.columns and sc.count() == docs.count()
    capd = graft.text.stratum_cap_sample(docs, 5)
    per = capd.groupBy("source").count().agg(F.max("count")).head()[0]
    assert per <= 5, per

    # ---- map_series / map_series_with_key (python-side whole-series fns) ----
    sdf = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0]), ("b", [4.0, 5.0, 6.0])], ["key", "series"])
    doubled = graft.timeseries.map_series(sdf, lambda v: [x * 2 for x in v])
    got = {r["key"]: r["series"] for r in doubled.collect()}
    assert got == {"a": [2.0, 4.0, 6.0], "b": [8.0, 10.0, 12.0]}, got
    keyed = graft.timeseries.map_series_with_key(
        sdf, lambda k, v: [x + (1.0 if k == "a" else 0.0) for x in v])
    got = {r["key"]: r["series"] for r in keyed.collect()}
    assert got == {"a": [2.0, 3.0, 4.0], "b": [4.0, 5.0, 6.0]}, got

    # ---- multimodal real decodes + sketch certifications ----
    png = graft.multimodal.png_assets_from_documents(docs)
    rs = graft.multimodal.resize_gray(png, 4, 4)
    assert rs.filter("resized_px_sum IS NULL").count() == 0
    wav = graft.multimodal.wav_assets_from_documents(docs)
    en = graft.multimodal.audio_window_energy(wav, 16)
    assert en.count() > 0
    avi = graft.multimodal.avi_assets_from_documents(docs)
    vf = graft.multimodal.extract_features(avi)
    assert vf.filter("video_px_sum IS NULL").count() == 0
    qs = graft.sketch.certify_bloom(spark, "/root/testdata/sf0.001")
    assert all(r["ok"] for r in qs.collect())

    # ---- streaming wrappers: exact dedup + heavy hitters end-to-end ----
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        sdocs = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "alpha beta"),
             (2, "2024-01-01 10:01:00", "alpha beta"),
             (3, "2024-01-01 10:02:00", "gamma delta")],
            ["doc_id", "event_time", "text"],
        ).withColumn("event_time", F.col("event_time").cast("timestamp"))
        sdocs.write.parquet(td + "/in")
        stream = spark.readStream.schema(sdocs.schema).parquet(td + "/in")
        q = (graft.streaming.exact_dedup(stream).writeStream
             .format("memory").queryName("py_dedup")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert spark.table("py_dedup").count() == 2  # one exact dup dropped
        q2 = (graft.streaming.heavy_hitters(stream, shards=2, capacity=8)
              .writeStream.format("memory").queryName("py_hh")
              .outputMode("update").trigger(availableNow=True).start())
        q2.awaitTermination(120)
        hh = {r["token"]: r["count"] for r in spark.table("py_hh").collect()}
        assert hh["alpha"] == 2 and hh["gamma"] == 1, hh
        # r16: four-boundary-mode streaming resample (closed/stamp right):
        # the 10:00 doc sits EXACTLY on a bucket boundary, so closed-right
        # pushes it into the preceding bucket and stamp-right labels by end
        sevs = stream.withColumn("v", F.lit(1.0))
        q3 = (graft.streaming.tumbling_modes(
                  sevs, 60_000_000, "1 minute", agg="sum",
                  closed_right=True, stamp_right=True,
                  key="doc_id", ts="event_time", value="v")
              .writeStream.format("memory").queryName("py_modes")
              .outputMode("complete").trigger(availableNow=True).start())
        q3.awaitTermination(120)
        modes = spark.table("py_modes").collect()
        assert len(modes) == 3 and all(r["v"] == 1.0 for r in modes)
        # doc 1 at 10:00:00 exactly: closed-right bucket (09:59, 10:00],
        # stamp-right label = 10:00:00
        lbl = {r["doc_id"]: str(r["bucket_ts"]) for r in modes}
        assert lbl[1].endswith("10:00:00"), lbl
        assert lbl[2].endswith("10:01:00"), lbl
        assert lbl[3].endswith("10:02:00"), lbl
        # r18: stream exact-dedup against the persisted fingerprint index
        fpi = graft.text.exact_index(spark.createDataFrame(
            [(100, "alpha beta")], ["doc_id", "text"]))
        q5 = (graft.streaming.exact_dedup_against_index(stream, fpi)
              .writeStream.format("memory").queryName("py_exact_idx")
              .outputMode("append").trigger(availableNow=True).start())
        q5.awaitTermination(120)
        surv = {r["doc_id"] for r in spark.table("py_exact_idx").collect()}
        assert surv == {3}, surv  # 1,2 dup "alpha beta" (indexed); 3 fresh
        # r18: stream near-dup against the persisted batch-dedup index
        ref = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
        mh_index = graft.text.minhash_index(ref, k=2)
        q4 = (graft.streaming.near_dup_against_index(
                  stream, mh_index, k=2, threshold=0.4)
              .writeStream.format("memory").queryName("py_idx_neardup")
              .outputMode("append").trigger(availableNow=True).start())
        q4.awaitTermination(120)
        # append-mode pairs flush on watermark advance; re-run drains state
        # deterministically in availableNow replays, so just assert schema
        assert [f.name for f in spark.table("py_idx_neardup").schema.fields] == \
            ["stream_id", "corpus_id", "jaccard"]

    # ---- SQL extension functions through the functions module ----
    row = docs.limit(1).select(
        graft.functions.rolling_hash(F.col("text")).alias("rh"),
        graft.functions.canonical_fingerprint(F.col("text")).alias("fp"),
        graft.functions.bpeish_token_count(F.col("text")).alias("n"),
        graft.functions.simhash64(F.col("text")).alias("sh"),
    ).first()
    assert len(row["fp"]) == 32 and row["n"] > 0

    dp = spark.range(1).select(
        graft.functions.dot_product(
            F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))
        ).alias("dp")
    ).first()["dp"]
    assert dp == 11.0

    print(
        f"PYTHON PACKAGE OK: events={n_events} daily={n_daily} "
        f"aligned={n_keys * idx.size()} roll={n_roll} forecast={n_fc} "
        f"docs={n_docs} knn=6 version={graft.__version__}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
