package graft.api.java;

import java.util.Arrays;
import java.util.HashMap;
import java.util.Map;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;

/**
 * Compiled-from-Java proof of the Java API surface (reference parity:
 * api/java/JavaTimeSeriesRDD.scala exposes the engine to Java callers).
 * javac type-checks every call here, so the facade is guaranteed
 * Java-usable; JavaApiSpec executes it on a live session. Scala's
 * DataFrame alias surfaces to Java as Dataset&lt;Row&gt;.
 */
public final class JavaApiExample {

  private JavaApiExample() {}

  /** Runs a representative slice of the Java surface; returns row counts. */
  public static long[] run(Dataset<Row> obs) {
    Dataset<Row> lagged =
        JavaTimeSeriesOps.lags(obs, 2, true, "key", "ts_nanos", "value");

    Map<String, Object[]> spec = new HashMap<>();
    spec.put("a", new Object[] {Boolean.TRUE, 2});
    Dataset<Row> perKey =
        JavaTimeSeriesOps.lagsPerKey(obs, spec, "key", "ts_nanos", "value");

    Dataset<Row> rolled =
        JavaTimeSeriesOps.rollMean(obs, 3, "right", "key", "ts_nanos", "value");

    Dataset<Row> filled =
        JavaTimeSeriesOps.fill(obs, "previous", 0.0, "key", "ts_nanos", "value");

    Dataset<Row> stats = JavaTimeSeriesOps.seriesStats(obs, "key", "value");

    Dataset<Row> acf = JavaTimeSeriesOps.autocorr(
        obs, Arrays.asList(1, 2), "key", "ts_nanos", "value");

    Dataset<Row> resampled = JavaTimeSeriesOps.resample(
        obs, 2L, "mean", false, false, 0L, "key", "ts_nanos", "value");

    Dataset<Row> series = JavaTimeSeriesOps.toSeries(obs,
        JavaTimeSeriesOps.irregularIndex(new long[] {10L, 20L, 30L}),
        "key", "ts_nanos", "value");
    Dataset<Row> mapped = JavaTimeSeriesOps.mapSeries(series,
        v -> Arrays.stream(v).map(x -> x * 2.0).toArray(), "key", "series");
    Dataset<Row> mappedKeyed = JavaTimeSeriesOps.mapSeriesWithKey(series,
        (k, v) -> "a".equals(k) ? v : new double[v.length], "key", "series");

    return new long[] {
      lagged.count(), perKey.count(), rolled.count(), filled.count(),
      stats.count(), acf.count(), resampled.count(),
      mapped.count(), mappedKeyed.count()
    };
  }

  /** Runs the dedup/similarity/text slice of the Java surface. */
  public static long[] runPipeline(Dataset<Row> docs, Dataset<Row> vecs) {
    Dataset<Row> exact = JavaPipelineOps.dedupExact(docs, "text", "doc_id", true);
    Dataset<Row> quality = JavaPipelineOps.qualityScore(docs, "text");
    Dataset<Row> lang = JavaPipelineOps.langId(docs, "text", "lang_pred");
    Dataset<Row> knn = JavaPipelineOps.bruteForceTopK(vecs, vecs.limit(1), 2,
        "vec_id", "embedding");
    Dataset<Row> redacted = JavaPipelineOps.redact(docs, "text",
        Arrays.asList("key", "hash"));
    Dataset<Row> sampled = JavaPipelineOps.hashSample(docs, "8", "text");
    Dataset<Row> contaminated = JavaPipelineOps.decontaminate(
        docs, docs.limit(1), 3, "text", "doc_id");
    return new long[] {exact.count(), quality.count(), lang.count(), knn.count(),
        redacted.count(), sampled.count(), contaminated.count()};
  }

  /** Runs the round-4 slice: clustering, repetition, sampling, embeddings. */
  public static long[] runRound4(Dataset<Row> docs, Dataset<Row> vecs,
      Dataset<Row> pairs) {
    Dataset<Row> clusters = JavaPipelineOps.dupClusters(docs, pairs, "doc_id");
    Dataset<Row> spans = JavaPipelineOps.duplicateSpans(docs, 5, "text", "doc_id");
    Dataset<Row> repetition =
        JavaPipelineOps.repetitionSignals(docs, "text", "doc_id");
    Map<String, Double> rates = new HashMap<>();
    rates.put("web", 0.5);
    Dataset<Row> sampled =
        JavaPipelineOps.stratifiedSample(docs, rates, "source", "text", 1.0);
    Dataset<Row> cents = JavaPipelineOps.centroids(vecs, "label", "embedding");
    Dataset<Row> quantized =
        JavaPipelineOps.quantize8bit(vecs, "vec_id", "embedding");
    Dataset<Row> flagged = JavaPipelineOps.outliers(docs, 3.0, "source", "n_chars");
    Dataset<Row> ngramRep =
        JavaPipelineOps.ngramRepetitionSignals(docs, "doc_id", "text");
    Dataset<Row> repGate =
        JavaPipelineOps.gopherRepetitionFilter(docs, "doc_id", "text");
    return new long[] {clusters.count(), spans.count(), repetition.count(),
        sampled.count(), cents.count(), quantized.count(), flagged.count(),
        ngramRep.count(), repGate.filter("keep = 1").count()};
  }

  /** Runs the round-9 slice: semantic dedup, mixing, detection, evaluation,
    * spectral + VAR analytics. `fc` carries (key, ts_nanos, actual,
    * predicted). */
  public static long[] runRound9(Dataset<Row> docs, Dataset<Row> vecs,
      Dataset<Row> fc) {
    Dataset<Row> semdups =
        JavaPipelineOps.semanticDuplicates(vecs, 2, 0.9, "vec_id", "embedding");
    Dataset<Row> keepers =
        JavaPipelineOps.semanticKeepers(vecs, 2, 0.9, "vec_id", "embedding");
    Dataset<Row> keywords =
        JavaPipelineOps.logOddsKeywords(docs, "source", "text", 500.0, 2);
    Dataset<Row> mix = JavaPipelineOps.temperatureMix(docs, 0.7, "source", "text");
    Dataset<Row> code = JavaPipelineOps.codeDetect(docs, 0.05, "doc_id", "text");
    Dataset<Row> hashed =
        JavaPipelineOps.featureHashEmbedding(docs, 16, "doc_id", "text");
    Dataset<Row> diff =
        JavaPipelineOps.snapshotDiff(docs, docs, "doc_id", "text", "source");
    Dataset<Row> acc = JavaPipelineOps.forecastAccuracy(fc, "key", "ts_nanos",
        "actual", "predicted");
    Dataset<Row> period =
        JavaPipelineOps.dominantPeriod(fc, 4, "key", "ts_nanos", "actual");
    Dataset<Row> var =
        JavaPipelineOps.varFit(fc, "key", "ts_nanos", "actual", "predicted");
    return new long[] {semdups.count(), keepers.count(), keywords.count(),
        mix.count(), code.count(), hashed.count(), diff.count(), acc.count(),
        period.count(), var.count()};
  }

  /** Runs the round-12 slice: n-variate VAR(p) fit/forecast, lag-p Granger,
    * per-stratum capped sampling, multi-probe keeper election. `biv` carries
    * (key, ts_nanos, y, x). */
  public static long[] runRound12(Dataset<Row> docs, Dataset<Row> vecs,
      Dataset<Row> biv) {
    java.util.List<String> cols = java.util.Arrays.asList("y", "x");
    Dataset<Row> fit = JavaPipelineOps.varpFit(biv, 1, cols, "key", "ts_nanos");
    Dataset<Row> fc =
        JavaPipelineOps.varpForecast(biv, 1, 3, cols, "key", "ts_nanos");
    Dataset<Row> granger =
        JavaPipelineOps.grangerLagP(biv, 2, "key", "ts_nanos", "y", "x");
    Dataset<Row> capped =
        JavaPipelineOps.stratumCapSample(docs, 3, "source", "doc_id", "text");
    Dataset<Row> keepers =
        JavaPipelineOps.semanticKeepers(vecs, 2, 0.9, "vec_id", "embedding", 2);
    Dataset<Row> order =
        JavaPipelineOps.varpOrderSelect(biv, 3, cols, "key", "ts_nanos");
    Dataset<Row> bestOrder =
        JavaPipelineOps.varpBestOrder(biv, 3, cols, "key", "ts_nanos");
    return new long[] {fit.count(), fc.count(), granger.count(),
        capped.count(), keepers.count(), order.count(), bestOrder.count()};
  }

  /** Round-13 surface: IRF/FEVD/intervals, DSIR, logistic, metrics. */
  public static long[] runRound13(Dataset<Row> docs, Dataset<Row> biv,
      Dataset<Row> labeled) {
    java.util.List<String> cols = java.util.Arrays.asList("y", "x");
    Dataset<Row> irf =
        JavaPipelineOps.varpIrf(biv, 1, 2, cols, "key", "ts_nanos");
    Dataset<Row> fevd =
        JavaPipelineOps.varpFevd(biv, 1, 3, cols, "key", "ts_nanos");
    Dataset<Row> ivs = JavaPipelineOps.varpForecastIntervals(
        biv, 1, 2, cols, 0.95, "key", "ts_nanos");
    Dataset<Row> target = docs.filter("doc_id % 2 = 0");
    Dataset<Row> weights =
        JavaPipelineOps.dsirLogWeights(docs, target, 3, 1.0, "doc_id", "text");
    Dataset<Row> sample =
        JavaPipelineOps.dsirSample(docs, target, 5, 3, 1.0, 42L, "doc_id", "text");
    java.util.List<String> feats = java.util.Arrays.asList("x1");
    Dataset<Row> logit =
        JavaPipelineOps.logisticFit(labeled, "y", feats, 25, 1e-8, 0.0);
    Dataset<Row> scored =
        JavaPipelineOps.logisticScore(labeled, logit, feats, "score");
    Dataset<Row> metrics = graft.models.Logistic.binaryMetrics(
        scored, "y", "score", 1000);
    Dataset<Row> tiers = JavaPipelineOps.ccnetBuckets(
        docs, 1.0 / 3, 2.0 / 3, "source", "doc_id", "text");
    return new long[] {irf.count(), fevd.count(), ivs.count(),
        weights.count(), sample.count(), logit.count(), metrics.count(),
        tiers.count()};
  }

  /** Round-16 surface: ARX fit + AR TimeSeriesFilter residuals. */
  public static long[] runRound16(Dataset<Row> biv) {
    Dataset<Row> arx = JavaModelOps.fitArx(
        biv, 1, 1, true, "key", "ts_nanos", "y", "x");
    Dataset<Row> resid = JavaModelOps.arFilterResiduals(
        biv, 1, "key", "ts_nanos", "y");
    return new long[] {arx.count(), resid.count()};
  }
}
