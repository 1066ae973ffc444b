package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
 * 2023): score every raw document by how much more likely its hashed
 * n-gram features are under a TARGET distribution (the high-quality slice
 * you want more of) than under the RAW distribution, then resample
 * top-k with Gumbel noise (∝ softmax of the importance weights, sampling
 * without replacement — the Gumbel-top-k identity).
 *
 *   log w(doc) = Σ_{g ∈ ngrams(doc)} [ log p̂_target(b(g)) − log p̂_raw(b(g)) ]
 *
 * with b(g) a hashed bucket and p̂ add-α smoothed multinomials over the
 * buckets. Features are unigrams + bigrams of the whitespace tokens, the
 * paper's configuration.
 *
 * Engine-reproducibility design: the bucket of an n-gram is the first
 * `hexChars` hex characters of its md5 (a STRING bucket, 16^hexChars
 * buckets) and the Gumbel uniform is derived from md5(doc_id:seed) — both
 * computable bit-identically in any engine with md5 (the DuckDB oracle
 * replays the whole pipeline), with no reliance on engine-private hash
 * functions or RNG streams.
 *
 * Scale shape: one pass over each corpus (explode n-grams → map-side
 * partial-aggregated bucket counts); the two bucket tables are ≤
 * 16^hexChars rows and BROADCAST; per-doc scoring pre-aggregates
 * (doc, bucket) counts before the broadcast join so the join input is
 * bounded by distinct buckets per doc, and the final agg shuffles once on
 * doc_id. Top-k selection is orderBy+limit (TakeOrdered — a per-partition
 * top-k plus a driver merge of k·partitions rows, never a full sort).
 */
object Dsir {

  /** md5-prefix bucket: first `hexChars` hex chars of md5(g) — a string
    * bucket with 16^hexChars values, identical in every md5-capable
    * engine. */
  private def bucket(c: Column, hexChars: Int): Column =
    substring(md5(c.cast("binary")), 1, hexChars)

  /** (doc-id, ngram) pairs: unigrams + bigrams of the whitespace tokens,
    * empty tokens (doubled spaces) excluded. */
  private def docNgrams(df: DataFrame, idCol: String, text: String): DataFrame = {
    val toks = filter(split(col(text), " "), t => t =!= "")
    // r22: native WordNgrams kernel — the transform(sequence...) bigram
    // chain was CodegenFallback (interpreted lambda per bigram, plus the
    // sequence(1, 0)-counts-DOWN guard it needed); tokens are non-empty
    // strings here, so concat_ws ≡ the old concat and values are
    // bit-identical. < 2 tokens yields an empty bigram list as before.
    val bigrams = graft.text.WordNgrams.ofColumn(col("__toks"), 2)
    df.select(col(idCol).as("__id"), toks.as("__toks"))
      .select(col("__id"),
        explode(concat(col("__toks"), bigrams)).as("__ngram"))
  }

  /** Smoothed per-bucket log-probability table of a corpus:
    * (bucket, log((c_b + alpha)/(N + alpha·16^hexChars))) for OCCUPIED
    * buckets, plus the shared empty-bucket log-prob as a scalar. */
  private def bucketCounts(df: DataFrame, idCol: String, text: String,
      hexChars: Int): DataFrame =
    docNgrams(df, idCol, text)
      .groupBy(bucket(col("__ngram"), hexChars).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /**
   * Per-document DSIR importance weight: (idCol, n_ngrams, log_weight).
   * Documents with no n-grams (empty text) score 0 (an empty product).
   * `alpha` is the add-α smoothing mass per bucket; buckets the target
   * never saw still get α, so a raw-only n-gram contributes a large
   * negative (not infinite) term.
   */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, hexChars: Int = 3,
      alpha: Double = 1.0, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, "1 <= hexChars <= 8")
    val d = math.pow(16.0, hexChars)
    // the target bucket table is <= 16^hexChars rows; materialize it ONCE
    // (localCheckpoint) — it feeds a total-count action AND the ratio join
    val tCounts = bucketCounts(target, idCol, text, hexChars).localCheckpoint()
    // r22 (VERDICT r21 #5/#3): the RAW corpus is exploded + tokenized ONCE.
    // The per-(doc, bucket) aggregate — which the scoring join needs
    // anyway — is materialized (localCheckpoint: bounded by distinct
    // buckets per doc, <= min(doc n-grams, 16^hexChars) rows per doc and
    // far below the raw n-gram explode it replaces), and the raw bucket
    // totals are derived from it by a second-level aggregate: sum of Long
    // partial counts == count over the raw explode, bit-identical. The
    // old shape re-exploded and re-hashed the whole corpus a second time
    // just to recount what the per-doc frame already held.
    val perDocBucket = docNgrams(raw, idCol, text)
      .groupBy(col("__id"), bucket(col("__ngram"), hexChars).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rCounts = perDocBucket.groupBy(col("bucket")).agg(sum(col("n")).as("c"))
    val tTot = tCounts.agg(sum(col("c"))).head().getLong(0).toDouble
    val rTot = rCounts.agg(sum(col("c"))).head().getLong(0).toDouble
    // every n-gram scored comes from the raw corpus, so raw count >= 1 on
    // every bucket that can ever be looked up: the ratio table is the raw
    // buckets left-joined with target counts (absent -> 0 + alpha mass)
    val ratio = rCounts
      .join(tCounts.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + lit(alpha)) / lit(tTot + alpha * d)) -
          log((col("c") + lit(alpha)) / lit(rTot + alpha * d))).as("logratio"))
    val scored = perDocBucket
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("n")).as("n_ngrams"),
        sum(col("n") * col("logratio")).as("log_weight"))
    raw.select(col(idCol))
      .join(scored, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /**
   * Gumbel-top-k resampling over [[dsirLogWeights]]: the k kept documents
   * are a without-replacement sample ∝ exp(log_weight) (the Gumbel-max
   * identity), deterministic given `seed`. The Gumbel uniform comes from
   * md5(doc_id ":" seed): u = (first 13 hex chars + 0.5)/16^13 ∈ (0,1),
   * g = −ln(−ln u) — engine-reproducible, unlike RAND(). Output
   * (idCol, log_weight, gumbel_key) sorted by the perturbed key; ties
   * (md5 collisions at 52 bits — negligible) break by id.
   */
  def dsirSample(raw: DataFrame, target: DataFrame, k: Int,
      hexChars: Int = 3, alpha: Double = 1.0, seed: Long = 42L,
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    require(k >= 1, "k >= 1")
    val w = dsirLogWeights(raw, target, hexChars, alpha, idCol, text)
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        lit(seed.toString)).cast("binary")), 1, 13), 16, 10).cast("double") +
      lit(0.5)) / lit(math.pow(16.0, 13))
    w.withColumn("gumbel_key", col("log_weight") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_weight"), col("gumbel_key"))
  }

  /**
   * The fitted DSIR ratio table collected to a driver map — the STATIC
   * side of [[streamingDsirScore]] (≤ 16^hexChars entries, bounded by
   * construction: this is the one `collect()` the design budget allows,
   * the same bounded-codebook contract as the ANN quantizers). Fit once
   * offline, broadcast to every micro-batch.
   */
  def dsirRatioMap(raw: DataFrame, target: DataFrame, hexChars: Int = 3,
      alpha: Double = 1.0, idCol: String = "doc_id",
      text: String = "text"): Map[String, Double] = {
    require(hexChars >= 1 && hexChars <= 8, "1 <= hexChars <= 8")
    val d = math.pow(16.0, hexChars)
    val tCounts = bucketCounts(target, idCol, text, hexChars).localCheckpoint()
    val rCounts = bucketCounts(raw, idCol, text, hexChars).localCheckpoint()
    val tTot = tCounts.agg(sum(col("c"))).head().getLong(0).toDouble
    val rTot = rCounts.agg(sum(col("c"))).head().getLong(0).toDouble
    rCounts
      .join(tCounts.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + lit(alpha)) / lit(tTot + alpha * d)) -
          log((col("c") + lit(alpha)) / lit(rTot + alpha * d))).as("logratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /**
   * Stateless per-document DSIR scoring against a pre-fitted
   * [[dsirRatioMap]] — usable on a STREAM (no aggregation, no watermark
   * needed, zero state per micro-batch: ingest-time quality scoring) or a
   * batch frame. Buckets absent from the map (n-grams the fitting raw
   * corpus never saw) contribute 0 — the neutral prior, exactly the
   * smoothed ratio's limit as both counts vanish. Columns + (n_ngrams,
   * log_weight). Batch parity with [[dsirLogWeights]] is spec-asserted.
   */
  def streamingDsirScore(df: DataFrame, ratio: Map[String, Double],
      hexChars: Int = 3, text: String = "text"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(ratio)
    val score = udf { (t: String) =>
      val toks = if (t == null) Array.empty[String]
        else t.split(" ", -1).filter(_.nonEmpty)
      val md = java.security.MessageDigest.getInstance("MD5")
      var lw = 0.0
      var nN = 0L
      def add(g: String): Unit = {
        val hex = md.digest(g.getBytes("UTF-8"))
          .take((hexChars + 1) / 2).map("%02x".format(_)).mkString
          .substring(0, hexChars)
        lw += bc.value.getOrElse(hex, 0.0)
        nN += 1
      }
      var i = 0
      while (i < toks.length) {
        add(toks(i))
        if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
        i += 1
      }
      (nN, lw)
    }
    df.withColumn("__s", score(col(text)))
      .withColumn("n_ngrams", col("__s._1"))
      .withColumn("log_weight", col("__s._2"))
      .drop("__s")
  }
}
