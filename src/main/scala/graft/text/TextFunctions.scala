package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * statistics, quality scoring, n-gram language identification, document
 * fingerprinting. All column-expression based (whole-stage codegen) — no
 * Python, no driver loops; every operator is a narrow map over the scan.
 */
object TextFunctions {

  /** Whitespace tokens (single-space split, matching the DuckDB oracle). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation: letter runs, digit runs, single other
    * non-space chars. Same regex semantics in Java and RE2 (DuckDB). */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  /** Character-level quality signals (SURVEY north-star: quality scoring). */
  def qualitySignals(df: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val nTokens = size(toks).cast("double")
    // try_divide: empty text (n_chars = 0) yields null ratios instead of an
    // ANSI divide-by-zero throw (DuckDB double x/0 is null too)
    df.withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("mean_token_len", try_divide(nChars, nTokens))
      .withColumn("punct_ratio",
        try_divide(nChars - length(regexp_replace(t, "[^A-Za-z0-9 ]", "")), nChars))
      .withColumn("digit_ratio",
        try_divide(nChars - length(regexp_replace(t, "[0-9]", "")), nChars))
      .withColumn("stopword_ratio",
        try_divide(size(filter(toks, x => x.isin(StopWords.en: _*))).cast("double"), nTokens))
  }

  /**
   * Composite quality score in [0,1]: favors medium-length documents with
   * normal punctuation and some stopwords (boilerplate/garbage score low).
   */
  def qualityScore(df: DataFrame, text: String = "text"): DataFrame = {
    val withSignals = qualitySignals(df, text)
    withSignals.withColumn("quality_score",
      round(greatest(lit(0.0), least(lit(1.0),
        lit(0.25) * least(col("n_tokens").cast("double") / 20.0, lit(1.0)) +
          lit(0.25) * least(col("stopword_ratio") * 5.0, lit(1.0)) +
          lit(0.25) * (lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0))) +
          lit(0.25) * (lit(1.0) - least(col("digit_ratio") * 4.0, lit(1.0))))), 6))
  }

  /**
   * Stopword-profile language identification: score each candidate language
   * by its stopword hit count over the token set; argmax wins, ties broken
   * by language code. Pure expressions — scales as a narrow map.
   */
  def langId(df: DataFrame, text: String = "text", out: String = "lang_pred"): DataFrame = {
    val toks = tokens(col(text))
    val scored = StopWords.profiles.map { case (lang, words) =>
      struct(size(filter(toks, x => x.isin(words: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // greatest(struct...) picks max hits then max lang; to break ties by
    // *smallest* lang code invert via negative hits and least()
    val best = scored.reduce((a, b) =>
      when(a.getField("hits") >= b.getField("hits"), a).otherwise(b))
    df.withColumn(out, best.getField("lang"))
      .withColumn(s"${out}_hits", best.getField("hits").cast("long"))
  }

  /** Per-profile stopword hit counts (`h_de` .. `h_zh`) plus the argmax
    * prediction — the diagnostic companion to [[langId]]: a mismatch against
    * the oracle pinpoints the exact document and the exact score that
    * flipped. Same tie-break (first profile in order wins on >=). */
  def langScores(df: DataFrame, text: String = "text", out: String = "lang_pred"): DataFrame = {
    val toks = tokens(col(text))
    val hits = StopWords.profiles.map { case (lang, words) =>
      lang -> size(filter(toks, x => x.isin(words: _*))).cast("long")
    }
    val scored = hits.map { case (lang, h) => struct(h.as("hits"), lit(lang).as("lang")) }
    val best = scored.reduce((a, b) =>
      when(a.getField("hits") >= b.getField("hits"), a).otherwise(b))
    hits.foldLeft(df) { case (d, (lang, h)) => d.withColumn(s"h_$lang", h) }
      .withColumn(out, best.getField("lang"))
  }

  /** PII-style scrubbing for training corpora: digit runs become `<NUM>`,
    * denylist tokens become `<PII>`; counts are taken on the original text.
    * A narrow map over the scan (codegen'd regex), like every text op here. */
  def redact(df: DataFrame, text: String = "text",
      denylist: Seq[String] = Seq("key", "hash", "token")): DataFrame = {
    val t = col(text)
    val numPat = "[0-9]+"
    val denyPat = "\\b(" + denylist.mkString("|") + ")\\b"
    df.withColumn("n_redactions",
        (size(regexp_extract_all(t, lit(numPat), lit(0))) +
          size(regexp_extract_all(t, lit(denyPat), lit(0)))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, numPat, "<NUM>"), denyPat, "<PII>"))
  }

  /** Deterministic content-hash sampling: keep documents whose md5 hex
    * fingerprint is below the given prefix bound (e.g. "1" keeps ~1/16).
    * Reproducible across engines and runs, order- and partition-independent —
    * the right way to downsample a training corpus (a seeded random sample
    * changes under repartitioning; a hash sample never does). */
  def hashSample(df: DataFrame, bound: String, text: String = "text"): DataFrame =
    df.filter(md5(col(text).cast("binary")) < bound)

  /** Corpus top-k vocabulary by token frequency (ties broken by token) —
    * the input to vocab/BPE training. Explode → count → global top-k, which
    * Catalyst plans as TakeOrderedAndProject (partial per-partition top-k,
    * no single-partition sort). */
  def topKTokens(df: DataFrame, k: Int, text: String = "text"): DataFrame =
    df.select(explode(tokens(col(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /**
   * Gopher-style word-repetition and shape signals per document: word count,
   * mean word length, duplicate-word fraction, most-frequent-word fraction,
   * fraction of words containing a letter. High duplicate/top-word fractions
   * flag boilerplate and degenerate repetition (a core pre-training filter).
   *
   * Shape: one explode, then two keyed aggregations (doc_id,token → doc_id) —
   * everything partial-aggregates map-side, so the shuffle carries distinct
   * (doc, token) counts, not raw tokens. All ratios are int/int double
   * divisions (bit-exact vs the oracle, no rounding needed).
   */
  def repetitionSignals(df: DataFrame, text: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val perTok = df.select(col(idCol), explode(tokens(col(text))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    perTok.groupBy(col(idCol))
      .agg(sum("cnt").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("top_cnt"),
        sum(col("cnt") * length(col("tok"))).as("sum_len"),
        sum(when(col("tok").rlike("[A-Za-z]"), col("cnt")).otherwise(0L)).as("n_alpha"))
      .select(col(idCol), col("n_words"),
        try_divide(col("sum_len").cast("double"), col("n_words").cast("double"))
          .as("mean_word_len"),
        try_divide((col("n_words") - col("n_distinct")).cast("double"),
          col("n_words").cast("double")).as("dup_word_ratio"),
        try_divide(col("top_cnt").cast("double"), col("n_words").cast("double"))
          .as("top_word_ratio"),
        try_divide(col("n_alpha").cast("double"), col("n_words").cast("double"))
          .as("alpha_word_ratio"))
  }

  /**
   * Gopher-style n-gram repetition signals per document (Rae et al. 2021,
   * Table A1): top n-gram char fraction for n = 2..4 and duplicate n-gram
   * char fraction for n = 5..10 — the n-gram half of the repetition filter
   * family ([[repetitionSignals]] is the word-level half). All nine signals
   * come out of ONE compiled pass per document ([[NgramRepetition]]), so
   * the operator is exchange-free: no n-gram ever enters a shuffle, unlike
   * the naive 9-way explode+groupBy formulation. Fractions are int/int
   * double divisions — bit-exact vs the oracle.
   */
  def ngramRepetitionSignals(df: DataFrame, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    val named = Seq("n_tokens", "n_token_chars",
      "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
      "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
      "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")
    val cols = named.zipWithIndex.map { case (name, i) =>
      val c = col("__v").getItem(i)
      (if (i < 2) c.cast("long") else c).as(name)
    }
    df.select(col(idCol), NgramRepetition.ofColumn(col(text)).as("__v"))
      .select(col(idCol) +: cols: _*)
  }

  /**
   * Gopher-style document quality filter: hard threshold rules over word
   * shape signals (word count bounds, mean word length bounds, minimum
   * fraction of words containing a letter, maximum duplicate-word fraction,
   * minimum stopword occurrences). Emits the signals, one 0/1 flag per rule
   * and `keep` = every rule passes — the pre-training corpus gate run before
   * any model sees a document.
   *
   * Same scale shape as [[repetitionSignals]]: one explode, two keyed
   * aggregations, everything partial-aggregated map-side; the shuffle
   * carries distinct (doc, token) counts, not raw tokens. Signals are
   * int/int double divisions — bit-exact vs the oracle, no rounding.
   */
  def gopherFilter(df: DataFrame, idCol: String = "doc_id", text: String = "text",
      minWords: Long = 10L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 12.0,
      minAlphaRatio: Double = 0.8, maxDupRatio: Double = 0.4,
      minStopwords: Long = 2L): DataFrame = {
    val perTok = df.select(col(idCol), explode(tokens(col(text))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val sig = perTok.groupBy(col(idCol))
      .agg(sum("cnt").as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * length(col("tok"))).as("sum_len"),
        sum(when(col("tok").rlike("[A-Za-z]"), col("cnt")).otherwise(0L)).as("n_alpha"),
        sum(when(lower(col("tok")).isin(StopWords.en: _*), col("cnt")).otherwise(0L))
          .as("n_stop"))
      .withColumn("mean_word_len",
        try_divide(col("sum_len").cast("double"), col("n_words").cast("double")))
      .withColumn("alpha_word_ratio",
        try_divide(col("n_alpha").cast("double"), col("n_words").cast("double")))
      .withColumn("dup_word_ratio",
        try_divide((col("n_words") - col("n_distinct")).cast("double"),
          col("n_words").cast("double")))
    val flags = Seq(
      "f_word_count" ->
        (col("n_words") >= minWords && col("n_words") <= maxWords),
      "f_mean_len" ->
        (col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen),
      "f_alpha" -> (col("alpha_word_ratio") >= minAlphaRatio),
      "f_dup" -> (col("dup_word_ratio") <= maxDupRatio),
      "f_stop" -> (col("n_stop") >= minStopwords))
    val flagged = flags.foldLeft(sig) { case (d, (name, cond)) =>
      d.withColumn(name, when(cond, 1).otherwise(0)) // 0/1, not boolean: engine-portable
    }
    flagged.withColumn("keep",
      flags.map(f => col(f._1)).reduce(_ * _))
      .drop("sum_len", "n_distinct")
  }

  /**
   * The n-gram half of the Gopher repetition FILTER (Rae et al. 2021,
   * Table A1 thresholds): hard caps over [[ngramRepetitionSignals]] —
   * top n-gram char fraction ≤ 0.20/0.18/0.16 for n = 2/3/4 and duplicate
   * n-gram char fraction ≤ 0.15/0.14/0.13/0.12/0.11/0.10 for n = 5..10.
   * Emits the nine signals, a 0/1 flag per rule, and `keep` = every rule
   * passes — composes with [[gopherFilter]] (word shape rules) for the
   * full published gate. Same exchange-free shape as the signals: one
   * compiled pass per doc, flags are scalar comparisons.
   */
  def gopherRepetitionFilter(df: DataFrame, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    val caps = Seq(
      "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
      "top_4gram_char_frac" -> 0.16, "dup_5gram_char_frac" -> 0.15,
      "dup_6gram_char_frac" -> 0.14, "dup_7gram_char_frac" -> 0.13,
      "dup_8gram_char_frac" -> 0.12, "dup_9gram_char_frac" -> 0.11,
      "dup_10gram_char_frac" -> 0.10)
    val sig = ngramRepetitionSignals(df, idCol, text)
    val flagged = caps.foldLeft(sig) { case (d, (c, cap)) =>
      d.withColumn(s"f_$c", when(col(c) <= cap, 1).otherwise(0)) // 0/1: engine-portable
    }
    flagged.withColumn("keep", caps.map(c => col(s"f_${c._1}")).reduce(_ * _))
  }

  /**
   * Top-k word bigrams by total occurrence count (ties broken by bigram
   * text) — the vocabulary-induction companion to [[topKTokens]]: bigram
   * statistics are the first merge-candidate table a BPE-style tokenizer
   * trainer builds. One explode + one count aggregate (map-side partial),
   * then TakeOrderedAndProject — per-partition top-k, no global sort.
   */
  def topKBigrams(df: DataFrame, k: Int, text: String = "text"): DataFrame = {
    // r22: native WordNgrams kernel — the transform(sequence...) chain was
    // CodegenFallback (interpreted lambda per bigram); values bit-identical
    val bigrams = graft.text.WordNgrams.ofColumn(col("__toks"), 2)
    df.select(tokens(col(text)).as("__toks"))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(k)
  }

  /**
   * Deterministic stratified sampling to target per-stratum rates — the
   * mixture-weighting step of a training-data pipeline (e.g. downsample
   * CommonCrawl, keep all of Wikipedia). Rate r becomes the md5-hex prefix
   * bound hex(floor(r·16^8)): content-hash sampling like [[hashSample]], so
   * the sample is reproducible across engines/runs and independent of
   * partitioning. A narrow filter — no shuffle, scales trivially.
   */
  def stratifiedSample(df: DataFrame, rates: Map[String, Double],
      strata: String = "source", text: String = "text",
      defaultRate: Double = 0.0): DataFrame = {
    // 'g' sorts above every hex digit, so rate >= 1 keeps all rows
    def bound(r: Double): String =
      if (r >= 1.0) "g" else f"${(math.max(r, 0.0) * 65536.0 * 65536.0).toLong}%08x"
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(bound(defaultRate))) {
      case (acc, (s, r)) => when(col(strata) === s, lit(bound(r))).otherwise(acc)
    }
    df.filter(md5(col(text).cast("binary")) < thr)
  }

  /**
   * Per-source mixture plan (r18): the table every pretraining run computes
   * before sampling — given target weights and a total token budget, how
   * many tokens each source contributes and at how many EPOCHS (upsampling
   * factor), capped at `maxEpochs` so a tiny source can't be repeated
   * unboundedly. alloc = min(budget × weight, tokens × maxEpochs);
   * epochs = alloc / tokens. One aggregation; weights are a literal
   * when-chain (sources the map omits get weight 0). The UPsampling
   * complement of [[mixWeights]], whose keep-rates are ≤ 1 (downsample to
   * shares); here epochs exceed 1 when the budget demands repetition, and
   * [[mixtureUpsample]] materializes the copies.
   */
  def mixturePlan(df: DataFrame, weights: Map[String, Double],
      tokenBudget: Long, maxEpochs: Double = 10.0, strata: String = "source",
      text: String = "text"): DataFrame = {
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(col(strata) === s, lit(r)).otherwise(acc)
    }
    df.select(col(strata), size(tokens(coalesce(col(text), lit("")))).cast("long")
        .as("__t"), w.as("__w"))
      .groupBy(col(strata))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"),
        max(col("__w")).as("target_weight"))
      .withColumn("alloc_tokens", least(lit(tokenBudget.toDouble) * col("target_weight"),
        col("n_tokens").cast("double") * maxEpochs))
      // a zero-token source would make alloc/n_tokens = 0/0 = NaN; emit an
      // explicit 0.0 so downstream upsampling yields zero copies, not NaN rows
      .withColumn("epochs", when(col("n_tokens") === 0L, lit(0.0))
        .otherwise(col("alloc_tokens") / col("n_tokens")))
  }

  /**
   * Deterministic mixture materialization (r18): emit each document
   * `floor(epochs)` times plus one extra copy for the fractional remainder,
   * selected by the content-hash rule `md5(id)[0,8) / 16^8 < frac(epochs)`
   * — reproducible across runs and engines, no RNG, and unbiased for ANY id
   * scheme. (The r18 positional rule `(id mod 10000)/10000` was only
   * unbiased under uniform id residues; snowflake/block-allocated ids
   * silently skewed the realized fraction — r19 verdict item #1.) Epochs
   * come from [[mixturePlan]] over the same corpus; output one row per COPY
   * (id, source, copy, n_tokens), the upsampled stream a trainer consumes.
   * Scale shape: the per-source plan is a #sources-row broadcast join;
   * the explode is narrow (sequence over a per-row count).
   */
  def mixtureUpsample(df: DataFrame, weights: Map[String, Double],
      tokenBudget: Long, maxEpochs: Double = 10.0, strata: String = "source",
      text: String = "text", idCol: String = "doc_id"): DataFrame = {
    val plan = mixturePlan(df, weights, tokenBudget, maxEpochs, strata, text)
      .select(col(strata), col("epochs"))
    val base = df.select(col(idCol), col(strata),
      size(tokens(coalesce(col(text), lit("")))).cast("long").as("n_tokens"))
    // uniform (0,1) key from the id's md5 prefix — same content-hash family
    // as [[stratifiedSample]]; 8 hex digits are exact in a double and the
    // divisor is a power of two, so the compare is bit-identical cross-engine
    val u = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("double") / lit(math.pow(16.0, 8))
    base.join(broadcast(plan), strata)
      .withColumn("__whole", floor(col("epochs")).cast("long"))
      .withColumn("__extra",
        when(u < col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
      .withColumn("__n", col("__whole") + col("__extra"))
      .withColumn("copy", explode(when(col("__n") >= 1,
        sequence(lit(1L), col("__n"))).otherwise(expr("array()").cast("array<bigint>"))))
      .select(col(idCol), col(strata), col("copy"), col("n_tokens"))
  }

  /**
   * Corpus unigram language-model score per document: the mean negative log
   * probability of the document's tokens under the corpus' own unigram
   * distribution (CCNet-style perplexity proxy — unusually improbable token
   * mixes score high and get filtered/flagged). Returns
   * `(id, n_tokens, avg_neg_logprob)`.
   *
   * Scale shape: per-(doc, token) counts first (one keyed aggregation whose
   * shuffle carries distinct pairs, not raw tokens), the vocabulary is a
   * second aggregation of THAT — then one equi-join keyed on the token and
   * one keyed aggregation back to documents. The corpus-total row rides
   * along as a broadcast scalar. No driver loop, no collect: the "model
   * training" (vocab counting) and "scoring" are the same distributed scan.
   */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    val perTok = df.select(col(idCol), explode(tokens(col(text))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val vocab = perTok.groupBy(col("tok")).agg(sum("cnt").as("tf"))
    val total = vocab.agg(sum("tf").as("total"))
    perTok.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_tokens"),
        round(-sum(col("cnt") * log(col("tf").cast("double") / col("total"))) /
          sum("cnt"), 6).as("avg_neg_logprob"))
  }

  /**
   * Corpus bigram-LM scoring: per document, the average negative conditional
   * log-probability −Σ c·ln P(w₂|w₁) / Σ c under the corpus MLE
   * P(w₂|w₁) = c(w₁w₂) / Σ_w c(w₁w) — the order-2 upgrade of
   * [[unigramLogProb]] (CCNet scores with an LM; a corpus-trained bigram
   * model is its engine-checkable stand-in). Every probability is a ratio
   * of two corpus counts, so no smoothing is needed: a bigram always has a
   * nonzero count in the model trained on the same corpus.
   *
   * Shape: bigram extraction is a narrow map (zip of the token array with
   * its own tail); then two keyed aggregations (per-doc and corpus bigram
   * counts — the corpus count partial-aggregates map-side), a
   * predecessor-count aggregation over the corpus bigrams (tiny), and two
   * keyed joins. No driver-side state.
   */
  def bigramLogProb(df: DataFrame, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    // r22: native WordNgrams kernel — the zip_with(slice, slice,
    // concat_ws) chain was CodegenFallback (interpreted lambda per bigram
    // plus two sliced array copies per row); identical "w1 w2" strings
    val big = df
      .select(col(idCol), tokens(col(text)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(graft.text.WordNgrams.ofColumn(col("__t"), 2)).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    val corpus = big.groupBy(col("bigram")).agg(sum("cnt").as("cb"))
      .withColumn("__w1", substring_index(col("bigram"), " ", 1))
    val prev = corpus.groupBy(col("__w1")).agg(sum("cb").as("cu"))
    big.join(corpus, "bigram")
      .join(prev, "__w1")
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_bigrams"),
        round(-sum(col("cnt") * log(col("cb").cast("double") / col("cu"))) /
          sum("cnt"), 6).as("avg_neg_logprob"))
  }

  /**
   * LM-perplexity quality gate (the CCNet-style filter): per-document
   * bigram perplexity exp(H) from [[bigramLogProb]]'s self-trained corpus
   * LM, gated against a caller-fixed threshold. Low perplexity = fluent,
   * in-distribution text; high = noise, boilerplate soup, or wrong
   * language. The gate compares the 6-decimal-ROUNDED perplexity so the
   * keep flag is engine-stable (raw doubles from two engines' exp/ln can
   * differ in the last ULP; a 1e-6 bucket cannot flip an inequality unless
   * the threshold itself is chosen adversarially).
   *
   * Same scale shape as [[bigramLogProb]] (two keyed aggs + two joins);
   * the gate adds a narrow map.
   */
  def lmPerplexityGate(df: DataFrame, maxPerplexity: Double,
      idCol: String = "doc_id", text: String = "text"): DataFrame =
    bigramLogProb(df, idCol, text)
      .withColumn("perplexity", round(exp(col("avg_neg_logprob")), 6))
      .withColumn("keep", col("perplexity") <= maxPerplexity)
      .select(col(idCol), col("n_bigrams"), col("avg_neg_logprob"),
        col("perplexity"), col("keep"))

  /**
   * CCNet-style perplexity bucketing: within every stratum, split
   * documents into `head` / `middle` / `tail` at the `lo` and `hi`
   * perplexity quantiles (CCNet keeps the low-perplexity head as the
   * high-quality slice and optionally discards the tail — Wenzek et al.,
   * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
   * Data"). Perplexity is the corpus-fit bigram LM's ([[bigramLogProb]]),
   * thresholds are exact interpolated quantiles over the ROUNDED
   * perplexities (engine-stable: both sides of the comparison are
   * 6-decimal values and the quantile of identical inputs is identical).
   *
   * Shape: the per-doc scoring pipeline, one per-stratum quantile
   * aggregate (stratum-cardinality rows, broadcast back), one comparison
   * map. No stratum-wide sort or window.
   */
  def ccnetBuckets(df: DataFrame, lo: Double = 1.0 / 3, hi: Double = 2.0 / 3,
      strata: String = "source", idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(0 < lo && lo < hi && hi < 1, "0 < lo < hi < 1")
    val scored = bigramLogProb(df, idCol, text)
      .withColumn("perplexity", round(exp(col("avg_neg_logprob")), 6))
      .join(df.select(col(idCol), col(strata)), Seq(idCol))
    val th = scored.groupBy(col(strata)).agg(
      percentile(col("perplexity"), lit(lo)).as("__lo"),
      percentile(col("perplexity"), lit(hi)).as("__hi"))
    scored.join(broadcast(th), Seq(strata))
      .withColumn("bucket",
        when(col("perplexity") <= col("__lo"), lit("head"))
          .when(col("perplexity") <= col("__hi"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(strata), col(idCol), col("perplexity"), col("bucket"))
  }

  /**
   * Per-document top-k TF-IDF terms (tfidf = tf · ln(N / df), ranked on the
   * 6-decimal-rounded score with the token string as tie-break): the
   * keyword-extraction primitive. Ranking on the ROUNDED score is what makes
   * the result engine-stable — raw doubles from two engines' `ln` can differ
   * in the last ULP, but a 1e-6 bucket plus a total tie-break order cannot
   * flip. Shape: two keyed aggregations (doc-term counts, then document
   * frequency), a token-keyed join, and a per-doc top-k window that reuses
   * the doc partitioning.
   */
  def tfidfTopTerms(df: DataFrame, k: Int, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perTok = df.select(col(idCol), explode(tokens(col(text))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val docFreq = perTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    perTok.join(docFreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("cnt") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk").cast("long").as("rnk"), col("tok"),
        col("tfidf"))
  }

  /**
   * Zipf-law fit of the corpus vocabulary: OLS slope/intercept of
   * ln(frequency) against ln(rank) (rank 1 = most frequent, ties broken by
   * token). Natural text gives a slope near −1; a far-off slope flags
   * synthetic or degenerate corpora — a one-number corpus-health check.
   *
   * Scale note: ranking runs over the VOCABULARY (distinct tokens) after a
   * partial-aggregated count shuffle, and is computed WITHOUT a global
   * single-partition window: a range-partitioned distributed sort followed
   * by RDD zipWithIndex assigns exact contiguous global ranks while every
   * partition stays bounded — a 10⁹-token web-corpus vocabulary ranks in
   * parallel instead of collapsing onto one reducer.
   */
  def zipfFit(df: DataFrame, text: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df.select(explode(tokens(col(text))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    vocab.select(col("n").cast("long").as("n"), col("tok"))
      .sort(col("n").desc, col("tok"))
      .as[(Long, String)].rdd.zipWithIndex()
      .map { case ((n, _), i) => (n, i + 1L) }
      .toDF("n", "rnk")
      .agg(count(lit(1)).as("n_vocab"),
        regr_slope(log(col("n").cast("double")), log(col("rnk").cast("double")))
          .as("zipf_slope"),
        regr_intercept(log(col("n").cast("double")), log(col("rnk").cast("double")))
          .as("zipf_intercept"))
  }

  /**
   * Corpus top-k word n-grams with document frequency — the generalized
   * sibling of [[topKBigrams]] and the detector for boilerplate phrases
   * (an n-gram whose doc frequency approaches its total count is a
   * template fragment repeated across documents). Explode → one keyed
   * aggregation carrying distinct (doc, ngram) pairs → global top-k via
   * TakeOrderedAndProject (partial per-partition top-k, no global sort).
   */
  def topKNgrams(df: DataFrame, n: Int, k: Int, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(n >= 1, "n must be positive")
    // r22: native WordNgrams kernel (see topKBigrams) — bit-identical grams
    val grams = graft.text.WordNgrams.ofColumn(col("__toks"), n)
    df.select(col(idCol), tokens(col(text)).as("__toks"))
      .select(col(idCol), explode(grams).as("ngram"))
      .groupBy(col(idCol), col("ngram")).agg(count(lit(1)).as("__c"))
      .groupBy(col("ngram"))
      .agg(sum(col("__c")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_docs"))
      .orderBy(col("n").desc, col("ngram")).limit(k)
  }

  /**
   * [[topKNgrams]] with a frequent-candidate pre-filter for corpora whose
   * distinct-n-gram volume makes the exact (doc, ngram) aggregation the
   * dominant shuffle: occurrences are first hashed into a BOUNDED-width
   * bucket count (map-side partial agg ⇒ at most `width` rows shuffle per
   * partition regardless of corpus size), and only n-grams whose bucket
   * count reaches `minCount` are exact-counted.
   *
   * Contract: a bucket count OVERestimates every member n-gram's true count
   * (collisions only add), so the candidate set is a strict superset of the
   * n-grams with true count ≥ minCount — the result is IDENTICAL to
   * [[topKNgrams]] whenever the true k-th count ≥ minCount, and the
   * pre-filter can only drop n-grams rarer than that. Pick minCount as the
   * support floor below which a "top" n-gram is meaningless.
   */
  def topKNgramsSketched(df: DataFrame, n: Int, k: Int, minCount: Long = 5,
      width: Int = 1 << 20, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(n >= 1, "n must be positive")
    // r22: native WordNgrams kernel (see topKBigrams) — bit-identical grams
    val grams = graft.text.WordNgrams.ofColumn(col("__toks"), n)
    val exploded = df.select(col(idCol), tokens(col(text)).as("__toks"))
      .select(col(idCol), explode(grams).as("ngram"))
    val bucket = pmod(xxhash64(col("ngram")), lit(width.toLong))
    // pass 1: bounded-width occurrence sketch; the shuffle carries at most
    // `width` rows per map partition however large the corpus is
    val hot = exploded.groupBy(bucket.as("__b"))
      .agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") >= minCount)
      .select(col("__b"))
    // pass 2: exact-count only the candidates (un-hinted join — `hot` is
    // bounded by `width`, AQE broadcasts it when it fits)
    exploded.withColumn("__b", bucket)
      .join(hot, "__b")
      .groupBy(col(idCol), col("ngram")).agg(count(lit(1)).as("__c"))
      .groupBy(col("ngram"))
      .agg(sum(col("__c")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_docs"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("ngram")).limit(k)
  }

  /**
   * Per-document shingle commonality: the fraction of a document's
   * distinct k-shingles that also occur in at least one OTHER document —
   * a continuous near-duplication risk score (1.0 = every phrase is shared
   * somewhere; the soft sibling of [[graft.text.Dedup]]'s pair detectors).
   * One explode of distinct shingles, one shingle-keyed doc-frequency
   * aggregation, one equi-join back, one doc-keyed aggregation; the ratio
   * is an int/int double division, bit-exact vs the oracle.
   */
  def shingleCommonality(df: DataFrame, k: Int = 3, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    // 64-bit shingle hashes as the exchange keys (r17, see
    // Dedup.duplicateSpans): same counts modulo ~2^-65 collisions, ~5x
    // smaller doc-frequency + join shuffles
    val sh = df.select(col(idCol),
        explode(HashedWordShingles.ofColumn(col(text), k)).as("sh"))
    val docFreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    sh.join(docFreq, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_shared"),
        try_divide(sum(when(col("__df") > 1, 1L).otherwise(0L)).cast("double"),
          count(lit(1)).cast("double")).as("shared_ratio"))
  }

  /**
   * Quality-tiered deterministic sampling: bucket every document by its
   * [[qualityScore]], then keep each tier at its own rate via the same
   * content-hash bound as [[stratifiedSample]] — the "train mostly on the
   * good slice but keep a floor of everything" mixture step of a
   * pre-training pipeline. Reproducible across engines/runs and
   * partitioning; a narrow map+filter, no shuffle.
   */
  def qualityTierSample(df: DataFrame, hiThreshold: Double = 0.85,
      midThreshold: Double = 0.78, hiRate: Double = 1.0, midRate: Double = 0.25,
      lowRate: Double = 0.0625, idCol: String = "doc_id",
      text: String = "text"): DataFrame = {
    def bound(r: Double): String =
      if (r >= 1.0) "g" else f"${(math.max(r, 0.0) * 65536.0 * 65536.0).toLong}%08x"
    val scored = qualityScore(df)
    val tier = when(col("quality_score") >= hiThreshold, lit("high"))
      .when(col("quality_score") >= midThreshold, lit("mid"))
      .otherwise(lit("low"))
    val thr = when(tier === "high", lit(bound(hiRate)))
      .when(tier === "mid", lit(bound(midRate)))
      .otherwise(lit(bound(lowRate)))
    scored.withColumn("tier", tier)
      .filter(md5(col(text).cast("binary")) < thr)
      .select(col(idCol), col("tier"), col("quality_score"))
  }

  /**
   * Domain-mix sampling weights: given target corpus SHARES per source
   * (e.g. web 0.6, books 0.2, code 0.2) and a total token budget, compute
   * the per-source keep RATE that hits the mix — the planning step before
   * [[stratifiedSample]] executes it. rate = min(1, share·budget / tokens):
   * a source with fewer tokens than its allocation keeps everything
   * (capped at 1 — the shortfall is visible in `allocated_tokens` vs
   * `expected_tokens` rather than silently re-normalized away). One keyed
   * aggregation over (source → token count); scales as a partial-agg
   * shuffle of one row per source.
   */
  def mixWeights(df: DataFrame, targetShares: Map[String, Double],
      budgetTokens: Long, strata: String = "source",
      text: String = "text"): DataFrame = {
    val share = targetShares.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (s, r)) =>
        when(col(strata) === s, lit(r)).otherwise(acc)
      }
    df.groupBy(col(strata))
      .agg(sum(size(tokens(col(text))).cast("long")).as("n_tokens"))
      .withColumn("target_share", share)
      // floor, not cast: Spark's double->long cast truncates but DuckDB's
      // rounds — an explicit floor is the same integer in both engines
      .withColumn("allocated_tokens", floor(col("target_share") * budgetTokens))
      .withColumn("rate", least(lit(1.0),
        try_divide(col("target_share") * budgetTokens,
          col("n_tokens").cast("double"))))
      .withColumn("expected_tokens", floor(col("rate") * col("n_tokens")))
  }

  /**
   * Context-window chunking: split each document's token stream into
   * windows of `window` tokens advancing by `window − overlap` (the
   * sequence-prep step before packing/tokenization). Chunk c of a doc with
   * n tokens covers tokens [c·step, min(n, c·step + window)); every token
   * position is covered, consecutive chunks share `overlap` tokens, and a
   * tail shorter than `overlap` still emits (documented: the cost of never
   * dropping a suffix). The token array is materialized in its own
   * projection BEFORE the explode so the lambda does not re-split the
   * document per chunk; a narrow map+explode, no shuffle.
   */
  def chunkDocs(df: DataFrame, window: Int, overlap: Int,
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got overlap=$overlap window=$window")
    val step = window - overlap
    df.select(col(idCol), tokens(col(text)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(step))).as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        least(size(col("__toks")) - col("start_tok"), lit(window))
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("start_tok") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /**
   * Token-stream packing plan: concatenate each stratum's documents in
   * `idCol` order into one token stream and cut it into `window`-token
   * training sequences — the sequence-packing step (every GPT-style
   * pipeline's final layout; no padding waste, documents straddle
   * boundaries and are split at tokenization time). Emits per doc its
   * global `start_offset` in the stream, the `bin_id` of the window its
   * FIRST token lands in, its offset within that bin, and whether it
   * straddles a boundary. One running-sum window per stratum — the same
   * key shuffle a groupBy(strata) needs; at extreme per-stratum skew the
   * stratum would be sub-sharded first (the [[graft.ts.Skew]] pattern).
   */
  def packingPlan(df: DataFrame, window: Int, strata: String = "source",
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strata)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(strata), col(idCol),
        size(tokens(col(text))).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral `div`, not `/`: Spark's / is double division, and doubles
      // lose integer exactness past 2^53 — real at 100 TB token offsets
      .withColumn("bin_id", expr(s"start_offset div $window"))
      .withColumn("offset_in_bin", col("start_offset") % window)
      .withColumn("straddles",
        col("offset_in_bin") + col("n_tokens") > window)
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing: Local
   * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
   * design): polynomial hashes of every `k`-char gram, then the MINIMUM
   * hash of each `w`-consecutive-gram window, de-duplicated per document.
   * The guarantee that makes this a dedup primitive: any shared substring
   * of length ≥ k+w−1 yields at least one shared fingerprint, and the
   * selected positions are LOCAL (a doc edit only perturbs fingerprints
   * within w grams of the edit) — unlike a whole-doc hash. Docs shorter
   * than k+w−1 produce no fingerprints (documented).
   *
   * Hashing + window minima run in the native codegen'd [[WinnowingMins]]
   * expression — one compiled O(n·k) pass per document (the HOF
   * formulation's interpreted aggregate-inside-transform lambdas cost
   * ~18 ms/doc: 92 s for tx22 at sf0.1, vs ~1 s compiled). Narrow map +
   * explode, no shuffle; downstream joins group by `fingerprint` exactly
   * like the shingle pipelines.
   */
  def winnowingFingerprints(df: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", text: String = "text"): DataFrame =
    // octet_length, not length: the expression hashes UTF-8 BYTES, so the
    // minimum-input gate must count bytes too (a 7-char doc with multibyte
    // chars can still carry >= k+w-1 byte-grams)
    df.filter(octet_length(col(text)) >= k + w - 1)
      .select(col(idCol), explode(array_distinct(
        WinnowingMins.ofColumn(col(text), k, w))).as("fingerprint"))

  /**
   * Cross-document substring duplication via winnowing: join documents on
   * shared [[winnowingFingerprints]] and report, per doc, how many of its
   * fingerprints appear in at least one OTHER document — the
   * substring-level dup signal (winnowing guarantees any shared run of
   * ≥ k+w−1 chars contributes a shared fingerprint, so `dup_fp_ratio` ≈
   * fraction of the doc covered by text seen elsewhere). Same shape as the
   * shingle doc-frequency pipeline (dd09) but character-level and
   * edit-local. One fingerprint-keyed shuffle; doc frequency, never
   * doc×doc pairs.
   */
  def winnowingDuplication(df: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    val fps = winnowingFingerprints(df, k, w, idCol, text)
    // doc frequency via a window over the ONE fingerprint pipeline
    // (fingerprints are distinct-per-doc, so count per fingerprint = doc
    // frequency) — a join against a groupBy of the same plan would run the
    // winnowing scan twice; the window costs the identical fingerprint
    // shuffle exactly once
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))
    fps.withColumn("__df", count(lit(1)).over(wFp))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup_fingerprints"))
      .select(col(idCol), col("n_fingerprints"), col("n_dup_fingerprints"),
        try_divide(col("n_dup_fingerprints").cast("double"),
          col("n_fingerprints").cast("double")).as("dup_fp_ratio"))
  }

  /**
   * Population-stability-index drift between two cohorts of one corpus
   * (reference vs current snapshot): per stratum,
   * p = ref share, q = cur share, contribution = (q−p)·ln(q/p); total PSI
   * is the sum (rule of thumb: <0.1 stable, >0.25 investigate) — the
   * standard monitor for "did this week's crawl shift the source/language
   * mix". One keyed aggregation over the corpus; the share normalization
   * is a window over the AGGREGATED rows (one per stratum — bounded by
   * stratum cardinality, not corpus size). Strata missing from either
   * cohort contribute null (the counts expose them; standard PSI smoothing
   * is a caller choice, not silently applied).
   */
  def distributionDrift(df: DataFrame, refFilter: Column, curFilter: Column,
      strata: String = "source"): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
    val p = col("n_ref").cast("double") / sum(col("n_ref")).over(all)
    val q = col("n_cur").cast("double") / sum(col("n_cur")).over(all)
    df.groupBy(col(strata)).agg(
        sum(when(refFilter, 1L).otherwise(0L)).as("n_ref"),
        sum(when(curFilter, 1L).otherwise(0L)).as("n_cur"))
      .select(col(strata), col("n_ref"), col("n_cur"),
        round(p, 6).as("p"), round(q, 6).as("q"),
        round(when(col("n_ref") > 0 && col("n_cur") > 0,
          (q - p) * log(q / p)), 6).as("psi_contrib"))
  }

  /**
   * Distinguishing keywords per stratum via weighted log-odds with an
   * informative Dirichlet prior (Monroe/Colaresi/Quinn, "Fightin' Words",
   * Political Analysis 2008 — the standard "what words characterize this
   * source vs the rest" statistic; raw log-odds overweights rare words,
   * the corpus-proportional prior α_w = α0·y_w/N regularizes exactly by
   * each word's overall rate):
   *   δ_w = ln[(y_wi+α_w)/(n_i+α0−y_wi−α_w)] − ln[(y_wj+α_w)/(n_j+α0−y_wj−α_w)]
   *   z_w = δ_w / √(1/(y_wi+α_w) + 1/(y_wj+α_w)),   j = all other strata.
   * One (strata, token) aggregation (the corpus-sized shuffle), then
   * token- and stratum-total joins over the VOCABULARY-sized count table —
   * the stratum totals and grand total are broadcast scalars, never a
   * global window. Top `topK` per stratum by z, token tie-break.
   */
  def logOddsKeywords(df: DataFrame, strata: String = "source",
      text: String = "text", alpha0: Double = 500.0, topK: Int = 5): DataFrame = {
    // materialized once: the count table feeds FOUR consumers (scored path,
    // token totals, stratum totals, grand total) and AQE's runtime exchange
    // reuse only collapses two of them — without this the corpus explode +
    // aggregate re-runs per consumer (measured: 6 parquet scans -> 1).
    // Vocabulary × strata rows: large at web scale but orders of magnitude
    // below the corpus, the standard materialization point.
    val counts = df.select(col(strata), explode(tokens(col(text))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(strata), col("token")).agg(count(lit(1)).as("y_wi"))
      .localCheckpoint()
    val tokTot = counts.groupBy(col("token")).agg(sum(col("y_wi")).as("y_w"))
    val strTot = counts.groupBy(col(strata)).agg(sum(col("y_wi")).as("n_i"))
    val allTot = strTot.agg(sum(col("n_i")).as("n_total"))
    val aW = lit(alpha0) * col("y_w") / col("n_total")
    val yJ = col("y_w") - col("y_wi")
    val nJ = col("n_total") - col("n_i")
    val delta =
      log((col("y_wi") + aW) / (col("n_i") + lit(alpha0) - col("y_wi") - aW)) -
      log((yJ + aW) / (nJ + lit(alpha0) - yJ - aW))
    val z = delta / sqrt(lit(1.0) / (col("y_wi") + aW) + lit(1.0) / (yJ + aW))
    val scored = counts
      .join(tokTot, "token")
      .join(broadcast(strTot), strata)
      .crossJoin(broadcast(allTot))
      .withColumn("log_odds_z", z)
    // Two-phase top-K, NO stratum-wide sort: a rank window partitioned by
    // stratum alone would sort an entire stratum's vocabulary in one task
    // (10^8+ rows at web scale). Phase 1 takes a bounded top-K per
    // (stratum, physical partition) — each group holds only one task's
    // share of the vocabulary; phase 2 merges strata × partitions × K
    // candidate rows, bounded by the partition count, never by vocabulary.
    // Struct sort order (−z asc, token asc) = (z desc, token asc), the same
    // total order as the old rank window; (stratum, token) is unique after
    // the count aggregation, so the top-K set is partitioning-independent.
    // Known bound: phase 1 buffers each (stratum, partition) group's full
    // candidate set in one collect_list aggregation buffer before the
    // slice, and that buffer cannot spill — memory is bounded by the
    // PARTITION's share of the vocabulary (maxPartitionBytes-sized), not
    // by K. Acceptable vs a stratum-wide sort; shrink partitions (or
    // pre-filter low-|z| tokens) if vocabulary-per-partition ever grows
    // past executor memory.
    val cand = struct((-col("log_odds_z")).as("nz"), col("token"),
      col("y_wi"), col("log_odds_z").as("z"))
    scored
      .groupBy(col(strata), spark_partition_id().as("__pid"))
      .agg(slice(sort_array(collect_list(cand)), 1, topK).as("__cand"))
      .groupBy(col(strata))
      .agg(slice(sort_array(flatten(collect_list(col("__cand")))), 1, topK)
        .as("__top"))
      .select(col(strata), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(strata), (col("__pos") + 1).cast("long").as("rank"),
        col("__t.token").as("token"), col("__t.y_wi").as("n_token"),
        round(col("__t.z"), 6).as("log_odds_z"))
  }

  /**
   * Temperature-scaled mixture weights: rescale the natural per-stratum
   * token shares p_i to q_i ∝ p_i^α (α < 1 flattens toward uniform — the
   * multilingual-LM standard for upweighting low-resource slices without
   * discarding the head; α = 1 keeps natural sampling, α = 0 is uniform;
   * the exponent-smoothing design from the multilingual BERT/XLM-R and T5
   * mixing recipes). Emits, per stratum, the natural share, the
   * temperature share, and the resampling factor q/p a sampler applies.
   * One keyed aggregation; the normalization window runs over the
   * AGGREGATED rows (one per stratum — bounded by stratum cardinality,
   * same shape as [[distributionDrift]]).
   */
  def temperatureMix(df: DataFrame, alpha: Double = 0.7,
      strata: String = "source", text: String = "text"): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    // two projection steps: the q normalization windows over the
    // MATERIALIZED p column (window expressions cannot nest)
    df.groupBy(col(strata))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(text)))).cast("long").as("n_tokens"))
      .withColumn("__p",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(wAll))
      .withColumn("__q",
        pow(col("__p"), lit(alpha)) / sum(pow(col("__p"), lit(alpha))).over(wAll))
      .select(col(strata), col("n_docs"), col("n_tokens"),
        round(col("__p"), 6).as("p_natural"),
        round(col("__q"), 6).as("p_temperature"),
        round(try_divide(col("__q"), col("__p")), 6).as("sampling_factor"))
  }

  /**
   * Code-vs-prose detection per document — the curation gate that keeps
   * source code out of a prose corpus (or routes it to a code corpus).
   * Signals are deliberately REGEX-FREE so every engine computes them
   * identically (count-by-deletion: occurrences of c = len − len(text
   * without c)):
   *   code_symbol_ratio — share of chars in the C-family symbol set
   *     `{ } ( ) ; = < > [ ] #` (prose sits < 1%, code > 5%);
   *   keyword_hits — distinct hits from a small polyglot keyword list
   *     (`def `, `void `, `return `, `import `, `function `, `class `,
   *     `#include`, `const `), substring containment, not tokenization;
   *   is_code — symbol ratio above `symbolThreshold` OR ≥ 2 keywords.
   * One narrow projection, no shuffle, whole-stage codegen end to end.
   */
  def codeDetect(df: DataFrame, symbolThreshold: Double = 0.05,
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    val symbols = "{}();=<>[]#"
    val nChars = length(col(text))
    val nSym = symbols.map(c =>
      nChars - length(replace(col(text), lit(c.toString), lit(""))))
      .reduce(_ + _)
    val keywords = Seq("def ", "void ", "return ", "import ", "function ",
      "class ", "#include", "const ")
    val hits = keywords.map(k => when(instr(col(text), k) > 0, 1).otherwise(0))
      .reduce(_ + _)
    df.select(col(idCol),
        nChars.cast("long").as("n_chars"),
        nSym.cast("long").as("n_code_symbols"),
        hits.cast("long").as("keyword_hits"))
      .withColumn("code_symbol_ratio",
        round(try_divide(col("n_code_symbols").cast("double"),
          col("n_chars").cast("double")), 6))
      .withColumn("is_code",
        col("code_symbol_ratio") > symbolThreshold || col("keyword_hits") >= 2)
  }

  /**
   * Feature-hashing ("hashing trick", Weinberger et al. ICML 2009)
   * document embeddings: token counts folded into a fixed `dim`-bucket
   * dense vector by token hash, L2-normalized — the no-model text
   * embedding that feeds the embedding surface (SemDeDup, ANN, centroid
   * analytics) when no learned encoder exists. Bucket = rolling polynomial
   * hash of the token's bytes mod `dim`; `dim` must be a power of two so
   * the signed-long `pmod` equals the unsigned mod any engine computes
   * (2^64 ≡ 0 mod 2^k — the cross-engine parity argument, same family as
   * tx05's HUGEINT-fold oracle). No pivot, no per-dimension shuffle; two
   * plans by `dim`: codegen'd conditional sums in ONE doc-keyed exchange
   * up to `largeDimThreshold`, a sparse (doc, bucket) pre-aggregation +
   * map build above it (plan size O(1) in dim — the conditional-sum plan
   * would blow codegen limits at dim ≳ 1k). Both paths produce identical
   * vectors (spec-asserted).
   */
  def featureHashEmbedding(df: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", text: String = "text",
      largeDimThreshold: Int = 256): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0, "dim must be a power of two")
    lazy val bucketed = df
      .select(col(idCol), explode(tokens(col(text))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("__b", pmod(RollingHash.ofColumn(col("tok")), lit(dim.toLong)))
    if (dim <= largeDimThreshold) {
      // small dim — ONE compiled partition-local pass per doc, now with the
      // L2 normalization FUSED into the expression (r21): the unfused
      // counts → HOF-norm → HOF-divide → filter chain let the pushed-down
      // norm filter re-evaluate the counts kernel up to 5× per row inside
      // an interpreted Filter (see FeatureHashEmbedding's doc); the fused
      // kernel emits NULL for token-less docs (the same rows the
      // __norm > 0 filter dropped). Plan still has NO exchange.
      // r22 (ADVICE r21): the NULL-drop filter on a plain Project alias was
      // a deterministic predicate Catalyst pushed BELOW the Project with
      // alias substitution — the kernel ran twice per surviving row
      // (Filter + Project). Routing the value through explode(array(...))
      // puts a Generate between them: the filter references the generator's
      // output attribute, which does not exist below the Generate, so the
      // kernel is genuinely evaluated once per row. explode(array(x))
      // always emits exactly one row (a 1-element array, even when x is
      // NULL), so rows and values are unchanged.
      return df.select(col(idCol),
          explode(array(FeatureHashEmbedding.ofColumn(col(text), dim)))
            .as("embedding"))
        .filter(col("embedding").isNotNull)
    }
    val raw =
      {
        // large dim — `dim` generated agg expressions exceed the codegen
        // method/constant-pool limits (interpreted fallback or minutes of
        // janino compilation at dim ≳ 1k). Sparse (doc, bucket) pre-agg +
        // map build instead: one extra exchange and an ObjectHashAggregate,
        // but plan size is O(1) in `dim` and the wire carries only the
        // OCCUPIED buckets per doc (≤ tokens, typically ≪ dim)
        bucketed.groupBy(col(idCol), col("__b"))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col(idCol))
          .agg(map_from_entries(collect_list(struct(col("__b"), col("__c"))))
            .as("__m"))
          .withColumn("__raw", transform(
            sequence(lit(0L), lit(dim.toLong - 1L)),
            b => coalesce(element_at(col("__m"), b), lit(0L)).cast("double")))
      }
    raw
      .withColumn("__norm",
        sqrt(aggregate(col("__raw"), lit(0.0), (a, x) => a + x * x)))
      // token-less docs (empty/all-space text) have no embedding — the
      // explode-based paths dropped them implicitly; the expression path
      // emits a zero vector, so the drop is made explicit here
      .filter(col("__norm") > 0)
      .select(col(idCol),
        transform(col("__raw"), x => x / col("__norm")).as("embedding"))
  }

  /**
   * Corpus snapshot diff by content: classify every document of two
   * corpus versions as `unchanged` (same id, same canonical fingerprint),
   * `edited` (same id, fingerprint changed), `added` / `removed` (id in
   * one side only), and roll the counts up per stratum — the monitor a
   * recrawl pipeline runs before reprocessing ("how much actually
   * changed?" decides incremental vs full runs). One full-outer equi-join
   * on the id (both sides shuffle once on the same key) + one stratum
   * aggregate; fingerprints are [[canonicalFingerprint]] so formatting
   * noise doesn't count as an edit.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", text: String = "text",
      strata: String = "source"): DataFrame = {
    def fp(df: DataFrame, side: String) =
      df.select(col(idCol), col(strata).as(s"__s_$side"),
        canonicalFingerprint(col(text)).as(s"__fp_$side"))
    val joined = fp(oldDf, "old").join(fp(newDf, "new"), Seq(idCol), "full_outer")
    val status = when(col("__fp_old").isNull, "added")
      .when(col("__fp_new").isNull, "removed")
      .when(col("__fp_old") === col("__fp_new"), "unchanged")
      .otherwise("edited")
    joined
      .withColumn("status", status)
      .withColumn(strata, coalesce(col("__s_new"), col("__s_old")))
      .groupBy(col(strata), col("status"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /**
   * Bottom-k sample: the k rows with the smallest content hashes — the
   * MERGEABLE distributed equivalent of reservoir sampling (bottom-k
   * sketch: each partition keeps its k smallest, merge keeps the k
   * smallest of the union; Spark plans it as TakeOrderedAndProject, no
   * full sort, no shuffle of non-survivors). Content-hashed, so the
   * sample is reproducible across engines/runs, independent of partition
   * order, and stable under corpus appends (a new doc displaces at most
   * one sampled doc) — properties seeded `RAND()` sampling lacks.
   */
  def bottomKSample(df: DataFrame, k: Int, idCol: String = "doc_id",
      text: String = "text"): DataFrame =
    // null text has no content hash — excluded explicitly, rather than
    // letting engine null-ordering defaults (Spark NULLS FIRST vs SQL
    // NULLS LAST) decide whether it occupies a sample slot
    df.filter(col(text).isNotNull)
      .withColumn("sample_key", md5(col(text).cast("binary")))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)

  /**
   * Per-stratum capped bottom-k sample — the "domain cap" curation step
   * (C4/RefinedWeb-style: no single source may contribute more than `cap`
   * documents): within every stratum keep the `cap` rows with the smallest
   * content hashes, the same mergeable, append-stable, engine-reproducible
   * selection as [[bottomKSample]] applied per group.
   *
   * Scale shape: a rank window partitioned by stratum alone would sort an
   * entire source's documents in one task (the tx23 lesson); this is the
   * bounded two-phase top-K instead — phase 1 keeps the `cap` smallest per
   * (stratum, physical partition), phase 2 merges strata × partitions ×
   * cap candidate rows, bounded by the partition count, never by stratum
   * size. Ties beyond identical text are broken by id, so the selected
   * set is partitioning-independent (spec-asserted). Returns (strata, id,
   * sample_key); semi-join on id to recover full rows.
   *
   * Known bound: phase 1's collect_list buffer holds one (stratum,
   * partition) group's full candidate set before the slice and cannot
   * spill — memory is bounded by the partition size
   * (maxPartitionBytes-sized), not by cap. Same trade as
   * [[logOddsKeywords]]; shrink input partitions if rows-per-partition
   * ever outgrow executor memory.
   */
  def stratumCapSample(df: DataFrame, cap: Int, strata: String = "source",
      idCol: String = "doc_id", text: String = "text"): DataFrame = {
    require(cap >= 1, "cap >= 1")
    val cand = struct(md5(col(text).cast("binary")).as("sample_key"),
      col(idCol).as("id"))
    df.filter(col(text).isNotNull)
      .groupBy(col(strata), spark_partition_id().as("__pid"))
      .agg(slice(sort_array(collect_list(cand)), 1, cap).as("__cand"))
      .groupBy(col(strata))
      .agg(slice(sort_array(flatten(collect_list(col("__cand")))), 1, cap)
        .as("__top"))
      .select(col(strata), explode(col("__top")).as("__t"))
      .select(col(strata), col("__t.id").as(idCol), col("__t.sample_key"))
  }

  /** Canonical fingerprint: md5 of lowercased, punctuation-stripped,
    * whitespace-collapsed text — near-dup resilient to formatting noise. */
  def canonicalFingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " ")).cast("binary"))

  /** Rolling polynomial hash (custom Catalyst expression with codegen). */
  def rollingHash(text: Column): Column = RollingHash.ofColumn(text)
}

/** Minimal stopword profiles for the language-ID heuristic (public lists). */
object StopWords {
  val en: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "that", "it", "on", "for", "with", "as", "this")
  val es: Seq[String] = Seq("el", "la", "los", "las", "de", "del", "y", "o",
    "en", "es", "un", "una", "que", "por", "con", "para", "su", "se")
  val de: Seq[String] = Seq("der", "die", "das", "und", "oder", "von", "zu",
    "in", "ist", "sind", "ein", "eine", "dass", "mit", "auf", "für", "sich")
  val fr: Seq[String] = Seq("le", "la", "les", "de", "des", "et", "ou", "en",
    "est", "sont", "un", "une", "que", "pour", "avec", "sur", "dans", "ce")
  val zh: Seq[String] = Seq("的", "了", "和", "是", "在", "我", "有", "他",
    "这", "中", "大", "来", "上", "国", "个", "到", "说", "们")
  val profiles: Seq[(String, Seq[String])] =
    Seq("de" -> de, "en" -> en, "es" -> es, "fr" -> fr, "zh" -> zh)
}
