package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SemDeDup — semantic deduplication by cluster-then-compare (Abbas et al.,
 * "SemDeDup: Data-efficient learning at web-scale through semantic
 * deduplication", arXiv:2303.09540): k-means cluster the normalized
 * embedding space, then compute exact pairwise cosine ONLY within each
 * cluster; pairs above the threshold are semantic duplicates.
 *
 * Complements the lexical near-dup surface (MinHash dd03, SimHash dd04,
 * winnowing dd12) and the hyperplane-LSH embedding near-dup (dd06):
 * SemDeDup targets *meaning-level* duplicates — paraphrases and
 * translations that share few tokens — and its cost model differs from
 * LSH: Σ_c n_c² within-cluster work instead of band-bucket collisions, so
 * candidate volume is controlled directly by the cluster count k rather
 * than by band/row tuning.
 *
 * Scale design (the paper's own, re-expressed on Spark): the codebook fits
 * driver-locally on a BOUNDED uniform sample ([[Similarity.localKMeans]] —
 * O(sample) at any corpus size, byte-capped like IVF/PQ); cluster
 * assignment is a narrow broadcast map; the only shuffle is the
 * cluster-keyed self-join. At 100 TB, k grows with the corpus so E[n_c]
 * stays bounded (the paper uses k ≈ √n); a skewed cluster is one keyed
 * partition and can be salted by raising k.
 */
object SemDedup {

  /**
   * Corpus-scaled cluster count, the paper's k ≈ √n rule with a floor:
   * keeps E[n_c] ≈ √n so within-cluster Σn_c² work stays ~linear in the
   * corpus. Pass `k <= 0` to [[semanticDuplicates]]/[[semanticKeepers]] to
   * apply this automatically from the corpus count.
   */
  def suggestedK(n: Long, minK: Int = 16): Int =
    math.max(minK, math.ceil(math.sqrt(n.toDouble)).toInt)

  /**
   * Within-cluster semantic duplicate pairs: `(cluster, id_a, id_b,
   * cosine)` with `id_a < id_b`, cosine ≥ `threshold`, cosine exact (the
   * cluster step only PRUNES candidates — reported similarity is never
   * approximated, the same contract as dd06's verify step).
   *
   * `nprobe` > 1 assigns every vector to its `nprobe` nearest centroids
   * (multi-probe, the IVF trick applied to SemDeDup's known blind spot:
   * a dup pair straddling a cluster boundary is invisible to single
   * assignment). Candidate volume grows ≤ nprobe²×; pairs co-resident in
   * several probed clusters are deduplicated before the cosine is
   * computed, and `cluster` reports the smallest shared cluster id.
   *
   * `k` defaults to 0 = [[suggestedK]] (k ≈ √n from the corpus count) —
   * the scale-safe default: a FIXED codebook carried to a bigger corpus
   * makes within-cluster work quadratic in n/k (measured: fixed k=8
   * exceeds 600 s at the 100× fixture where √n-k finishes in 134 s —
   * SCALE.md r17). Pass an explicit k only for small pinned corpora.
   */
  def semanticDuplicates(df: DataFrame, k: Int = 0, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, quantizerMaxRows: Int = 100000,
      nprobe: Int = 1): DataFrame = {
    // persisted across its four consumers (count, dim probe, quantizer
    // sample, assignment): without it each one re-runs the source scan +
    // normalize — one corpus pass instead of four
    val base = normalizedBase(df, idCol, vecCol).persist()
    val (kEff, centers) = fitCodebook(base, k, seed, quantizerMaxRows)
    require(nprobe >= 1 && nprobe <= kEff, "1 <= nprobe <= k")
    val out = pairsWithCodebook(base, centers, threshold, nprobe)
    // pairsWithCodebook materialized the assigned table (localCheckpoint),
    // so nothing downstream re-reads base
    base.unpersist(false)
    out
  }

  /** The normalize projection of [[semanticDuplicates]] — r22: split out so
    * a caller running the operator at several nprobe settings (the rc07
    * certification) shares ONE normalized scan. The explicit cast-to-double
    * transform is gone: NormalizedVector widens FLOAT elements itself,
    * bit-identically, in the same compiled loop (the HOF cast was an
    * interpreted extra pass per row). */
  private[graft] def normalizedBase(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), Similarity.normalized(col(vecCol)).as("v"))

  /** The codebook fit of [[semanticDuplicates]] over a [[normalizedBase]]
    * frame: bounded uniform sample → driver-local deterministic Lloyd,
    * exactly the IVF coarse-quantizer design (clusters live on the unit
    * sphere: SemDeDup clusters the NORMALIZED embeddings). Returns
    * (effective k, centers). r22: split out so the rc07 certification's
    * nprobe=1 and nprobe=2 runs fit the (identical — same input, same seed)
    * codebook ONCE while still exercising the real assignment + join path
    * per run. */
  private[graft] def fitCodebook(base: DataFrame, k: Int, seed: Long,
      quantizerMaxRows: Int): (Int, Array[Array[Double]]) = {
    val feats = base.select("v")
    // n and dim from ONE job (count + head used to cost two driver round
    // trips; this operator's cost at bounded SFs is job count, not bytes)
    val stats = feats.agg(count(lit(1)), first(size(col("v")))).head()
    val n = stats.getLong(0)
    require(n > 0, "SemDeDup needs a non-empty corpus")
    val kEff = if (k > 0) k else suggestedK(n)
    val dim = stats.getInt(1)
    val cap = Similarity.boundedSampleRows(quantizerMaxRows, dim)
    val fitInput =
      if (n <= cap) feats
      else feats.sample(withReplacement = false,
        math.min(1.0, cap * 1.2 / n), seed).limit(cap)
    (kEff, Similarity.localKMeans(
      fitInput.collect().map(_.getSeq[Double](0).toArray), kEff, seed))
  }

  /** The assignment + within-cluster-compare path of [[semanticDuplicates]]
    * given a fitted codebook — THE certified operator surface. r22: the
    * assignment runs through the native codegen'd [[NearestCentroids]]
    * expression (same stable (distance, index) top-nprobe semantics as the
    * scalar UDF it replaces — bit-identical clusters). */
  private[graft] def pairsWithCodebook(base: DataFrame,
      centers: Array[Array[Double]], threshold: Double,
      nprobe: Int): DataFrame = {
    val bc = base.sparkSession.sparkContext.broadcast(centers)
    // materialized once: the assigned table is both sides of the self-join
    // (the dd06 lesson — without it the normalize + assign scan runs twice)
    val assigned = base
      .withColumn("cluster",
        explode(NearestCentroids.ofColumn(col("v"), bc, nprobe)))
      .localCheckpoint()
    val a = assigned.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    val joined = a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
    // single assignment -> pairs are already unique; multi-probe -> collapse
    // the <= nprobe shared-cluster copies BEFORE the cosine is computed
    val cands =
      if (nprobe == 1) joined
      else joined.groupBy(col("id_a"), col("id_b"))
        .agg(min(col("cluster")).as("cluster"),
          first(col("v_a")).as("v_a"), first(col("v_b")).as("v_b"))
    cands
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("cluster"), col("id_a"), col("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /**
   * Keeper election over [[semanticDuplicates]]: every id that appears as
   * the larger side of a duplicate pair is dropped; the per-group minimum
   * id survives (the paper keeps one exemplar per semantic group — min-id
   * is the deterministic choice, matching dd02's canonical election).
   * One semi-join against the bounded pair set.
   *
   * `nprobe` defaults to 2 here (unlike [[semanticDuplicates]]): keeper
   * election is the operator a pipeline actually runs, and single-probe
   * assignment misses dup pairs straddling a cluster boundary (measured
   * recall 0.42 single-probe vs 0.93 at nprobe=2 on the rc07 bench).
   * `k <= 0` applies [[suggestedK]] (k ≈ √n) from the corpus count.
   */
  def semanticKeepers(df: DataFrame, k: Int = 0, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, quantizerMaxRows: Int = 100000,
      nprobe: Int = 2): DataFrame =
    keepersOfPairs(df,
      semanticDuplicates(df, k, threshold, idCol, vecCol, seed,
        quantizerMaxRows, nprobe), idCol)

  /** The election step of [[semanticKeepers]] over an already-computed
    * [[semanticDuplicates]] pair table — THE production code path (the
    * keeper operator is exactly this composition), exposed so a caller
    * holding a persisted pair table (the rc07 certification, a pipeline
    * that reports pairs AND keeps survivors) doesn't re-run the
    * normalize + quantize + join pipeline a second time. */
  def keepersOfPairs(df: DataFrame, pairs: DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    val dups = pairs.select(col("id_b").as("__drop")).distinct()
    df.join(dups, col(idCol) === col("__drop"), "left_anti")
  }
}
