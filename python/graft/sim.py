"""Similarity search over embedding columns (Array[Float])."""

from ._java import ctx, lift


def brute_force_top_k(corpus, queries, k, id_col="vec_id",
                      vec_col="embedding"):
    """Exact cosine top-k: the correctness baseline."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.sim.Similarity.bruteForceTopK(
        corpus._jdf, queries._jdf, int(k), id_col, vec_col))


def lsh_top_k(corpus, queries, k, planes=12, probe_bits=2, id_col="vec_id",
              vec_col="embedding"):
    """Hyperplane-LSH bucketed top-k with multi-probe."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.sim.Similarity.lshTopK(
        corpus._jdf, queries._jdf, int(k), int(planes), int(probe_bits),
        id_col, vec_col))


def ivf_top_k(corpus, queries, k, nlist=0, nprobe=4, id_col="vec_id",
              vec_col="embedding", seed=42, quantizer_max_rows=100000):
    """IVF top-k: coarse k-means cells, probe the n nearest.
    ``nlist <= 0`` auto-scales the cell count ~ sqrt(corpus)."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.sim.Similarity.ivfTopK(
        corpus._jdf, queries._jdf, int(k), int(nlist), int(nprobe), id_col,
        vec_col, int(seed), int(quantizer_max_rows)))


def centroids(df, group_col="label", vec_col="embedding"):
    """Per-group embedding centroid in long (group, pos, centroid) form."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.centroids(
        df._jdf, group_col, vec_col))


def quantize_8bit(df, id_col="vec_id", vec_col="embedding"):
    """8-bit scalar quantization per vector + reconstruction MSE."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.quantize8bit(
        df._jdf, id_col, vec_col))


def pq_top_k(corpus, queries, k, m=8, codebook_size=16, rerank=50,
             id_col="vec_id", vec_col="embedding", seed=42,
             train_max_rows=100000):
    """Product-quantization ANN: ADC scan over codes + exact re-rank."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.sim.Similarity.pqTopK(
        corpus._jdf, queries._jdf, int(k), int(m), int(codebook_size),
        int(rerank), id_col, vec_col, int(seed), int(train_max_rows)))


def pca_project(df, k, id_col="vec_id", vec_col="embedding"):
    """Project embeddings onto the top-k principal components (properly
    mean-centered; Gramian aggregation is O(dim^2), constant in corpus)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.pcaProject(
        df._jdf, int(k), id_col, vec_col))


def inertia(df, group_col="label", vec_col="embedding", id_col="vec_id"):
    """Per-group mean squared distance to the group centroid."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.inertia(
        df._jdf, group_col, vec_col, id_col))


def centroid_similarity(df, group_col="label", vec_col="embedding"):
    """Pairwise cosine similarity between group centroids (upper triangle)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.centroidSimilarity(
        df._jdf, group_col, vec_col))


def silhouette(df, group_col="label", vec_col="embedding", id_col="vec_id"):
    """Centroid-based simplified silhouette per group: O(n*k) point x
    centroid distances, never point x point."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.silhouette(
        df._jdf, group_col, vec_col, id_col))


def dim_stats(df, vec_col="embedding"):
    """Per-dimension mean/var/min/max — embedding collapse detector."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.sim.Embeddings.dimStats(df._jdf, vec_col))


def semantic_duplicates(df, k=0, threshold=0.95, id_col="vec_id",
                        vec_col="embedding", nprobe=1):
    """SemDeDup (Abbas et al. 2023): k-means cluster the normalized
    embeddings, exact pairwise cosine within clusters only — meaning-level
    duplicate pairs at cluster-bounded cost. ``nprobe`` > 1 assigns each
    vector to its nprobe nearest centroids (multi-probe — catches dup
    pairs straddling a cluster boundary). ``k <= 0`` auto-scales k ~ sqrt(n)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.semanticDuplicates(
        df._jdf, int(k), float(threshold), id_col, vec_col, int(nprobe)))


def semantic_keepers(df, k=0, threshold=0.95, id_col="vec_id",
                     vec_col="embedding", nprobe=2):
    """SemDeDup keeper election: drop every larger-id side of a semantic
    duplicate pair; the per-group min id survives. Defaults to nprobe=2
    (multi-probe assignment — single-probe misses boundary-pair dups:
    measured recall 0.42 vs 0.93). ``k <= 0`` auto-scales k ~ sqrt(n)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.semanticKeepers(
        df._jdf, int(k), float(threshold), id_col, vec_col, int(nprobe)))


def semdedup_suggested_k(df_or_spark, n):
    """Corpus-scaled SemDeDup cluster count: max(16, ceil(sqrt(n)))."""
    spark, jvm = ctx(df_or_spark)
    return int(jvm.graft.api.java.JavaPipelineOps.semdedupSuggestedK(int(n)))


def k_center_sample(df, k, id_col="vec_id", vec_col="embedding"):
    """Greedy k-center (farthest-first) diversity sample: (rank, id,
    radius) with non-increasing radii — the coreset selection primitive."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.kCenterSample(
        df._jdf, int(k), id_col, vec_col))


def hard_negatives(corpus, queries, k, id_col="vec_id", vec_col="embedding",
                   label_col="label"):
    """Contrastive hard negatives: per query the k most similar corpus
    vectors with a DIFFERENT label (broadcast-queries x corpus, exact)."""
    spark, jvm = ctx(corpus)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.hardNegatives(
        corpus._jdf, queries._jdf, int(k), id_col, vec_col, label_col))
