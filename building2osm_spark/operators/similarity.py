"""Approximate-nearest-neighbour search over embedding columns.

Engine-native additions for training-data pipelines (task brief): a
brute-force cosine top-k baseline and an IVF (inverted-file) variant as
the scale path. Vector math is expressed with higher-order functions
(zip_with/aggregate) so it runs JVM-side; the IVF coarse quantizer is a
tiny k-means trained on a driver-side sample (the classic IVF recipe:
centroids are a model artifact, assignment + search are DataFrame joins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus scan + window.
    (q_id, c_id, cosine, rank). Deterministic ties by corpus id."""
    q = queries.select(
        F.col(query_id), F.col(query_vec), _norm(F.col(query_vec)).alias("__qn")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(corpus_vec), _norm(F.col(corpus_vec)).alias("__cn")
    )
    scored = (
        F.broadcast(q)
        .join(c)
        .withColumn(
            "cosine", _dot(F.col(query_vec), F.col(corpus_vec)) / (F.col("__qn") * F.col("__cn"))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 3,
) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side sample → (≤ n_centroids, dim).
    The model is small by construction; training cost is independent of
    corpus size. The sample is widened to ≥ 2·n_centroids so large
    centroid counts (IVF at real corpus sizes) always train.

    The sample is a Bernoulli sample across ALL partitions — a limit()
    would read only the first file(s), and embedding tables are routinely
    written sorted/clustered by class or locality, so first-partition
    centroids would all train on one region (extreme list skew, collapsed
    recall). Costs one count() at index-build time. A corpus smaller than
    n_centroids returns one centroid per row (fewer lists, still valid)."""
    sample = max(sample, 2 * n_centroids)
    n_corpus = corpus.count()
    vecs = corpus.select(vec_col)
    if n_corpus > sample:
        # oversample 2x so the post-sample limit() almost surely has
        # `sample` rows to draw from, then trim
        vecs = vecs.sample(False, min(1.0, 2.0 * sample / n_corpus), seed).limit(sample)
    rows = vecs.collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    n_centroids = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cent[j] = c / np.linalg.norm(c)
    return cent


# above this many centroids, the literal-expression scorer is replaced by a
# broadcast numpy kernel: a Catalyst tree with n_centroids × dim literals
# stops being viable (py4j build cost + ~10 s of analysis/codegen PER
# DATAFRAME at 256×64 literals — measured; the plan cache can't help a
# freshly-built tree), while one BLAS matmul per Arrow batch is near-free
_LITERAL_CENTROID_MAX = 64


def _centroid_assign_col(vec, centroids: np.ndarray, nprobe: int):
    """Array of the nprobe nearest centroid ids (by dot product).

    ≤ _LITERAL_CENTROID_MAX centroids: native sort over a literal-array of
    centroid scores (whole-stage codegen, zero Python). Above that: an
    Arrow pandas UDF closing over the centroid matrix (shipped once per
    executor like a broadcast variable); each batch scores via one
    (batch × dim) @ (dim × n_centroids) BLAS matmul + argpartition —
    exactly the regime where a vectorized kernel beats expression trees.
    """
    if len(centroids) <= _LITERAL_CENTROID_MAX:
        scores = F.array(
            *[
                F.struct(
                    _dot(vec, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(centroids)
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)
        return F.transform(top, lambda t: t["cid"])

    cent_t = np.ascontiguousarray(centroids.T)  # (dim, n_centroids)
    n_probe = min(nprobe, len(centroids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign_udf(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        scores = X @ cent_t  # (batch, n_centroids)
        # nprobe nearest by score; exact-tie order is cid ascending here
        # vs descending in the literal path — indistinguishable in
        # practice (exact float dot-product ties across distinct random
        # centroids), and the two paths never mix within one index
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return assign_udf(vec)


def ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    *,
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
) -> DataFrame:
    """One-time IVF index build: assign every corpus row to its nearest
    centroid list and precompute its norm. This is the expensive pass
    (n_corpus × n_centroids × dim multiplies) — build it ONCE, write it
    out (ideally partitioned/bucketed by __list), and serve probes from
    it; folding it into every probe makes IVF slower than brute force
    (measured 98 s vs 10 s at 500k × 256 lists)."""
    return corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        _norm(F.col(corpus_vec)).alias("__cn"),
        _centroid_assign_col(F.col(corpus_vec), centroids, 1)[0].alias("__list"),
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    centroids: np.ndarray | None = None,
    n_centroids: int = 16,
    nprobe: int = 4,
    indexed: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    list; queries probe their nprobe closest lists; exact cosine + window
    within the probed union. Recall depends on cluster structure:
    ≥0.85 at nprobe=8/16 even on structureless random vectors (the worst
    case; tested), much higher on clustered corpora (1.0 measured at 500k
    clustered vectors, 256 lists, nprobe=8).

    Pass `indexed` (an ivf_index() result, possibly read back from
    storage) to serve probes from a prebuilt index; otherwise the index
    pass runs inline (fine for one-shot jobs, wasteful for repeated
    probing)."""
    if indexed is not None:
        c = indexed
    else:
        if centroids is None:
            centroids = train_ivf_centroids(
                corpus.select(F.col(corpus_vec).alias("embedding")), n_centroids
            )
        c = ivf_index(corpus, centroids, corpus_id=corpus_id, corpus_vec=corpus_vec)
    if centroids is None:
        raise ValueError("indexed probing requires the matching centroids")
    q = queries.select(
        F.col(query_id),
        F.col(query_vec),
        _norm(F.col(query_vec)).alias("__qn"),
        F.explode(
            _centroid_assign_col(F.col(query_vec), centroids, nprobe)
        ).alias("__list"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "__list")
        .withColumn(
            "cosine", _dot(F.col(query_vec), F.col(corpus_vec)) / (F.col("__qn") * F.col("__cn"))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_seeds: int = 8,
    threshold: float = 0.99,
    seeds: np.ndarray | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): bucket
    every embedding by its nearest seed/centroid (cosine), find
    within-bucket pairs with cosine >= threshold, connect them into dup
    groups, keep ONE survivor per group (lowest id).

    `seeds` is a (k, dim) matrix; when None, the k lowest-id vectors are
    collected as seeds (deterministic, reproducible). Assignment reuses
    the IVF scorer: map-only literal expressions for small k, one BLAS
    matmul per Arrow batch above _LITERAL_CENTROID_MAX — either way the
    corpus never shuffles for assignment. The pair search is an exact
    self-join keyed on the bucket (AQE can skew-split a hot bucket); for
    planet-scale buckets compose with embedding_near_dup INSIDE each
    bucket instead of the exact join.

    Returns the survivors: (id_col, sem_cluster, dup_size) where
    sem_cluster is the seed index and dup_size the size of the dup group
    the survivor represents (1 = no near-duplicate found).
    """
    from .dedupe import pair_components

    if seeds is None:
        rows = (
            df.select(id_col, vec_col).orderBy(id_col).limit(n_seeds).collect()
        )
        seeds = np.asarray([r[1] for r in rows], dtype=np.float64)
    seeds = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)

    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("__n"),
        _centroid_assign_col(F.col(vec_col), seeds, 1)[0].alias("sem_cluster"),
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
        "sem_cluster",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
        "sem_cluster",
    )
    pairs = (
        a.join(b, "sem_cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")))
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b")
    )
    comp = pair_components(pairs, max_iter=max_iter)
    clustered = (
        assigned.select(id_col, "sem_cluster")
        .join(comp, F.col(id_col) == F.col("node"), "left")
        .drop("node")
        .withColumn("__grp", F.coalesce(F.col("cluster"), F.col(id_col)))
        .drop("cluster")
    )
    w = Window.partitionBy("__grp")
    return (
        clustered.withColumn("__rn", F.row_number().over(w.orderBy(F.col(id_col).asc())))
        .withColumn("dup_size", F.count("*").over(w).cast("long"))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__grp")
    )
