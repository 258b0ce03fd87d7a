"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
(small) query set against the corpus with a JVM-side dot product
(zip_with + aggregate — no Python in the loop). The scale path is LSH
bucketing by random-hyperplane signs: corpus and queries hash to bucket keys,
candidates meet in an equi-join on the bucket, exact rerank inside the bucket.
An embedding-cosine near-dup pass reuses the same machinery corpus×corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query by cosine: broadcast the query set,
    score JVM-side, window-rank per query. Returns (query_id, neighbor_id,
    cosine, rank)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id: bit i = sign(v · plane_i).
    Planes are literals compiled into the plan (broadcast-free)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return df.withColumn("bucket", bucket)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, exact cosine rerank
    within. Recall grows with fewer planes / multiple tables; this single-table
    variant is the scale skeleton (bucket equi-join instead of cross join)."""
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        dim,
        n_planes,
        seed,
        "cvec",
    )
    q = lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        dim,
        n_planes,
        seed,
        "qvec",
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _kmeans_numpy(x: np.ndarray, k: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Tiny deterministic k-means for IVF centroid training (numpy only)."""
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(x.shape[0], size=min(k, x.shape[0]), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(centroids.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 3,
    train_sample: int = 2048,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: train coarse centroids on a driver-side sample,
    assign every corpus vector to its nearest list (JVM-side argmin over
    centroid literals), probe the ``n_probe`` nearest lists per query, exact
    cosine rerank inside. The probe join is an equi-join on list id — the
    classic inverted-file shape that avoids the cross join at scale."""
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).limit(train_sample).collect()],
        dtype=np.float64,
    )
    centroids = _kmeans_numpy(sample, n_lists, seed=seed)

    def nearest_lists(vec, n):
        """Column expr: array of the n nearest list ids to ``vec``."""
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(c)) for c in centroid]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias(f"d{i}")
                for i, centroid in enumerate(centroids)
            ]
        )
        idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        pairs = F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
        return F.slice(F.transform(F.array_sort(pairs), lambda p: p["i"]), 1, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        nearest_lists(F.col(vec_col), 1)[0].alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(nearest_lists(F.col(vec_col), n_probe)).alias("list_id"),
    )
    scored = (
        c.join(q, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(
    corpus: DataFrame,
    min_cosine: float = 0.95,
    dim: int | None = None,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked corpus×corpus."""
    assert dim is not None, "pass the embedding dimension"
    b = lsh_bucket(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")),
        dim,
        n_planes,
        seed=7,
        vec_col="vec",
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "cosine",
            _dot(F.col("a.vec"), F.col("b.vec"))
            / (_norm(F.col("a.vec")) * _norm(F.col("b.vec"))),
        )
        .filter(F.col("cosine") >= min_cosine)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "cosine",
        )
        .distinct()
    )
