"""IVF (inverted-file) approximate nearest neighbors: the second scale
path for similarity search, complementing sign-LSH.

Index build = deterministic Lloyd's k-means over the corpus expressed
as DataFrame ops (assignment is a broadcast cross-join + windowed
argmin; update is a per-cluster mean — only k x dim floats ever reach
the driver). Query = probe the ``nprobe`` nearest centroids, exact
cosine only within probed clusters.

Scale shape: corpus assignment is one narrow pass per iteration (+ a
k-row aggregate); at search time each query touches ~nprobe/k of the
corpus. Centroids live as literal arrays in the plan (built as single
F.expr strings — see the py4j note in similarity.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm


def _centroid_literal(vec: np.ndarray) -> Column:
    return F.expr("array(" + ",".join(f"{float(x)!r}D" for x in vec) + ")")


def _nearest_centroid(vec_col: str, centroids: np.ndarray) -> Column:
    """Index of the max-cosine centroid (centroids are unit-normalized,
    so cosine order == dot order). One SQL expression per centroid;
    argmax via greatest + chained CASE keeps it a single projection."""
    dots = [dot(F.col(vec_col), _centroid_literal(c)) for c in centroids]
    best = F.greatest(*dots) if len(dots) > 1 else dots[0]
    out = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):
        out = F.when(dots[i] >= best, F.lit(i)).otherwise(out)
    return out


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 3,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic Lloyd's k-means; returns unit-normalized centroids
    (k x dim). Init: a seeded sample of corpus vectors (IDs sorted for
    run-to-run stability)."""
    sample = (
        corpus.select(vec_col)
        .limit(4096)  # bounded driver transfer for init
        .toPandas()[vec_col]
    )
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    rng = np.random.default_rng(seed)
    centroids = vecs[rng.choice(len(vecs), size=k, replace=False)]
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    for _ in range(iterations):
        assigned = corpus.select(
            _nearest_centroid(vec_col, centroids).alias("cluster"),
            F.col(vec_col).alias("v"),
        )
        # per-cluster mean: k x dim numbers to the driver, nothing more
        sums = (
            assigned.select(
                "cluster",
                *[
                    F.element_at(F.col("v"), i + 1).cast("double").alias(f"d{i}")
                    for i in range(centroids.shape[1])
                ],
            )
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"d{i}").alias(f"s{i}") for i in range(centroids.shape[1])],
            )
            .collect()
        )
        new = centroids.copy()
        for row in sums:
            mean = np.array([row[f"s{i}"] for i in range(centroids.shape[1])]) / row["n"]
            norm = np.linalg.norm(mean)
            if norm > 0:
                new[row["cluster"]] = mean / norm
        centroids = new
    return centroids


def ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k cosine: score only corpus vectors whose
    cluster is among each query's ``nprobe`` nearest centroids."""
    n_centroids = len(centroids)
    c = corpus.select(corpus_id, corpus_vec).withColumn(
        "cluster", _nearest_centroid(corpus_vec, centroids)
    ).withColumn("c_norm", l2_norm(F.col(corpus_vec)))

    cdots = [dot(F.col(query_vec), _centroid_literal(cn)) for cn in centroids]
    scored_centroids = F.array(
        *[
            F.struct(cdots[i].alias("score"), F.lit(i).alias("idx"))
            for i in range(n_centroids)
        ]
    )
    probe_list = F.transform(
        F.slice(F.reverse(F.array_sort(scored_centroids)), 1, nprobe),
        lambda s: s["idx"],
    )
    q = F.broadcast(
        queries.select(query_id, query_vec)
        .withColumn("q_norm", l2_norm(F.col(query_vec)))
        .withColumn("probes", probe_list)
        .withColumn("cluster", F.explode("probes"))
        .drop("probes")
    )

    scored = (
        c.join(q, "cluster")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            (
                dot(F.col(query_vec), F.col(corpus_vec))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
