"""Similarity search over embedding columns (SURVEY.md §2.8).

Two tiers:
  - ``brute_force_top_k``: exact cosine top-k. Query set is broadcast
    (it's the small side by construction); the corpus is scanned once,
    fully JVM-side via zip_with/aggregate — a single narrow pass, no
    shuffle of the corpus, then a windowed top-k on (query, score).
    At 100 TB this is the gold standard the ANN tier is measured
    against: linear in corpus size, embarrassingly parallel.
  - ``lsh_top_k``: random-hyperplane (sign) LSH. A 16-bit signature
    buckets the corpus; candidates = corpus rows whose signature is
    within ``probe_hamming`` of the query signature (multi-probe), so
    the scan touches only matching buckets. Recall < 1 by design; the
    signature join shuffles only (bucket, id) pairs.

Hyperplanes are generated with a fixed-seed NumPy RNG and embedded as
literal arrays in the plan — deterministic across runs and engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot, l2_norm


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, vec_id, cosine) with rank<=k per query;
    deterministic tiebreak on (cosine desc, vec_id asc).
    """
    q = F.broadcast(queries.select(query_id, query_vec))
    pairs = corpus.select(corpus_id, corpus_vec).crossJoin(q)
    if not include_self:
        pairs = pairs.filter(F.col(corpus_id) != F.col(query_id))
    scored = pairs.select(
        query_id,
        corpus_id,
        cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def _signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH signature: bit p = 1 iff dot(vec, plane_p) > 0."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, lit_plane)
        bits.append(F.when(d > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    bits: int = 16,
    probe_hamming: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via sign-LSH bucketing + multi-probe.

    Candidates = corpus vectors whose signature differs from the query
    signature in <= probe_hamming bits; exact cosine is computed only
    on candidates. Same output schema as brute_force_top_k (may miss
    true neighbors — that's the approximation contract).
    """
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.select(corpus_id, corpus_vec, _signature(F.col(corpus_vec), planes).alias("c_sig"))
    q = F.broadcast(
        queries.select(query_id, query_vec, _signature(F.col(query_vec), planes).alias("q_sig"))
    )
    cand = c.join(
        q,
        F.bit_count(F.col("c_sig").bitwiseXOR(F.col("q_sig"))) <= probe_hamming,
    ).filter(F.col(corpus_id) != F.col(query_id))
    scored = cand.select(
        query_id,
        corpus_id,
        cosine_similarity(F.col(query_vec), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
