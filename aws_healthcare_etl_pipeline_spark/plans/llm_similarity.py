"""Similarity-search queries over the embeddings fixture (SURVEY.md §2.8).

Brute-force cosine top-k carries a DuckDB oracle: both engines compute
dot/norm as a sequential left-to-right double fold over the same float
values, so the scores are bit-identical. The LSH variant is the
approximate scale path (rows-only check; pytest measures recall vs the
brute-force truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm
from ..operators.similarity import brute_force_top_k, lsh_top_k
from ..sources.tables import load_table
from .registry import query

N_QUERIES = 10
TOP_K = 5


@query(
    "sim_bruteforce_topk",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        ), scored AS (
            SELECT query_id, vec_id,
                   list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                       AS cosine
            FROM q, c
            WHERE vec_id <> query_id
        )
        SELECT query_id, vec_id, cosine, rank
        FROM (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id
                   ) AS rank
            FROM scored
        ) t
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    description="Exact brute-force cosine top-5 for the first 10 vectors: "
    "broadcast queries x corpus scan, JVM-side zip_with/aggregate math.",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return brute_force_top_k(emb, queries_df, k=TOP_K).orderBy("query_id", "rank")


@query(
    "sim_lsh_ann_topk",
    description="Approximate top-5 via 16-bit sign-LSH signatures with "
    "multi-probe (hamming <= 2); exact cosine on candidates only.",
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return lsh_top_k(emb, queries_df, k=TOP_K, dim=64).orderBy("query_id", "rank")


@query(
    "dedup_embedding_cosine_pairs",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
                   AS cosine
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.e, b.e)
              / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
              >= 0.3
        ORDER BY id_a, id_b
    """,
    description="Embedding-cosine near-duplicate pairs (all-pairs exact at "
    "test scale; the documented scale path swaps in LSH candidates first).",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a")).withColumn(
        "n_a", l2_norm(F.col("e_a"))
    )
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b")).withColumn(
        "n_b", l2_norm(F.col("e_b"))
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= 0.3)
        .orderBy("id_a", "id_b")
    )


@query(
    "emb_norm_stats_by_label",
    oracle="""
        WITH n AS (
            SELECT label,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS norm
            FROM embeddings
        )
        SELECT label, COUNT(*) AS n_vectors,
               MIN(norm) AS min_norm, MAX(norm) AS max_norm,
               CAST(SUM(CAST(round(norm, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                   AS avg_norm
        FROM n
        GROUP BY label
        ORDER BY label
    """,
    description="Vector-norm stats per label (exact min/max; avg over "
    "6-dp-rounded norms so the sum is order-insensitive).",
)
def emb_norm_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm = l2_norm(F.col("embedding"))
    return (
        emb.withColumn("norm", norm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            (
                F.sum(F.round("norm", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_norm"),
        )
        .orderBy("label")
    )


@query(
    "sim_ivf_ann_topk",
    description="IVF approximate top-5: deterministic k-means index "
    "(DataFrame Lloyd iterations), nprobe-nearest-centroid search, exact "
    "cosine within probed clusters only.",
)
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_top_k, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # k=8/2 iterations hits the same recall as k=16/3 on this corpus at
    # a third of the train+search cost (Lloyd converges fast on
    # near-orthogonal data); at real scale k grows with corpus size.
    centroids = train_ivf_centroids(emb, k=8, iterations=2)
    return ivf_top_k(emb, queries_df, k=TOP_K, centroids=centroids, nprobe=2).orderBy(
        "query_id", "rank"
    )
