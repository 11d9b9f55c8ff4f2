"""Wave-34: corpus datasheet + diversity index — the two summary
artifacts a dataset release ships (the "data card" numbers and a
concentration measure), both in pure rational arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, token_count, tokens
from ..sources.tables import load_table
from .registry import query


@query(
    "pipeline_corpus_card",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang, source,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS nt,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fp
            FROM documents
        ), r AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY nt, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM base
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(nt) AS BIGINT) AS total_tokens,
               CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
               COUNT(*) - COUNT(DISTINCT fp) AS n_dup_docs,
               CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS dup_frac,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN nt END) AS p50_tokens,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN nt END) AS p90_tokens
        FROM r
        GROUP BY lang
        ORDER BY lang
    """,
    description="Per-language corpus datasheet (the 'data card' table "
    "a dataset release publishes): doc/source counts, token totals "
    "and mean, exact-duplicate count and fraction (via md5 "
    "fingerprints), and p50/p90 token lengths by the explicit-rank "
    "convention (row_number against ceil(q*n) — discrete values, no "
    "interpolation, engine-identical). One pass computes "
    "fingerprints and lengths; the rank windows partition by lang "
    "and spill externally per partition (the sanctioned entity-grain "
    "rank pattern — same as gini/weighted-median), and everything "
    "else is partial-aggregated. All ratios divide exact integers "
    "once.",
)
def pipeline_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).alias("nt"),
        fingerprint_md5(F.col("text")).alias("fp"),
    )
    w_rank = Window.partitionBy("lang").orderBy("nt", "doc_id")
    w_all = Window.partitionBy("lang")
    r = base.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_all)
    )
    n_docs = F.count(F.lit(1))
    n_dup = n_docs - F.countDistinct("fp")
    return (
        r.groupBy("lang")
        .agg(
            n_docs.alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            (
                F.sum("nt").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_tokens"),
            n_dup.alias("n_dup_docs"),
            (n_dup.cast("double") / n_docs.cast("double")).alias("dup_frac"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")), F.col("nt")
                )
            ).alias("p50_tokens"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")), F.col("nt")
                )
            ).alias("p90_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "token_simpson_diversity_by_lang",
    oracle="""
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents
        ), freq AS (
            SELECT lang, token, COUNT(*) AS c
            FROM tok GROUP BY lang, token
        )
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS distinct_tokens,
               1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)
                     / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE)
                   AS gini_simpson,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                   AS top_token_share
        FROM freq
        GROUP BY lang
        ORDER BY lang
    """,
    description="Gini-Simpson token diversity per language: 1 - "
    "sum(c*(c-1)) / (N*(N-1)) — the probability two tokens drawn "
    "without replacement differ. The log-free concentration measure "
    "(Shannon entropy needs ln, which is not engine-portable — "
    "SCALE.md's no-libm rule); complements type-token ratio "
    "(token_diversity_by_lang) with a frequency-weighted index that "
    "heavy-hitter skew actually moves, plus the top-token share. "
    "Two partial-agg shuffles ((lang, token) then lang); all "
    "arithmetic is exact integers below 2^53 with two final "
    "divisions.",
)
def token_simpson_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        freq.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            (
                F.lit(1.0)
                - F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
                / (F.sum("c") * (F.sum("c") - F.lit(1))).cast("double")
            ).alias("gini_simpson"),
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                "top_token_share"
            ),
        )
        .orderBy("lang")
    )
