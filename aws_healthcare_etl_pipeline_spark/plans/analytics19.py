"""Wave-30: entity-grain running total via the two-level decomposition
(operators/cumsum.py) — the scale-safe replacement for the global
ordered window, proven equal to the textbook form by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..operators.dedup import ngram_jaccard_pairs, simhash_near_duplicates
from ..sources.tables import load_table
from .llm_dedup import (
    SQL_CORPUS_SHINGLES,
    SQL_SIMHASH_SIG,
    _sql_jaccard_pairs,
    perturbed_corpus,
)
from .registry import dec, query


@query(
    "orders_running_total_distributed",
    oracle="""
        SELECT o_orderkey,
               o_orderdate::TIMESTAMP AS o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue
        FROM orders
        ORDER BY o_orderdate, o_orderkey
    """,
    description="Global running revenue over EVERY order row (the "
    "order grain — 150k rows at sf0.1, 1.5B at sf1000) computed "
    "WITHOUT a global-window sort: month-bucket partial sums -> "
    "exclusive prefix over the ~80-row month spine -> "
    "month-partitioned within-bucket running windows -> broadcast "
    "carry-in add (operators/cumsum.py). The oracle is the textbook "
    "single-window form, so the hash match PROVES the decomposition "
    "equals it bit-for-bit (exact decimal partials are associative; "
    "(o_orderdate, o_orderkey) makes the order total). The only "
    "unpartitioned window in the plan runs on the month-grain "
    "aggregate — pinned by tests/test_plans.py — which is the "
    "difference between one task sorting 1.5B rows and 80-way "
    "parallel per-month sorts at 100 TB.",
)
def orders_running_total_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        dec("o_totalprice").alias("_v"),
        F.date_trunc("month", "o_orderdate").alias("_month"),
    )
    out = distributed_running_total(
        orders,
        value=F.col("_v"),
        bucket_col="_month",
        order_cols=["o_orderdate", "o_orderkey"],
        out_col="_running",
    )
    return out.select(
        "o_orderkey",
        "o_orderdate",
        F.col("_running").cast("double").alias("running_revenue"),
    ).orderBy("o_orderdate", "o_orderkey")


AGREE_J = 0.8  # exact-Jaccard ground-truth threshold
AGREE_HAMMING = 3  # simhash radius (exact by pigeonhole at <= 3)


@query(
    "dedup_method_agreement",
    oracle=f"""
        WITH {SQL_CORPUS_SHINGLES},
        {SQL_SIMHASH_SIG},
        truth AS (
            SELECT id_a, id_b FROM ({_sql_jaccard_pairs(AGREE_J, lang_blocked=False)})
        ), pred AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {AGREE_HAMMING}
        ), joined AS (
            SELECT CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_t,
                   CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_p
            FROM truth t FULL JOIN pred p
              ON t.id_a = p.id_a AND t.id_b = p.id_b
        )
        SELECT CAST(SUM(is_t) AS BIGINT) AS n_truth,
               CAST(SUM(is_p) AS BIGINT) AS n_pred,
               CAST(SUM(is_t * is_p) AS BIGINT) AS tp,
               CAST(SUM(is_p * (1 - is_t)) AS BIGINT) AS fp,
               CAST(SUM(is_t * (1 - is_p)) AS BIGINT) AS fn,
               CAST(SUM(is_t * is_p) AS DOUBLE)
                   / CAST(GREATEST(SUM(is_p), 1) AS DOUBLE) AS precision_,
               CAST(SUM(is_t * is_p) AS DOUBLE)
                   / CAST(GREATEST(SUM(is_t), 1) AS DOUBLE) AS recall_
        FROM joined
    """,
    description="Dedup-method evaluation harness: the SimHash pair "
    f"set (60-bit portable signatures, hamming <= {AGREE_HAMMING} — "
    "exact under 4-band pigeonhole blocking) scored against exact "
    f"3-gram Jaccard >= {AGREE_J} ground truth (PPJoin prefix filter, "
    "provably complete), as tp/fp/fn + precision/recall. This is the "
    "measurement a pipeline owner runs before choosing the cheap "
    "8-byte-signature method over the exact one at 100 TB — both "
    "sides are the scale-safe banded/prefix plans (no all-pairs "
    "anywhere in Spark; the all-pairs SQL lives only in the oracle "
    "as ground truth). Metrics divide exact integers once; the "
    "output is a single row.",
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = perturbed_corpus(spark, sf_dir)
    truth = ngram_jaccard_pairs(
        corpus, "text", "doc_id", block_cols=[], threshold=AGREE_J
    ).select("id_a", "id_b", F.lit(1).alias("is_t"))
    pred = simhash_near_duplicates(
        corpus, "text", "doc_id", max_hamming=AGREE_HAMMING, portable=True
    ).select("id_a", "id_b", F.lit(1).alias("is_p"))
    joined = truth.join(pred, ["id_a", "id_b"], "full").select(
        F.coalesce("is_t", F.lit(0)).alias("is_t"),
        F.coalesce("is_p", F.lit(0)).alias("is_p"),
    )
    return joined.agg(
        F.sum("is_t").cast("bigint").alias("n_truth"),
        F.sum("is_p").cast("bigint").alias("n_pred"),
        F.sum(F.col("is_t") * F.col("is_p")).cast("bigint").alias("tp"),
        F.sum(F.col("is_p") * (1 - F.col("is_t"))).cast("bigint").alias("fp"),
        F.sum(F.col("is_t") * (1 - F.col("is_p"))).cast("bigint").alias("fn"),
        (
            F.sum(F.col("is_t") * F.col("is_p")).cast("double")
            / F.greatest(F.sum("is_p"), F.lit(1)).cast("double")
        ).alias("precision_"),
        (
            F.sum(F.col("is_t") * F.col("is_p")).cast("double")
            / F.greatest(F.sum("is_t"), F.lit(1)).cast("double")
        ).alias("recall_"),
    )
