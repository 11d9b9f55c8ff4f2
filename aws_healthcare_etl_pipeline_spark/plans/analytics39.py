"""Wave-65 (round 5): multilingual encoding audit + survey sampling.

* ``text_encoding_byte_audit`` — UTF-8 byte-economics per language:
  characters vs encoded bytes, bytes-per-1000-chars, and the ASCII-
  only document share. The capacity-planning number for a
  multilingual corpus (CJK text costs ~3x the bytes per character,
  which moves storage, shuffle, AND tokenizer fertility budgets).
* ``sampling_neyman_allocation`` — Neyman-style stratified sample
  allocation: a fixed audit budget is split across strata
  proportionally to N_h * spread_h (spread = cent range, the
  integer-exact dispersion proxy), with the largest-remainder rule
  so the allocation sums EXACTLY to the budget — the survey-
  statistics operator behind every stratified data-quality audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ encoding byte audit


@query(
    "text_encoding_byte_audit",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
               CAST((SUM(strlen(text)) * 1000) // SUM(length(text))
                    AS BIGINT) AS bytes_per_kchar,
               CAST(SUM(CASE WHEN length(text) = strlen(text)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS ascii_only_docs
        FROM documents GROUP BY lang ORDER BY lang
    """,
    description="UTF-8 byte-economics audit per language: character "
    "count vs encoded byte count, bytes-per-1000-chars (integer "
    "division), and the count of pure-ASCII documents (chars == "
    "bytes) — the capacity-planning numbers for a multilingual "
    "corpus, since CJK text costs ~3x the bytes per character and "
    "that ratio drives storage, shuffle volume, and BPE fertility "
    "budgets. At 100 TB this is a single map-side projection "
    "(length/octet_length are O(len) streaming over each value) and "
    "one partial-agg shuffle on language — no second pass, no "
    "windows.",
)
def text_encoding_byte_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
            F.expr(
                "(sum(octet_length(text)) * 1000) div sum(length(text))"
            )
            .cast("long")
            .alias("bytes_per_kchar"),
            F.sum(
                F.when(
                    F.length("text") == F.octet_length("text"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("ascii_only_docs"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------ Neyman allocation

_NEYMAN_BUDGET = 1000  # total audit sample size to allocate


@query(
    "sampling_neyman_allocation",
    oracle=f"""
        WITH strata AS (
            SELECT c_mktsegment AS stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_h,
                   CAST(MAX(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                                 AS BIGINT))
                        - MIN(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                                   AS BIGINT)) AS BIGINT) AS spread_h
            FROM customer GROUP BY 1
        ), weighted AS (
            SELECT stratum, n_h, spread_h,
                   n_h * spread_h AS w,
                   SUM(n_h * spread_h) OVER () AS wtot
            FROM strata
        ), alloc AS (
            SELECT stratum, n_h, spread_h,
                   ({_NEYMAN_BUDGET} * w) // wtot AS base,
                   ({_NEYMAN_BUDGET} * w) % wtot AS frac,
                   {_NEYMAN_BUDGET}
                       - SUM(({_NEYMAN_BUDGET} * w) // wtot) OVER () AS rem
            FROM weighted
        )
        SELECT stratum, n_h, spread_h,
               CAST(base + CASE WHEN ROW_NUMBER() OVER (
                        ORDER BY frac DESC, stratum) <= rem
                    THEN 1 ELSE 0 END AS BIGINT) AS allocated_n
        FROM alloc ORDER BY stratum
    """,
    description="Neyman-style stratified allocation of a fixed audit "
    "budget across market segments, proportional to N_h * spread_h "
    "(spread = exact cent range, the integer dispersion proxy that "
    "keeps the optimal-allocation intuition without irrational "
    "standard deviations), with the largest-remainder rule (frac "
    "DESC, stratum ASC) so allocations sum EXACTLY to the budget — "
    "the survey-statistics step in front of every stratified quality "
    "audit. At 100 TB: one partial-agg shuffle computes per-stratum "
    "count and min/max; everything after runs on the handful of "
    "stratum rows (the bounded-spine exception), and the resulting "
    "quotas drive downstream hash-bucket sampling without a second "
    "full scan.",
)
def sampling_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("stratum"),
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    strata = cust.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        (F.max("cents") - F.min("cents")).cast("long").alias("spread_h"),
    )
    wtot = Window.partitionBy()
    weighted = strata.select(
        "stratum",
        "n_h",
        "spread_h",
        (F.col("n_h") * F.col("spread_h")).alias("w"),
        F.sum(F.col("n_h") * F.col("spread_h")).over(wtot).alias("wtot"),
    )
    alloc = weighted.select(
        "stratum",
        "n_h",
        "spread_h",
        F.expr(f"({_NEYMAN_BUDGET} * w) div wtot").alias("base"),
        F.expr(f"({_NEYMAN_BUDGET} * w) % wtot").alias("frac"),
        (
            F.lit(_NEYMAN_BUDGET)
            - F.sum(F.expr(f"({_NEYMAN_BUDGET} * w) div wtot")).over(wtot)
        ).alias("rem"),
    )
    rk = Window.orderBy(F.desc("frac"), "stratum")
    return alloc.select(
        "stratum",
        "n_h",
        "spread_h",
        (
            F.col("base")
            + F.when(F.row_number().over(rk) <= F.col("rem"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated_n"),
    ).orderBy("stratum")
