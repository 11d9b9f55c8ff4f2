"""Wave-93 (round 5): autocomplete serving tables + l-diversity.

* ``search_autocomplete_prefix_topk`` — the autocomplete serving
  table: every token contributes its 1/2/3-character prefixes, and
  each prefix keeps its top-3 completions by corpus frequency
  (deterministic (freq DESC, token) order) — the trie-lite
  materialization that turns keystrokes into suggestions with one
  equi-lookup. Per-token fan-out is bounded (3 prefixes), per-prefix
  retention is bounded (3 completions), so the serving table is
  prefix-alphabet-sized no matter the corpus.
* ``privacy_l_diversity_audit`` — l-diversity over the
  (nation, market-segment) quasi-identifier: k-anonymity says every
  group is big enough; l-diversity says every group's SENSITIVE
  attribute (order priority of the customer's orders) takes at
  least l distinct values — the audit that catches the homogeneous
  group a k-anonymity check waves through (everyone in the cell
  shares one diagnosis). Completes the repo's privacy trio with
  k-anonymity and t-closeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------- autocomplete top-k

_AC_TOP = 3
_AC_MIN_LEN = 4  # only tokens long enough to be worth completing


@query(
    "search_autocomplete_prefix_topk",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(list_filter(string_split(trim(text), ' '),
                                      t -> len(t) >= {_AC_MIN_LEN}))
                       AS token
            FROM documents
        ), freq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY token
        ), prefixed AS (
            SELECT substr(token, 1, p.plen) AS prefix, token, n
            FROM freq, (SELECT unnest([1, 2, 3]) AS plen) p
        ), ranked AS (
            SELECT prefix, token, n,
                   ROW_NUMBER() OVER (PARTITION BY prefix
                                      ORDER BY n DESC, token) AS rk
            FROM prefixed
        )
        SELECT prefix, token, n AS n_occurrences,
               CAST(rk AS BIGINT) AS rank
        FROM ranked WHERE rk <= {_AC_TOP}
        ORDER BY prefix, rank
        LIMIT 60
    """,
    description="Autocomplete serving table: tokens (length >= 4) "
    "contribute their 1/2/3-character prefixes and each prefix "
    "keeps its top-3 completions by corpus frequency with "
    "deterministic (freq DESC, token) order — the trie-lite "
    "materialization behind type-ahead suggestion, first 60 rows "
    "pinned. Scale: per-token fan-out is bounded at 3 prefixes, "
    "per-prefix retention at 3 completions via WindowGroupLimit "
    "(the rank filter pushes map-side), and the final table is "
    "prefix-alphabet-sized regardless of corpus volume — the whole "
    "pipeline is two map-side-combined aggregates and one bounded "
    "window.",
)
def search_autocomplete_prefix_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), " "),
                lambda t: F.length(t) >= _AC_MIN_LEN,
            )
        ).alias("token")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    prefixed = freq.select(
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("plen"),
        "token",
        "n",
    ).select(
        F.expr("substring(token, 1, plen)").alias("prefix"), "token", "n"
    )
    w = Window.partitionBy("prefix").orderBy(F.col("n").desc(), "token")
    return (
        prefixed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _AC_TOP)
        .select(
            "prefix",
            "token",
            F.col("n").alias("n_occurrences"),
            F.col("rk").cast("long").alias("rank"),
        )
        .orderBy("prefix", "rank")
        .limit(60)
    )


# ------------------------------------------------- l-diversity audit

_LDIV_L = 3  # require >= 3 distinct sensitive values per group


@query(
    "privacy_l_diversity_audit",
    oracle=f"""
        WITH joined AS (
            SELECT c.c_nationkey AS nationkey,
                   c.c_mktsegment AS segment,
                   o.o_orderpriority AS sensitive
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        ), groups AS (
            SELECT nationkey, segment,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct
            FROM joined GROUP BY nationkey, segment
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN l_distinct < {_LDIV_L}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_groups,
               CAST(SUM(CASE WHEN l_distinct < {_LDIV_L}
                             THEN n_rows ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(MIN(l_distinct) AS BIGINT) AS min_l,
               CAST((SUM(CASE WHEN l_distinct >= {_LDIV_L}
                              THEN 1 ELSE 0 END) * 1000) // COUNT(*)
                    AS BIGINT) AS compliant_permille
        FROM groups
    """,
    description="l-diversity audit (l=3) over the (nation, segment) "
    "quasi-identifier with order priority as the sensitive "
    "attribute: every QI group must exhibit at least 3 distinct "
    "sensitive values — the homogeneity attack k-anonymity misses "
    "(a big group where everyone shares one sensitive value still "
    "leaks it). Reports violating groups, rows at risk, the worst "
    "group's diversity, and compliance permille; completes the "
    "repo's privacy trio (k-anonymity, t-closeness, l-diversity). "
    "Scale: one equi-join shuffled on custkey, one map-side-"
    "combined group aggregate with a distinct count over a "
    "5-value domain, and a constant-size report.",
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("sensitive")
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    groups = joined.groupBy("nationkey", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("sensitive").cast("long").alias("l_distinct"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("l_distinct") < _LDIV_L).cast("long"))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(
            F.when(F.col("l_distinct") < _LDIV_L, F.col("n_rows")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.expr(
            f"(sum(CASE WHEN l_distinct >= {_LDIV_L} THEN 1 ELSE 0 END)"
            " * 1000) div count(*)"
        )
        .cast("long")
        .alias("compliant_permille"),
    )
