"""Wave-57 (round 5): incremental view maintenance + fairness audit.

* ``view_incremental_join_maintenance`` — delta propagation through a
  join-aggregate materialized view (the DBSP / differential-dataflow
  identity): with base relations O, L and deltas dO, dL,
  d(O |><| L) = dO|><|L + O|><|dL + dO|><|dL. The Spark plan computes
  the view update ONLY from the three delta terms; the DuckDB oracle
  recomputes the view from scratch on (O+dO, L+dL) and subtracts the
  base view — the hash match proves the delta algebra, which is the
  whole point of never rescanning a 100 TB base fact table.
* ``fairness_selection_rate_audit`` — disparate-impact (4/5-rule)
  audit of a corpus quality filter per language: a group is flagged
  when its selection rate is below 4/5 of the global rate, compared
  by integer cross-multiplication (5*sel_g*N < 4*SEL*n_g) — rationals
  never materialize, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------ incremental join-view maintenance

_IVM_CUTOFF = "1997-01-01"  # rows on/after this date are the "delta"


@query(
    "view_incremental_join_maintenance",
    oracle=f"""
        WITH o_all AS (
            SELECT o_orderkey, o_orderpriority,
                   o_orderdate < DATE '{_IVM_CUTOFF}' AS is_base
            FROM orders
        ), l_all AS (
            SELECT l_orderkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   l_shipdate < DATE '{_IVM_CUTOFF}' AS is_base
            FROM lineitem
        ), base_view AS (
            SELECT o.o_orderpriority, SUM(l.cents) AS cents
            FROM o_all o JOIN l_all l ON l.l_orderkey = o.o_orderkey
            WHERE o.is_base AND l.is_base
            GROUP BY 1
        ), new_view AS (
            SELECT o.o_orderpriority, SUM(l.cents) AS cents
            FROM o_all o JOIN l_all l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        )
        SELECT n.o_orderpriority,
               CAST(COALESCE(b.cents, 0) AS BIGINT) AS base_cents,
               CAST(n.cents - COALESCE(b.cents, 0) AS BIGINT)
                   AS delta_cents,
               CAST(n.cents AS BIGINT) AS new_cents
        FROM new_view n LEFT JOIN base_view b
          ON b.o_orderpriority = n.o_orderpriority
        ORDER BY n.o_orderpriority
    """,
    description="Incremental maintenance of a join-aggregate view "
    "(revenue cents per order priority over orders |><| lineitem): the "
    "Spark side applies the bilinear delta identity d(O |><| L) = "
    "dO|><|L_base + O_base|><|dL + dO|><|dL and emits base/delta/new "
    "totals WITHOUT ever re-joining the base relations with each "
    "other; the oracle recomputes the view from scratch and diffs, so "
    "the hash match PROVES the delta algebra. This is the streaming-"
    "materialized-view core (DBSP / differential dataflow): at 100 TB "
    "the base view is a stored aggregate, each maintenance tick joins "
    "only the (small, broadcastable) deltas against the base "
    "relations — never base-against-base — so update cost tracks "
    "delta size, not table size. Exact DECIMAL->bigint cents "
    "throughout.",
)
def view_incremental_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cutoff = F.lit(_IVM_CUTOFF).cast("date")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderdate") < cutoff).alias("is_base"),
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("l_shipdate") < cutoff).alias("is_base"),
    )
    o_base = orders.filter("is_base")
    o_delta = orders.filter("NOT is_base")
    l_base = line.filter("is_base")
    l_delta = line.filter("NOT is_base")

    def agg(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum("cents").alias("cents"))
        )

    # The stored base view (in production: read back, not recomputed).
    base_view = agg(o_base, l_base)
    # The three delta terms — none joins base against base.
    delta = (
        agg(o_delta, l_base)
        .unionByName(agg(o_base, l_delta))
        .unionByName(agg(o_delta, l_delta))
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("d_cents"))
    )
    return (
        base_view.withColumnRenamed("cents", "b_cents")
        .join(delta, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce(F.col("b_cents"), F.lit(0))
            .cast("long")
            .alias("base_cents"),
            F.coalesce(F.col("d_cents"), F.lit(0))
            .cast("long")
            .alias("delta_cents"),
            (
                F.coalesce(F.col("b_cents"), F.lit(0))
                + F.coalesce(F.col("d_cents"), F.lit(0))
            )
            .cast("long")
            .alias("new_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------------ fairness selection-rate audit

_FAIR_MIN_TOKENS = 20
_FAIR_MAX_TOKENS = 400
# 4/5 rule: flag iff rate_g < (4/5) * rate_global, cross-multiplied.


@query(
    "fairness_selection_rate_audit",
    oracle=f"""
        WITH d AS (
            SELECT lang,
                   CASE WHEN len(string_split(text, ' '))
                             BETWEEN {_FAIR_MIN_TOKENS}
                                 AND {_FAIR_MAX_TOKENS}
                        THEN 1 ELSE 0 END AS sel
            FROM documents
        ), g AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(sel) AS BIGINT) AS n_selected
            FROM d GROUP BY lang
        ), tot AS (
            SELECT SUM(n_docs) AS n_all, SUM(n_selected) AS sel_all FROM g
        )
        SELECT g.lang, g.n_docs, g.n_selected,
               CAST((g.n_selected * t.n_all * 1000)
                    // (t.sel_all * g.n_docs) AS BIGINT)
                   AS impact_ratio_permille,
               (5 * g.n_selected * t.n_all) < (4 * t.sel_all * g.n_docs)
                   AS disparate_impact
        FROM g, tot t
        ORDER BY g.lang
    """,
    description="Disparate-impact (4/5-rule) audit of a corpus quality "
    "filter: per-language selection rate under a token-count gate, "
    "compared to the global rate by integer cross-multiplication "
    "(5*sel_g*N < 4*SEL*n_g) plus an integer-div permille impact "
    "ratio — no rational ever materializes, so the audit is engine-"
    "exact. The operator the responsible-data-pipeline literature "
    "puts in front of every training-data filter: at 100 TB it is one "
    "map-side selection flag, one groupBy(lang) partial-agg shuffle "
    "over ~hundreds of groups, and a 1-row global total broadcast "
    "back — nothing scales with corpus size except the scan.",
)
def fairness_selection_rate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.when(
            F.size(F.split(F.col("text"), " ")).between(
                _FAIR_MIN_TOKENS, _FAIR_MAX_TOKENS
            ),
            1,
        )
        .otherwise(0)
        .alias("sel"),
    )
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sel").cast("long").alias("n_selected"),
    )
    tot = g.agg(
        F.sum("n_docs").alias("n_all"), F.sum("n_selected").alias("sel_all")
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_selected",
            F.expr(
                "(n_selected * n_all * 1000) div (sel_all * n_docs)"
            )
            .cast("long")
            .alias("impact_ratio_permille"),
            (
                5 * F.col("n_selected") * F.col("n_all")
                < 4 * F.col("sel_all") * F.col("n_docs")
            ).alias("disparate_impact"),
        )
        .orderBy("lang")
    )
