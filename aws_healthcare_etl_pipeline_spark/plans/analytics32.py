"""Wave-58 (round 5): finance-calendar allocation + data profiling.

* ``revenue_recognition_schedule`` — accrual accounting's deferred-
  revenue spread: each order's total is recognized across the calendar
  months of its service period (order date .. latest line shipment),
  pro-rata by days-in-month, with the cent remainder assigned by the
  largest-remainder rule so every order's schedule sums EXACTLY to its
  total. Month explode via ``sequence``/``generate_series`` (ascending
  guarded: the period end is clamped to >= the order date, since the
  synthetic fixture does not enforce ship >= order), all bigint.
* ``fd_discovery_audit`` — functional-dependency profiling (the
  Metanome-style data-quality primitive): for a fixed candidate set of
  ``lhs -> rhs`` dependencies, count violating lhs groups (groups with
  more than one distinct rhs) and the rows inside them. Exact distinct
  counts; one partial-agg shuffle per candidate table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- revenue recognition schedule


@query(
    "revenue_recognition_schedule",
    oracle="""
        WITH period AS (
            SELECT o.o_orderkey,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   o.o_orderdate AS d0,
                   GREATEST(MAX(l.l_shipdate), o.o_orderdate) AS d1
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3
        ), months AS (
            SELECT o_orderkey, cents, d0, d1,
                   CAST(m AS DATE) AS mstart
            FROM period,
                 UNNEST(generate_series(date_trunc('month', d0),
                                        date_trunc('month', d1),
                                        INTERVAL 1 MONTH)) t(m)
        ), weighted AS (
            SELECT o_orderkey, cents, mstart,
                   CAST(date_diff('day',
                        GREATEST(mstart, d0),
                        LEAST(last_day(mstart), d1)) + 1 AS BIGINT) AS w,
                   CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS wtot
            FROM months
        ), alloc AS (
            SELECT o_orderkey, mstart,
                   (cents * w) // wtot AS base,
                   (cents * w) % wtot AS frac,
                   cents - SUM((cents * w) // wtot)
                       OVER (PARTITION BY o_orderkey) AS rem
            FROM weighted
        ), final AS (
            SELECT o_orderkey, mstart,
                   base + CASE WHEN ROW_NUMBER() OVER (
                              PARTITION BY o_orderkey
                              ORDER BY frac DESC, mstart) <= rem
                          THEN 1 ELSE 0 END AS rec
            FROM alloc
        )
        SELECT strftime(mstart, '%Y-%m-%d') AS month_start,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(rec) AS BIGINT) AS recognized_cents
        FROM final GROUP BY 1 ORDER BY 1
    """,
    description="Deferred-revenue recognition schedule: every order's "
    "total (exact cents) is spread over the calendar months of its "
    "service period (order date .. latest line shipment) pro-rata by "
    "days-in-month, with the integer remainder assigned by the "
    "largest-remainder rule (frac DESC, month ASC) so each order's "
    "schedule sums to its total TO THE CENT — the invariant auditors "
    "actually check. Month explode is a bounded ascending sequence "
    "(periods span a handful of months), the remainder window is "
    "partitioned per order over those few rows, and the final rollup "
    "is one partial-agg shuffle on month — at 100 TB nothing global "
    "exists except the ~tens-of-rows month totals. The DuckDB oracle "
    "replays the identical integer allocation, proving the "
    "largest-remainder tie-break bit-for-bit.",
)
def revenue_recognition_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")
    period = (
        orders.join(line, line["l_orderkey"] == orders["o_orderkey"])
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_orderdate").alias("d0"),
            "l_shipdate",
        )
        .groupBy("o_orderkey", "cents", "d0")
        .agg(F.greatest(F.max("l_shipdate"), F.first("d0")).alias("d1"))
    )
    months = period.select(
        "o_orderkey",
        "cents",
        "d0",
        "d1",
        F.explode(
            F.sequence(
                F.trunc("d0", "MM"),
                F.trunc("d1", "MM"),
                F.expr("interval 1 month"),
            )
        ).alias("mstart"),
    )
    weighted = months.select(
        "o_orderkey",
        "cents",
        "mstart",
        (
            F.datediff(
                F.least(F.last_day("mstart"), F.col("d1")),
                F.greatest(F.col("mstart"), F.col("d0")),
            )
            + 1
        )
        .cast("long")
        .alias("w"),
        (F.datediff("d1", "d0") + 1).cast("long").alias("wtot"),
    )
    per_order = Window.partitionBy("o_orderkey")
    alloc = weighted.select(
        "o_orderkey",
        "mstart",
        F.expr("(cents * w) div wtot").alias("base"),
        F.expr("(cents * w) % wtot").alias("frac"),
        (
            F.col("cents")
            - F.sum(F.expr("(cents * w) div wtot")).over(per_order)
        ).alias("rem"),
    )
    rank_w = Window.partitionBy("o_orderkey").orderBy(
        F.desc("frac"), "mstart"
    )
    final = alloc.select(
        "o_orderkey",
        "mstart",
        (
            F.col("base")
            + F.when(F.row_number().over(rank_w) <= F.col("rem"), 1)
            .otherwise(0)
        ).alias("rec"),
    )
    return (
        final.groupBy(
            F.date_format("mstart", "yyyy-MM-dd").alias("month_start")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("rec").cast("long").alias("recognized_cents"),
        )
        .orderBy("month_start")
    )


# ------------------------------------------------- FD discovery audit

# (table, lhs, rhs) candidates: a mix of true FDs (keys) and expected
# violations, limited to the fixture's column set.
_FD_CANDIDATES = [
    ("part", "p_name", "p_type"),
    ("part", "p_type", "p_brand"),
    ("part", "p_partkey", "p_name"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("supplier", "s_nationkey", "s_name"),
]


def _fd_oracle() -> str:
    parts = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
        SELECT '{tbl}.{lhs} -> {tbl}.{rhs}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS violating_groups,
               CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
                   AS violating_rows,
               MAX(nd) = 1 AS holds
        FROM (
            SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd, COUNT(*) AS n
            FROM {tbl} GROUP BY {lhs}
        )""")
    return " UNION ALL ".join(parts) + " ORDER BY candidate"


@query(
    "fd_discovery_audit",
    oracle=_fd_oracle(),
    description="Functional-dependency discovery audit (the Metanome-"
    "class profiling primitive behind schema inference and key "
    "detection): for each candidate lhs -> rhs, the number of lhs "
    "groups carrying more than one distinct rhs, the rows trapped in "
    "those groups, and a holds verdict — exact COUNT(DISTINCT) per "
    "group, no approximation. Catches both true dependencies (keys and "
    "near-keys like p_name -> p_type) and violations alike. "
    "At 100 TB each candidate is one partial-agg shuffle on its lhs "
    "and candidates over the same table share the scan; the result is "
    "one row per candidate, so the audit's output is metadata-sized "
    "regardless of input volume.",
)
def fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        g = t.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("nd"), F.count(F.lit(1)).alias("n")
        )
        outs.append(
            g.agg(
                F.lit(f"{tbl}.{lhs} -> {tbl}.{rhs}").alias("candidate"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("violating_groups"),
                F.sum(F.when(F.col("nd") > 1, F.col("n")).otherwise(0))
                .cast("long")
                .alias("violating_rows"),
                (F.max("nd") == 1).alias("holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy("candidate")
