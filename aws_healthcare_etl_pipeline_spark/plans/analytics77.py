"""Wave-103 (round 5): schema discovery + intermittent-demand
forecasting.

* ``fd_inclusion_dependency_discovery`` — Metanome-style inclusion-
  dependency (foreign-key candidate) discovery over five column
  pairs (three true FKs, one false, one partial): per pair, the
  child's distinct values anti-join the parent and containment
  lands in integer permille, with the is_inclusion flag at exactly
  1000 — the profiling pass that recovers undocumented join keys
  from a data lake. Distinct-grain anti-joins only: the fact tables
  collapse to their key domains before any join.
* ``forecast_croston_intermittent`` — Croston's method for
  intermittent demand, exactly: per sampled part, demand
  OCCURRENCES (ship days) carry sizes and inter-demand gaps; both
  series smooth with the repo's integer lag-weighted EWMA (weights
  2^(7-k) over the trailing 8 occurrences — products bounded, the
  same overflow-safe rebasing as the daily EWMA), and the Croston
  rate estimate sizeEWMA / gapEWMA is reported as an exact rational
  cross-division in micros. THE standard forecast for spare-parts-
  style demand where most days are zero and a plain EWMA
  systematically lags.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------- inclusion dependencies

# (name, child table, child col, parent table, parent col)
_IND_PAIRS = (
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.orderkey->customer", "orders", "o_orderkey", "customer", "c_custkey"),
    ("customer.nationkey->region", "customer", "c_nationkey", "region", "r_regionkey"),
)


def _ind_oracle() -> str:
    parts = []
    for name, ct, cc, pt, pc in _IND_PAIRS:
        parts.append(f"""
        SELECT '{name}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_child,
               CAST(SUM(CASE WHEN p.v IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_contained
        FROM (SELECT DISTINCT {cc} AS v FROM {ct}) c
        LEFT JOIN (SELECT DISTINCT {pc} AS v FROM {pt}) p
          ON p.v = c.v""")
    unions = "\nUNION ALL\n".join(parts)
    return f"""
        SELECT candidate, n_distinct_child, n_contained,
               CAST((n_contained * 1000) // n_distinct_child AS BIGINT)
                   AS containment_permille,
               CAST(CASE WHEN n_contained = n_distinct_child
                         THEN 1 ELSE 0 END AS BIGINT) AS is_inclusion
        FROM ({unions}) u
        ORDER BY candidate
    """


@query(
    "fd_inclusion_dependency_discovery",
    oracle=_ind_oracle(),
    description="Inclusion-dependency (FK candidate) discovery over "
    "five column pairs — three true foreign keys, one deliberate "
    "non-key, one partial overlap: the child column's DISTINCT "
    "values left-anti the parent's and containment lands in integer "
    "permille (is_inclusion = exactly 1000) — the Metanome-style "
    "profiling pass that recovers undocumented join keys from a "
    "lake. Scale: every pair collapses both sides to their distinct "
    "key domains FIRST (map-side combined), so the containment join "
    "is key-domain-sized regardless of fact-table volume; pairs "
    "union into a five-row report.",
)
def fd_inclusion_dependency_discovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    outs = []
    for name, ct, cc, pt, pc in _IND_PAIRS:
        child = (
            load_table(spark, sf_dir, ct).select(F.col(cc).alias("v")).distinct()
        )
        parent = (
            load_table(spark, sf_dir, pt).select(F.col(pc).alias("v")).distinct()
        )
        n_child = child.agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_child")
        )
        n_missing = child.join(parent, "v", "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("n_missing")
        )
        outs.append(
            n_child.crossJoin(F.broadcast(n_missing)).select(
                F.lit(name).alias("candidate"),
                "n_distinct_child",
                (F.col("n_distinct_child") - F.col("n_missing"))
                .cast("long")
                .alias("n_contained"),
            )
        )
    merged = reduce(DataFrame.unionByName, outs)
    return merged.select(
        "candidate",
        "n_distinct_child",
        "n_contained",
        F.expr("(n_contained * 1000) div n_distinct_child")
        .cast("long")
        .alias("containment_permille"),
        (F.col("n_contained") == F.col("n_distinct_child"))
        .cast("long")
        .alias("is_inclusion"),
    ).orderBy("candidate")


# ---------------------------------------- Croston intermittent demand

_CR_PART_MOD = 40  # sample parts: intermittent series per part
_CR_LAGS = 7  # trailing 8 occurrences; lambda = 1/2 per occurrence
_CR_LIMIT = 30


def _croston_terms(col: str) -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(lag({col}, {k}) OVER w * {1 << (_CR_LAGS - k)}, 0)"
        for k in range(_CR_LAGS + 1)
    )
    den = " + ".join(
        f"CASE WHEN lag({col}, {k}) OVER w IS NOT NULL"
        f" THEN {1 << (_CR_LAGS - k)} ELSE 0 END"
        for k in range(_CR_LAGS + 1)
    )
    return num, den


@query(
    "forecast_croston_intermittent",
    oracle=f"""
        WITH occ AS (
            SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS dy,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS z
            FROM lineitem WHERE l_partkey % {_CR_PART_MOD} = 0
            GROUP BY 1, 2
        ), gapped AS (
            SELECT pk, dy, z,
                   CAST(date_diff('day',
                        lag(dy) OVER (PARTITION BY pk ORDER BY dy), dy)
                        AS BIGINT) AS g
            FROM occ
        ), smoothed AS (
            SELECT pk, dy, z, g,
                   {_croston_terms("z")[0]} AS z_num,
                   {_croston_terms("z")[1]} AS z_den,
                   {_croston_terms("g")[0]} AS g_num,
                   {_croston_terms("g")[1]} AS g_den
            FROM gapped
            WINDOW w AS (PARTITION BY pk ORDER BY dy)
        ), latest AS (
            SELECT pk, z_num, z_den, g_num, g_den,
                   ROW_NUMBER() OVER (PARTITION BY pk
                                      ORDER BY dy DESC) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY pk) AS BIGINT)
                       AS n_occurrences
            FROM smoothed
        )
        SELECT pk AS partkey, n_occurrences,
               CAST(z_num AS BIGINT) AS size_num,
               CAST(z_den AS BIGINT) AS size_den,
               CAST(g_num AS BIGINT) AS gap_num,
               CAST(g_den AS BIGINT) AS gap_den,
               CAST(CASE WHEN g_num > 0
                         THEN (z_num * g_den * 1000000)
                              // (z_den * g_num)
                         ELSE NULL END AS BIGINT)
                   AS croston_rate_micros
        FROM latest WHERE rk = 1
        ORDER BY partkey
        LIMIT {_CR_LIMIT}
    """,
    description="Croston's method for intermittent demand, exact: "
    "per sampled part, demand occurrences (ship days) carry sizes "
    "and inter-demand gaps; both series smooth with the integer "
    "lag-weighted EWMA (weights 2^(7-k) over the trailing 8 "
    "occurrences — bounded products, the overflow-safe rebasing "
    "the daily EWMA established), and the demand-rate estimate "
    "sizeEWMA / gapEWMA is one exact rational cross-division in "
    "micros — THE spare-parts forecast where most days are zero "
    "and a plain EWMA decays toward nothing between demands. "
    "First 30 parts pinned. Scale: occurrences collapse map-side "
    "to (part, day) grain; the lag windows partition per part over "
    "occurrence-bounded rows; latest-state extraction is a "
    "WindowGroupLimit.",
)
def forecast_croston_intermittent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % _CR_PART_MOD == 0
    )
    occ = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("dy"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("z"))
    w = Window.partitionBy("pk").orderBy("dy")
    gapped = occ.withColumn(
        "g", F.datediff(F.col("dy"), F.lag("dy").over(w)).cast("long")
    )

    def terms(col: str) -> tuple[F.Column, F.Column]:
        num = reduce(
            lambda a, b: a + b,
            [
                F.coalesce(
                    F.lag(col, k).over(w) * (1 << (_CR_LAGS - k)), F.lit(0)
                )
                for k in range(_CR_LAGS + 1)
            ],
        )
        den = reduce(
            lambda a, b: a + b,
            [
                F.when(
                    F.lag(col, k).over(w).isNotNull(),
                    F.lit(1 << (_CR_LAGS - k)),
                ).otherwise(0)
                for k in range(_CR_LAGS + 1)
            ],
        )
        return num, den

    z_num, z_den = terms("z")
    g_num, g_den = terms("g")
    smoothed = gapped.select(
        "pk",
        "dy",
        z_num.cast("long").alias("z_num"),
        z_den.cast("long").alias("z_den"),
        g_num.cast("long").alias("g_num"),
        g_den.cast("long").alias("g_den"),
    )
    wl = Window.partitionBy("pk").orderBy(F.col("dy").desc())
    wp = Window.partitionBy("pk")
    latest = (
        smoothed.withColumn("rk", F.row_number().over(wl))
        .withColumn("n_occurrences", F.count(F.lit(1)).over(wp).cast("long"))
        .filter(F.col("rk") == 1)
    )
    return (
        latest.select(
            F.col("pk").alias("partkey"),
            "n_occurrences",
            F.col("z_num").alias("size_num"),
            F.col("z_den").alias("size_den"),
            F.col("g_num").alias("gap_num"),
            F.col("g_den").alias("gap_den"),
            F.when(
                F.col("g_num") > 0,
                F.expr("(z_num * g_den * 1000000) div (z_den * g_num)"),
            )
            .otherwise(F.lit(None))
            .cast("long")
            .alias("croston_rate_micros"),
        )
        .orderBy("partkey")
        .limit(_CR_LIMIT)
    )
