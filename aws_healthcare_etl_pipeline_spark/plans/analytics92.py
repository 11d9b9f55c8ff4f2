"""Wave-118 (round 5): Mood dispersion test + Erlang-B blocking.

* ``stat_mood_dispersion_test`` — the rank test for SCALE (spread)
  differences, complementing the repo's Mann-Whitney (location)
  and Kruskal-Wallis machinery: Mood's statistic sums squared rank
  deviations from the pooled center. With doubled midranks from
  the value-histogram identity, 4*T = sum_v h_j(v) *
  (midrank2(v) - (N+1))^2 is an exact integer carried in
  DECIMAL(38) and emitted as VARCHAR (the >2^53 idiom), alongside
  the exact null expectation — no global sort, no libm.
* ``ops_erlang_b_blocking`` — the classic capacity-planning
  recursion B_s = aB_{s-1} / (s + aB_{s-1}): offered load is
  measured from the event stream (arrivals per minute x a 45-min
  service time, exact milli-erlangs), and the blocking probability
  for 1..16 servers is unrolled with a MATERIALIZATION BARRIER per
  step (the recurrence uses the previous term twice, so alias
  chaining expands 2^16 expression nodes — measured) and ppm
  quantization at each step — identical truncating integer
  arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

# --------------------------------------------- Mood dispersion


@query(
    "stat_mood_dispersion_test",
    oracle="""
        WITH x AS (
            SELECT l_returnflag AS g,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM lineitem
        ), hist AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS h FROM x GROUP BY v
        ), cum AS (
            SELECT v, h,
                   CAST(COALESCE(SUM(h) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS c_before
            FROM hist
        ), gh AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS hj
            FROM x GROUP BY g, v
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x
        )
        SELECT gh.g AS grp,
               CAST(SUM(gh.hj) AS BIGINT) AS n_j,
               CAST(CAST(SUM(CAST(gh.hj AS HUGEINT)
                   * (2 * c.c_before + c.h + 1 - (t.n + 1))
                   * (2 * c.c_before + c.h + 1 - (t.n + 1)))
                   AS DECIMAL(38,0)) AS VARCHAR) AS mood_x4,
               CAST(CAST(CAST(SUM(gh.hj) AS HUGEINT)
                   * (t.n + 1) * (t.n - 1) // 3
                   AS DECIMAL(38,0)) AS VARCHAR) AS expected_x4
        FROM gh JOIN cum c ON c.v = gh.v CROSS JOIN tot t
        GROUP BY gh.g, t.n ORDER BY grp
    """,
    description="Mood's rank test for dispersion — does a group's "
    "price SPREAD differ from the pooled population, independent of "
    "location — the scale-test sibling of the repo's Mann-Whitney/"
    "Kruskal-Wallis lane: 4*T_j = sum_v h_j(v) * (midrank2(v) - "
    "(N+1))^2 uses the same doubled-midrank histogram identity (one "
    "value histogram, NO global sort), stays exact through "
    "HUGEINT/DECIMAL(38) products, and is emitted as VARCHAR "
    "because the squared deviations exceed 2^53 (the repo's big-"
    "integer emit idiom); the exact null expectation n_j(N+1)(N-1)/3 "
    "(x4, truncating div by 3 in both engines) sits alongside for "
    "the deviation read. 100 TB shape: two partial-agg shuffles "
    "plus bounded spine algebra, identical to the proven KW plan.",
)
def stat_mood_dispersion_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    hist = line.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    cum = distributed_running_total(
        hist.withColumn("vb", F.expr("v div 1048576")),
        F.col("h"),
        "vb",
        ["v"],
        out_col="c_incl",
        zero=F.lit(0).cast("bigint"),
    ).withColumn("c_before", (F.col("c_incl") - F.col("h")).cast("long"))
    gh = line.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("hj")
    )
    tot = line.agg(F.count(F.lit(1)).cast("long").alias("n"))
    d38 = "decimal(38,0)"
    return (
        gh.join(cum.select("v", "h", "c_before"), "v")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("g").alias("grp"), "n")
        .agg(
            F.sum("hj").cast("long").alias("n_j"),
            F.sum(
                F.expr(
                    f"""CAST(hj AS {d38})
                        * (2 * c_before + h + 1 - (n + 1))
                        * (2 * c_before + h + 1 - (n + 1))"""
                )
            )
            .cast(d38)
            .cast("string")
            .alias("mood_x4"),
        )
        .select(
            "grp",
            "n_j",
            "mood_x4",
            F.expr(
                f"""CAST(CAST(CAST(n_j AS {d38}) * (n + 1) * (n - 1)
                         div 3 AS {d38}) AS STRING)"""
            ).alias("expected_x4"),
        )
        .orderBy("grp")
    )


# ------------------------------------------------ Erlang B

_SERVERS = 16
_SERVICE_MIN = 45


def _erlang_oracle() -> str:
    """Chained MATERIALIZED CTEs: each step references the previous
    term TWICE (numerator and denominator), so a lateral-alias chain
    expands 2^16 expression nodes — materializing every step keeps
    the tree linear (measured: 345s -> sub-second)."""
    steps = []
    prev = "c0"
    for s in range(1, _SERVERS + 1):
        steps.append(
            f"c{s} AS MATERIALIZED (SELECT a_milli,"
            f" (a_milli * b * 1000000)"
            f" // (CAST({s} AS HUGEINT) * 1000000000 + a_milli * b) AS b"
            f" FROM {prev})"
        )
        prev = f"c{s}"
    union = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS s, a_milli, b FROM c{s}"
        for s in range(1, _SERVERS + 1)
    )
    return f"""
        WITH load AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS HUGEINT) * 1000 * {_SERVICE_MIN}
                   // greatest((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                              // 60000000, 1) AS a_milli
            FROM events
        ), c0 AS MATERIALIZED (
            SELECT a_milli, CAST(1000000 AS HUGEINT) AS b FROM load
        ), {", ".join(steps)}
        SELECT s, CAST(a_milli AS BIGINT) AS offered_milli_erlangs,
               CAST(b AS BIGINT) AS blocking_ppm
        FROM ({union}) ORDER BY s
    """


@query(
    "ops_erlang_b_blocking",
    oracle=_erlang_oracle(),
    description="Erlang-B blocking probability for 1..16 servers — "
    "the capacity-planning recursion behind every call-center / "
    "connection-pool sizing decision: offered load is MEASURED from "
    "the event stream (arrival rate per minute x a 45-minute "
    "service time, exact milli-erlangs from epoch microseconds), "
    "then B_s = aB_(s-1)/(s + aB_(s-1)) is unrolled 16 steps with "
    "ppm quantization at every step — truncating integer division "
    "that Spark div and DuckDB HUGEINT // share, so the whole "
    "blocking curve hashes exactly. Because each step references "
    "the previous term twice, both engines need a materialization "
    "barrier per step (lateral-alias chaining expands 2^16 "
    "expression nodes — measured 345s, now sub-second): the oracle "
    "uses MATERIALIZED CTEs, the Spark side a localCheckpoint per "
    "step on the single-row frame. Reading the curve gives the "
    "fewest servers under any blocking SLA. 100 TB shape: ONE "
    "min/max/count aggregate over the fact table; the recursion is "
    "single-row algebra, free at any volume.",
)
def ops_erlang_b_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cur = events.agg(
        F.expr(
            f"""CAST(COUNT(*) AS DECIMAL(38,0)) * 1000 * {_SERVICE_MIN}
                div greatest((unix_micros(MAX(ts)) - unix_micros(MIN(ts)))
                             div 60000000, 1)"""
        ).alias("a_milli")
    ).selectExpr(
        "a_milli", "CAST(1000000 AS DECIMAL(38,0)) AS b"
    ).localCheckpoint(eager=False)
    rows = []
    for s in range(1, _SERVERS + 1):
        # barrier per step: the recurrence uses b twice, and collapsed
        # projections would re-expand the whole chain exponentially
        cur = cur.selectExpr(
            "a_milli",
            f"(a_milli * b * 1000000)"
            f" div (CAST({s} AS DECIMAL(38,0)) * 1000000000"
            f" + a_milli * b) AS b",
        ).localCheckpoint(eager=False)
        rows.append(
            cur.selectExpr(
                f"CAST({s} AS LONG) AS s",
                "CAST(a_milli AS LONG) AS offered_milli_erlangs",
                "CAST(b AS LONG) AS blocking_ppm",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("s")
