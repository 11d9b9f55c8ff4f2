"""Wave-184 (round 5): tail risk + rich-club structure.

* ``risk_cvar_tail_concentration`` — Value-at-Risk and Conditional
  VaR (expected shortfall) on order values, exact: the 95th-
  percentile threshold comes from the histogram-refinement selection
  operator (no global sort; driver state is bounded bucket counts),
  the tail is the deterministic value-rule >= threshold, and the
  tail's revenue is decomposed by market segment — the concentration
  question risk teams actually ask ("WHO is our tail?").

* ``graph_rich_club_permille`` — the rich-club probe: among the 50
  highest-degree customers (degree tie-broken by key), how densely
  do they interconnect through shared parts? Connected club pairs
  over C(50,2) in permille, plus the club's degree floor. The club
  is selected FIRST, so the pair enumeration touches only a constant
  50-node slice of the graph at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.selection import kth_smallest
from ..sources.tables import load_table
from .registry import query

_CVAR_PCT = 95


@query(
    "risk_cvar_tail_concentration",
    oracle=f"""
        WITH vals AS (
            SELECT o_custkey AS ck,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), thr AS (
            SELECT v AS var_cents FROM (
                SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rnk,
                       COUNT(*) OVER () AS n
                FROM vals
            ) WHERE rnk = ({_CVAR_PCT} * n) // 100 + 1
        ), tail AS (
            SELECT c.c_mktsegment AS seg, vals.v
            FROM vals JOIN customer c ON c.c_custkey = vals.ck
            CROSS JOIN thr
            WHERE vals.v >= thr.var_cents
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS tail_n,
                   CAST(SUM(v) AS BIGINT) AS tail_rev
            FROM tail
        )
        SELECT t.seg,
               CAST(COUNT(*) AS BIGINT) AS seg_tail_n,
               CAST(SUM(t.v) AS BIGINT) AS seg_tail_revenue_cents,
               CAST(SUM(t.v) * 1000 // x.tail_rev AS BIGINT)
                   AS tail_share_permille,
               (SELECT var_cents FROM thr) AS var_cents,
               CAST(x.tail_rev // x.tail_n AS BIGINT) AS cvar_cents
        FROM tail t CROSS JOIN tot x
        GROUP BY t.seg, x.tail_rev, x.tail_n
        ORDER BY t.seg
    """,
    description="VaR and expected shortfall with the concentration "
    "breakdown risk teams actually want: the exact 95th-percentile "
    "order value comes from the histogram-refinement selection "
    "operator (iterative bucket counts, NO global sort, bounded "
    "driver state — the oracle proves it against the textbook "
    "window-rank form), the tail is the deterministic value rule "
    ">= threshold, and tail revenue splits by market segment in "
    "permille with the global CVaR (tail mean, truncated cents) on "
    "every row. 100 TB shape: selection is a handful of full-scan "
    "histogram aggs; the tail pass is one filtered join with a "
    "broadcast dim; nothing sorts — the daily tail-risk report for "
    "a trillion-row ledger.",
)
def risk_cvar_tail_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    vals = orders.selectExpr(
        "o_custkey AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    ).localCheckpoint(eager=False)  # selection passes + tail pass
    n = vals.count()
    k = (_CVAR_PCT * n) // 100 + 1
    var_cents = kth_smallest(vals, "v", k)
    tail = vals.where(F.col("v") >= var_cents).join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("ck"),
    )
    tot = tail.agg(
        F.count(F.lit(1)).cast("long").alias("tail_n"),
        F.sum("v").cast("long").alias("tail_rev"),
    )
    return (
        tail.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("seg_tail_n"),
            F.sum("v").cast("long").alias("seg_tail_revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "seg",
            "seg_tail_n",
            "seg_tail_revenue_cents",
            "CAST(seg_tail_revenue_cents * 1000 div tail_rev"
            " AS BIGINT) AS tail_share_permille",
            f"CAST({var_cents} AS BIGINT) AS var_cents",
            "CAST(tail_rev div tail_n AS BIGINT) AS cvar_cents",
        )
        .orderBy("seg")
    )


_CLUB_K = 50


@query(
    "graph_rich_club_permille",
    oracle=f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), degs AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY c
        ), club AS (
            SELECT c, deg FROM (
                SELECT c, deg,
                       ROW_NUMBER() OVER (ORDER BY deg DESC, c) AS rnk
                FROM degs
            ) WHERE rnk <= {_CLUB_K}
        ), club_pairs AS (
            SELECT DISTINCT a.c AS c1, b.c AS c2
            FROM club a JOIN edges e1 ON e1.c = a.c
            JOIN edges e2 ON e2.p = e1.p
            JOIN club b ON b.c = e2.c AND b.c > a.c
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS connected_pairs,
               CAST({_CLUB_K * (_CLUB_K - 1) // 2} AS BIGINT)
                   AS possible_pairs,
               CAST(COUNT(*) * 1000
                    // {_CLUB_K * (_CLUB_K - 1) // 2} AS BIGINT)
                   AS club_density_permille,
               (SELECT CAST(MIN(deg) AS BIGINT) FROM club)
                   AS club_degree_floor
        FROM club_pairs
    """,
    description="The rich-club probe: do the 50 highest-degree "
    "customers interconnect (through shared parts) more densely "
    "than chance would suggest? The club is selected FIRST (degree "
    "rank, key tie-break), so the pair enumeration — club x edges x "
    "edges x club — touches only the constant 50-node slice plus "
    "their incident edges at ANY scale; connected pairs over "
    "C(50,2) land in permille with the club's degree floor for "
    "context. 100 TB shape: one edge dedup, one degree agg, one "
    "top-k, then joins whose left side is 50 rows (broadcast) — "
    "the core-periphery structure check for purchase, citation, "
    "and interbank graphs.",
)
def graph_rich_club_permille(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)  # degrees + 2 hop joins
    )
    degs = edges.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    rw = Window.orderBy(F.col("deg").desc(), F.col("c"))
    club = (
        degs.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _CLUB_K)
        .select("c", "deg")
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    e1 = edges.join(
        F.broadcast(club.select(F.col("c").alias("c1"))),
        F.col("c") == F.col("c1"),
    ).select("c1", "p")
    e2 = edges.join(
        F.broadcast(club.select(F.col("c").alias("c2"))),
        F.col("c") == F.col("c2"),
    ).select("c2", "p")
    club_pairs = (
        e1.join(e2, "p")
        .where(F.col("c2") > F.col("c1"))
        .select("c1", "c2")
        .distinct()
    )
    floor = club.agg(
        F.min("deg").cast("long").alias("club_degree_floor")
    )
    possible = _CLUB_K * (_CLUB_K - 1) // 2
    return (
        club_pairs.agg(
            F.count(F.lit(1)).cast("long").alias("connected_pairs")
        )
        .crossJoin(F.broadcast(floor))
        .selectExpr(
            "connected_pairs",
            f"CAST({possible} AS BIGINT) AS possible_pairs",
            f"CAST(connected_pairs * 1000 div {possible} AS BIGINT)"
            " AS club_density_permille",
            "club_degree_floor",
        )
    )
