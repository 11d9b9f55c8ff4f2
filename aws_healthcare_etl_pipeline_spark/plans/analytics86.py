"""Wave-112 (round 5): exact betweenness centrality + pinball loss.

* ``graph_betweenness_nations`` — Brandes-style betweenness WITHOUT
  the backward dependency pass: on the bounded 25-node nation trade
  graph, all-pairs (dist, sigma) from a fixed 6-round unrolled BFS
  with path-count accumulation, then the identity
  sigma_st(v) = sigma(s,v) * sigma(v,t) iff
  dist(s,v) + dist(v,t) = dist(s,t) turns betweenness into three
  self-joins of one tiny table. Every per-pair share is quantized
  to integer permille via exact division, so the sum hashes
  identically across engines. The DuckDB oracle is the SAME
  6-level BFS unrolled into chained CTEs (no recursion, no
  convergence loop — a FIXED job count, the lesson from the
  Boruvka wall-clock fix).
* ``forecast_pinball_loss_eval`` — quantile-loss model evaluation:
  naive (last month) vs seasonal-naive (same month last year)
  monthly revenue forecasts scored under the pinball loss at
  tau = 0.5 and 0.9, carried as exact x10 cent integers
  (9*(y-f) vs 1*(f-y)) — the standard way to compare forecasters
  when over- and under-prediction cost differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- betweenness centrality

_HOPS = 6  # BFS horizon: fixed unroll depth, identical in both engines


def _bfs_cte_chain() -> str:
    """Chained-CTE all-pairs (dist, sigma) BFS, unrolled to _HOPS."""
    parts = [
        """f0 AS (
            SELECT node AS s, node AS v, 0 AS dist,
                   CAST(1 AS BIGINT) AS sigma
            FROM nodes
        ), a0 AS MATERIALIZED (SELECT * FROM f0)"""
    ]
    for k in range(1, _HOPS + 1):
        parts.append(f"""f{k} AS MATERIALIZED (
            SELECT f.s, e.v AS v, {k} AS dist,
                   CAST(SUM(f.sigma) AS BIGINT) AS sigma
            FROM f{k - 1} f JOIN edges e ON e.u = f.v
            WHERE NOT EXISTS (SELECT 1 FROM a{k - 1} a
                              WHERE a.s = f.s AND a.v = e.v)
            GROUP BY f.s, e.v
        ), a{k} AS MATERIALIZED (SELECT * FROM a{k - 1} UNION ALL SELECT * FROM f{k})""")
    return ", ".join(parts)


@query(
    "graph_betweenness_nations",
    oracle=f"""
        WITH trade AS (
            SELECT least(cn.n_nationkey, sn.n_nationkey) AS u,
                   greatest(cn.n_nationkey, sn.n_nationkey) AS v,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            WHERE cn.n_nationkey <> sn.n_nationkey
            GROUP BY 1, 2
        ), st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(w) AS BIGINT) AS tot
            FROM trade
        ), heavy AS (
            SELECT u, v FROM trade CROSS JOIN st
            WHERE w * cnt * 2 >= 3 * tot
        ), edges AS MATERIALIZED (
            SELECT u, v FROM heavy
            UNION ALL SELECT v AS u, u AS v FROM heavy
        ), nodes AS MATERIALIZED (
            SELECT DISTINCT u AS node FROM edges
        ), {_bfs_cte_chain()}, reach AS MATERIALIZED (
            SELECT * FROM a{_HOPS}
        ), bc AS (
            SELECT mid.v AS node,
                   CAST(SUM((r1.sigma * r2.sigma * 1000)
                            // r3.sigma) AS BIGINT) AS betweenness_permille
            FROM reach r1
            JOIN reach r2 ON r2.s = r1.v
            JOIN reach r3 ON r3.s = r1.s AND r3.v = r2.v
            JOIN (SELECT node AS v FROM nodes) mid ON mid.v = r1.v
            WHERE r1.s <> r1.v AND r2.s <> r2.v AND r1.s <> r2.v
              AND r1.dist + r2.dist = r3.dist
            GROUP BY mid.v
        ), deg AS (
            SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY u
        )
        SELECT n.node AS nationkey, d.degree,
               CAST(COALESCE(b.betweenness_permille, 0) AS BIGINT)
                   AS betweenness_permille
        FROM nodes n
        JOIN deg d ON d.node = n.node
        LEFT JOIN bc b ON b.node = n.node
        ORDER BY nationkey
    """,
    description="Exact betweenness centrality on the nation trade "
    "graph (edge iff a nation pair's trade volume is >= 2x the mean "
    "pair volume — an integer cross-multiplied threshold). The "
    "Brandes backward pass is eliminated by the path-count identity "
    "sigma_st(v) = sigma(s,v)*sigma(v,t) when dist(s,v)+dist(v,t) "
    "= dist(s,t): all-pairs (dist, sigma) comes from a FIXED "
    "6-round unrolled BFS (no convergence loop — bounded job count, "
    "the Boruvka wall-clock lesson), then betweenness is three "
    "self-joins of a <=625-row table with per-pair shares quantized "
    "to exact permille. The 100 TB split: the ONLY fact-scale work "
    "is the q7-shaped trade aggregation (partial aggs, broadcast "
    "dims); the graph algorithm runs on the bounded 25-node entity "
    "graph — exactly how production computes centralities over "
    "aggregated entity graphs, not raw events.",
)
def graph_betweenness_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn = F.col("c_nationkey")
    sn = F.col("s_nationkey")
    trade = (
        line.join(orders, orders.o_orderkey == line.l_orderkey)
        .join(F.broadcast(customer), customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(supplier), supplier.s_suppkey == line.l_suppkey)
        .where(cn != sn)
        .groupBy(
            F.least(cn, sn).alias("u"), F.greatest(cn, sn).alias("v")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("w")
        )
    )
    st = trade.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("w").cast("long").alias("tot"),
    )
    heavy = (
        trade.crossJoin(F.broadcast(st))
        .where(F.col("w") * F.col("cnt") * 2 >= 3 * F.col("tot"))
        .select("u", "v")
    )
    edges = heavy.unionAll(
        heavy.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)  # tiny; reused every BFS round
    nodes = edges.select(F.col("u").alias("node")).distinct()
    reach = nodes.select(
        F.col("node").alias("s"),
        F.col("node").alias("v"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint(eager=False)
    e2 = edges.select(
        F.col("u").alias("e_src"), F.col("v").alias("e_dst")
    )
    frontier = reach
    for k in range(1, _HOPS + 1):
        nxt = (
            frontier.select("s", F.col("v").alias("f_v"), "sigma")
            .join(e2, F.col("f_v") == F.col("e_src"))
            .groupBy("s", F.col("e_dst").alias("v"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .join(reach.select("s", "v"), ["s", "v"], "left_anti")
            .select("s", "v", F.lit(k).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        reach = reach.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    r1 = reach.select(
        F.col("s").alias("s"),
        F.col("v").alias("m"),
        F.col("dist").alias("d1"),
        F.col("sigma").alias("g1"),
    )
    r2 = reach.select(
        F.col("s").alias("m"),
        F.col("v").alias("t"),
        F.col("dist").alias("d2"),
        F.col("sigma").alias("g2"),
    )
    r3 = reach.select(
        F.col("s").alias("s"),
        F.col("v").alias("t"),
        F.col("dist").alias("d3"),
        F.col("sigma").alias("g3"),
    )
    bc = (
        r1.join(r2, "m")
        .join(r3, ["s", "t"])
        .where(
            (F.col("s") != F.col("m"))
            & (F.col("m") != F.col("t"))
            & (F.col("s") != F.col("t"))
            & (F.col("d1") + F.col("d2") == F.col("d3"))
        )
        .groupBy(F.col("m").alias("node"))
        .agg(
            F.sum(F.expr("(g1 * g2 * 1000) div g3"))
            .cast("long")
            .alias("betweenness_permille")
        )
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return (
        nodes.join(deg, "node")
        .join(bc, "node", "left")
        .select(
            F.col("node").alias("nationkey"),
            "degree",
            F.coalesce(F.col("betweenness_permille"), F.lit(0))
            .cast("long")
            .alias("betweenness_permille"),
        )
        .orderBy("nationkey")
    )


# ------------------------------------------------ pinball loss


@query(
    "forecast_pinball_loss_eval",
    oracle="""
        WITH monthly AS (
            SELECT EXTRACT(year FROM o_orderdate) * 12
                       + EXTRACT(month FROM o_orderdate) - 1 AS mi,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS y
            FROM orders GROUP BY 1
        ), preds AS (
            SELECT m.mi, m.y, p1.y AS f_naive, p12.y AS f_seasonal
            FROM monthly m
            JOIN monthly p1 ON p1.mi = m.mi - 1
            JOIN monthly p12 ON p12.mi = m.mi - 12
        ), losses AS (
            SELECT 'naive' AS forecaster, mi, y, f_naive AS f FROM preds
            UNION ALL
            SELECT 'seasonal', mi, y, f_seasonal FROM preds
        )
        SELECT forecaster,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(CASE WHEN y >= f THEN 5 * (y - f)
                             ELSE 5 * (f - y) END) AS BIGINT)
                   AS pinball50_x10_cents,
               CAST(SUM(CASE WHEN y >= f THEN 9 * (y - f)
                             ELSE (f - y) END) AS BIGINT)
                   AS pinball90_x10_cents
        FROM losses GROUP BY forecaster ORDER BY forecaster
    """,
    description="Quantile-loss forecaster bake-off: naive "
    "(last month) vs seasonal-naive (same month last year) monthly "
    "revenue forecasts scored under the pinball loss at tau=0.5 and "
    "tau=0.9, carried as exact x10 cent integers (10*loss is "
    "integral for tau in tenths: 9*(y-f) under-forecast vs 1*(f-y) "
    "over-forecast), so both engines hash identically. Pinball loss "
    "is THE proper scoring rule for quantile forecasts — tau=0.9 "
    "penalizes under-forecasting 9x, the asymmetry every capacity-"
    "planning team actually wants. 100 TB shape: one partial-agg "
    "shuffle to the bounded month grain, then self-joins on a "
    "~80-row spine.",
)
def forecast_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("mi")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("y")
    ).localCheckpoint(eager=False)  # bounded spine, reused 3x
    p1 = monthly.select((F.col("mi") + 1).alias("mi"), F.col("y").alias("f_naive"))
    p12 = monthly.select(
        (F.col("mi") + 12).alias("mi"), F.col("y").alias("f_seasonal")
    )
    preds = monthly.join(p1, "mi").join(p12, "mi")
    losses = preds.select(
        F.lit("naive").alias("forecaster"), "mi", "y", F.col("f_naive").alias("f")
    ).unionAll(
        preds.select(
            F.lit("seasonal").alias("forecaster"),
            "mi",
            "y",
            F.col("f_seasonal").alias("f"),
        )
    )
    return (
        losses.groupBy("forecaster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum(
                F.when(
                    F.col("y") >= F.col("f"), 5 * (F.col("y") - F.col("f"))
                ).otherwise(5 * (F.col("f") - F.col("y")))
            )
            .cast("long")
            .alias("pinball50_x10_cents"),
            F.sum(
                F.when(
                    F.col("y") >= F.col("f"), 9 * (F.col("y") - F.col("f"))
                ).otherwise(F.col("f") - F.col("y"))
            )
            .cast("long")
            .alias("pinball90_x10_cents"),
        )
        .orderBy("forecaster")
    )
