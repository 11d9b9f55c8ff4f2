"""Wave-212 (round 8, part 1): bounded-enumeration OR / game-theory
operators — Banzhaf voting power, max clique, s-t min cut, Wagner-Whitin
lot sizing, the secretary-rule optimal-stopping replay, weighted fair
queueing conformance, uniform-price multi-unit auction clearing, the
airport-game closed-form Shapley cost split, and an AGM-bound
cardinality audit.

Shared scale shape ([EXT] per SURVEY.md §2.8 — none of these exist in
the reference, whose only query is README.md:98-101): every query does
its data-touching work as ONE or TWO fact-scale aggregations (counts /
cents sums, pushed-down scans), reduces to a DIMENSION-BOUNDED panel
(<= 10 players / nodes / parts — constant in SF), and runs the
combinatorial enumeration (2^8..2^11 masks) DISTRIBUTED as a
spark.range cross-join against the broadcast panel — never a driver
loop, never growing with data volume. All arithmetic is integer
(cents / permille / micro) with truncation division mirrored exactly
in DuckDB (`//`) and Spark (`div`), so hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------ Banzhaf power index

_BZ_PLAYERS = 10


@query(
    "election_banzhaf_power_index",
    oracle=f"""
        WITH wts AS MATERIALIZED (
            SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS w
            FROM lineitem GROUP BY 1
            ORDER BY w DESC, l_suppkey LIMIT {_BZ_PLAYERS}
        ), panel AS MATERIALIZED (
            SELECT l_suppkey, w,
                   ROW_NUMBER() OVER (ORDER BY w DESC, l_suppkey) AS p
            FROM wts
        ), st AS (
            SELECT CAST(SUM(w) AS BIGINT) // 2 + 1 AS quota FROM panel
        ), mw AS MATERIALIZED (
            -- coalition weight per mask (empty coalition kept via LEFT)
            SELECT m.range AS mask,
                   COALESCE(CAST(SUM(CASE WHEN ((m.range >> (p.p - 1)) & 1) = 1
                                          THEN p.w END) AS BIGINT), 0) AS ws
            FROM range({2 ** _BZ_PLAYERS}) m
            LEFT JOIN panel p ON ((m.range >> (p.p - 1)) & 1) = 1
            GROUP BY m.range
        ), sw AS (
            -- swings: coalitions S (not containing i) losing without i,
            -- winning with i
            SELECT p.p, p.l_suppkey, p.w,
                   CAST(COUNT(mw.mask) AS BIGINT) AS swings
            FROM panel p CROSS JOIN st
            LEFT JOIN mw ON ((mw.mask >> (p.p - 1)) & 1) = 0
                        AND mw.ws < st.quota AND mw.ws + p.w >= st.quota
            GROUP BY 1, 2, 3
        ), tsw AS (SELECT CAST(SUM(swings) AS BIGINT) AS t FROM sw)
        SELECT CAST(p AS BIGINT) AS player,
               CAST(l_suppkey AS BIGINT) AS suppkey,
               w AS weight, swings,
               CAST(swings * 1000 // t AS BIGINT) AS banzhaf_permille
        FROM sw CROSS JOIN tsw
        ORDER BY player
    """,
    description="Banzhaf voting-power index for the weighted majority "
    "game whose players are the 10 busiest suppliers (weight = lineitem "
    "count, quota = strict majority): a player's power is the number of "
    "coalitions it swings from losing to winning, normalized to "
    "permille. The fact-scale work is ONE count aggregation; the "
    f"2^{_BZ_PLAYERS} coalition enumeration runs distributed as a "
    "spark.range cross-join against the broadcast 10-row panel — "
    "constant work in SF, so at 100 TB the query costs exactly one "
    "pushed-down groupBy. Exposes the classic gap between weight share "
    "and actual pivotal power.",
)
def election_banzhaf_power_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    wts = (
        line.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .orderBy(F.desc("w"), "l_suppkey")
        .limit(_BZ_PLAYERS)
    )
    panel = wts.select(
        "l_suppkey",
        "w",
        F.row_number()
        .over(Window.orderBy(F.desc("w"), "l_suppkey"))
        .alias("p"),
    ).localCheckpoint(eager=False)
    st = panel.agg(
        F.expr("sum(w) div 2").cast("long").alias("half")
    ).select((F.col("half") + F.lit(1)).alias("quota"))
    masks = spark.range(2 ** _BZ_PLAYERS).select(F.col("id").alias("mask"))
    mw = (
        masks.join(
            F.broadcast(panel),
            F.expr("(shiftright(mask, p - 1) & 1) = 1"),
            "left",
        )
        .groupBy("mask")
        .agg(F.coalesce(F.sum("w").cast("long"), F.lit(0)).alias("ws"))
    )
    sw = (
        panel.crossJoin(F.broadcast(st))
        .join(
            mw,
            F.expr(
                "(shiftright(mask, p - 1) & 1) = 0"
                " and ws < quota and ws + w >= quota"
            ),
            "left",
        )
        .groupBy("p", "l_suppkey", "w")
        .agg(F.count("mask").cast("long").alias("swings"))
    )
    tsw = sw.agg(F.sum("swings").cast("long").alias("t"))
    return (
        sw.crossJoin(F.broadcast(tsw))
        .select(
            F.col("p").cast("long").alias("player"),
            F.col("l_suppkey").cast("long").alias("suppkey"),
            F.col("w").alias("weight"),
            "swings",
            F.expr("swings * 1000 div t").cast("long")
            .alias("banzhaf_permille"),
        )
        .orderBy("player")
    )


# ------------------------------------------ max clique census

_MC_NODES = 10

# undirected nation trade graph shared by the clique / min-cut / AGM
# queries: ONE fact-scale 4-table join + groupBy, then bounded algebra.
_UND_SQL = """
        flows AS MATERIALIZED (
            SELECT least(c.c_nationkey, s.s_nationkey) AS u,
                   greatest(c.c_nationkey, s.s_nationkey) AS v,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
            GROUP BY 1, 2
        )
"""


def _und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected nation trade weights (cents) — bounded <=300 rows."""
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn, sn = F.col("c_nationkey"), F.col("s_nationkey")
    return (
        line.join(orders, orders.o_orderkey == line.l_orderkey)
        .join(F.broadcast(customer), customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(supplier), supplier.s_suppkey == line.l_suppkey)
        .where(cn != sn)
        .groupBy(
            F.least(cn, sn).alias("u"), F.greatest(cn, sn).alias("v")
        )
        .agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("w"))
    )


@query(
    "graph_max_clique_enumeration",
    oracle=f"""
        WITH {_UND_SQL}, strength AS (
            SELECT n, CAST(SUM(w) AS BIGINT) AS s FROM (
                SELECT u AS n, w FROM flows
                UNION ALL SELECT v AS n, w FROM flows
            ) GROUP BY n
        ), panel AS MATERIALIZED (
            SELECT n, ROW_NUMBER() OVER (ORDER BY s DESC, n) AS p
            FROM strength ORDER BY s DESC, n LIMIT {_MC_NODES}
        ), pe AS MATERIALIZED (
            -- panel edges above 1.2x the mean panel-pair weight
            SELECT pu.p AS a, pv.p AS b, f.w
            FROM flows f
            JOIN panel pu ON pu.n = f.u JOIN panel pv ON pv.n = f.v
        ), est AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(w) AS BIGINT) AS tot FROM pe
        ), edges AS MATERIALIZED (
            SELECT a, b FROM pe CROSS JOIN est WHERE w * cnt * 5 >= 6 * tot
        ), km AS (
            SELECT m.range AS mask,
                   CAST(bit_count(m.range) AS BIGINT) AS k,
                   CAST(COUNT(e.a) AS BIGINT) AS ein
            FROM range({2 ** _MC_NODES}) m
            LEFT JOIN edges e ON ((m.range >> (e.a - 1)) & 1) = 1
                             AND ((m.range >> (e.b - 1)) & 1) = 1
            GROUP BY m.range
        )
        SELECT k AS clique_size, CAST(COUNT(*) AS BIGINT) AS n_cliques
        FROM km WHERE k >= 2 AND ein = k * (k - 1) // 2
        GROUP BY k ORDER BY clique_size
    """,
    description="Clique census (and therefore max clique) of the "
    "heavy-trade subgraph over the 10 strongest trading nations: edges "
    "are panel pairs whose trade weight is >= 1.2x the mean panel-pair "
    "weight; a vertex subset is a clique iff the edges inside it number "
    "exactly k(k-1)/2. Enumerates all 2^10 subsets distributed "
    "(spark.range x broadcast edge list, popcount via bit_count in both "
    "engines); NP-hardness is irrelevant at fixed panel size, and the "
    "fact-scale cost is the one trade aggregation — constant-time "
    "combinatorics at any corpus scale.",
)
def graph_max_clique_enumeration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    und = _und(spark, sf_dir).localCheckpoint(eager=False)
    strength = (
        und.select(F.col("u").alias("n"), "w")
        .unionAll(und.select(F.col("v").alias("n"), "w"))
        .groupBy("n")
        .agg(F.sum("w").cast("long").alias("s"))
    )
    panel = (
        strength.orderBy(F.desc("s"), "n")
        .limit(_MC_NODES)
        .select(
            "n",
            F.row_number().over(Window.orderBy(F.desc("s"), "n")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    pu = panel.select(F.col("n").alias("nu"), F.col("p").alias("a"))
    pv = panel.select(F.col("n").alias("nv"), F.col("p").alias("b"))
    pe = (
        und.join(F.broadcast(pu), F.col("nu") == F.col("u"))
        .join(F.broadcast(pv), F.col("nv") == F.col("v"))
        .select("a", "b", "w")
        .localCheckpoint(eager=False)
    )
    est = pe.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("w").cast("long").alias("tot"),
    )
    edges = (
        pe.crossJoin(F.broadcast(est))
        .where(F.col("w") * F.col("cnt") * 5 >= 6 * F.col("tot"))
        .select("a", "b")
    )
    masks = spark.range(2 ** _MC_NODES).select(F.col("id").alias("mask"))
    km = (
        masks.join(
            F.broadcast(edges),
            F.expr(
                "(shiftright(mask, a - 1) & 1) = 1"
                " and (shiftright(mask, b - 1) & 1) = 1"
            ),
            "left",
        )
        .groupBy("mask")
        .agg(F.count("a").cast("long").alias("ein"))
        .select(
            F.bit_count("mask").cast("long").alias("k"), "ein"
        )
    )
    return (
        km.where(
            (F.col("k") >= 2)
            & (F.col("ein") == F.expr("k * (k - 1) div 2"))
        )
        .groupBy(F.col("k").alias("clique_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cliques"))
        .orderBy("clique_size")
    )


# ------------------------------------------ s-t min cut enumeration

_CUT_FREE = 8


@query(
    "graph_mincut_subset_enumeration",
    oracle=f"""
        WITH {_UND_SQL}, stpair AS MATERIALIZED (
            SELECT u AS s, v AS t FROM flows
            ORDER BY w DESC, u, v LIMIT 1
        ), strength AS (
            SELECT n, CAST(SUM(w) AS BIGINT) AS str FROM (
                SELECT u AS n, w FROM flows
                UNION ALL SELECT v AS n, w FROM flows
            ) GROUP BY n
        ), freen AS MATERIALIZED (
            SELECT n, ROW_NUMBER() OVER (ORDER BY str DESC, n) AS p
            FROM strength CROSS JOIN stpair
            WHERE n <> s AND n <> t
            ORDER BY str DESC, n LIMIT {_CUT_FREE}
        ), pidx AS MATERIALIZED (
            -- s has index 0, t has index -1, free nodes 1..8
            SELECT s AS n, 0 AS p FROM stpair
            UNION ALL SELECT t, -1 FROM stpair
            UNION ALL SELECT n, p FROM freen
        ), pe AS MATERIALIZED (
            SELECT pu.p AS a, pv.p AS b, f.w
            FROM flows f
            JOIN pidx pu ON pu.n = f.u JOIN pidx pv ON pv.n = f.v
        ), cuts AS (
            SELECT m.range AS mask, CAST(SUM(e.w) AS BIGINT) AS cut
            FROM range({2 ** _CUT_FREE}) m JOIN pe e
              ON (CASE WHEN e.a = 0 THEN 1 WHEN e.a = -1 THEN 0
                       ELSE (m.range >> (e.a - 1)) & 1 END)
              <> (CASE WHEN e.b = 0 THEN 1 WHEN e.b = -1 THEN 0
                       ELSE (m.range >> (e.b - 1)) & 1 END)
            GROUP BY m.range
        ), best AS (
            SELECT MIN(cut) AS min_cut, MAX(cut) AS max_cut FROM cuts
        )
        SELECT CAST(s AS BIGINT) AS s_nation, CAST(t AS BIGINT) AS t_nation,
               b.min_cut AS min_cut_cents,
               CAST((SELECT COUNT(*) FROM cuts c
                     WHERE c.cut = b.min_cut) AS BIGINT) AS n_min_cuts,
               b.max_cut AS max_cut_cents
        FROM stpair CROSS JOIN best b
    """,
    description="Exact s-t minimum cut on the 10-node heavy-trade "
    "nation subgraph (s,t = the heaviest-trading pair; the other 8 "
    "panel slots go to the strongest remaining nations): enumerates "
    "all 2^8 bipartitions distributed and sums crossing edge weights "
    "— the max-flow value by duality, with no augmenting-path "
    "sequentialism. Fact-scale cost is the single trade aggregation; "
    "the 256 x <=45-edge cross-join is constant in SF. The panel-"
    "bounded analogue of community boundary detection a trade-flow "
    "monitor runs per snapshot.",
)
def graph_mincut_subset_enumeration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    und = _und(spark, sf_dir).localCheckpoint(eager=False)
    stpair = (
        und.orderBy(F.desc("w"), "u", "v")
        .limit(1)
        .select(F.col("u").alias("s"), F.col("v").alias("t"))
        .localCheckpoint(eager=False)
    )
    strength = (
        und.select(F.col("u").alias("n"), "w")
        .unionAll(und.select(F.col("v").alias("n"), "w"))
        .groupBy("n")
        .agg(F.sum("w").cast("long").alias("str"))
    )
    freen = (
        strength.crossJoin(F.broadcast(stpair))
        .where((F.col("n") != F.col("s")) & (F.col("n") != F.col("t")))
        .orderBy(F.desc("str"), "n")
        .limit(_CUT_FREE)
        .select(
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("str"), "n"))
            .alias("p"),
        )
    )
    pidx = (
        stpair.select(F.col("s").alias("n"), F.lit(0).alias("p"))
        .unionAll(stpair.select(F.col("t").alias("n"), F.lit(-1).alias("p")))
        .unionAll(freen.select("n", "p"))
        .localCheckpoint(eager=False)
    )
    pu = pidx.select(F.col("n").alias("nu"), F.col("p").alias("a"))
    pv = pidx.select(F.col("n").alias("nv"), F.col("p").alias("b"))
    pe = (
        und.join(F.broadcast(pu), F.col("nu") == F.col("u"))
        .join(F.broadcast(pv), F.col("nv") == F.col("v"))
        .select("a", "b", "w")
    )
    masks = spark.range(2 ** _CUT_FREE).select(F.col("id").alias("mask"))
    side_sql = (
        "(case when {0} = 0 then 1 when {0} = -1 then 0"
        " else shiftright(mask, {0} - 1) & 1 end)"
    )
    cuts = (
        masks.join(
            F.broadcast(pe),
            F.expr(side_sql.format("a") + " <> " + side_sql.format("b")),
        )
        .groupBy("mask")
        .agg(F.sum("w").cast("long").alias("cut"))
        .localCheckpoint(eager=False)
    )
    best = cuts.agg(
        F.min("cut").alias("min_cut"), F.max("cut").alias("max_cut")
    )
    nmin = (
        cuts.crossJoin(F.broadcast(best))
        .where(F.col("cut") == F.col("min_cut"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_min_cuts"))
    )
    return (
        stpair.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(nmin))
        .select(
            F.col("s").cast("long").alias("s_nation"),
            F.col("t").cast("long").alias("t_nation"),
            F.col("min_cut").alias("min_cut_cents"),
            "n_min_cuts",
            F.col("max_cut").alias("max_cut_cents"),
        )
    )


# ------------------------------------------ Wagner-Whitin lot sizing

_WW_PARTS = 5
_WW_SETUP = 100_000  # cents per order
_WW_HOLD = 10  # cents per unit-month
_WW_YEAR = 1997


@query(
    "inventory_wagner_whitin_lotsize",
    oracle=f"""
        WITH pp AS MATERIALIZED (
            SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_demand
            FROM lineitem GROUP BY 1
            ORDER BY total_demand DESC, l_partkey LIMIT {_WW_PARTS}
        ), dm AS MATERIALIZED (
            SELECT pp.l_partkey, m.range AS m, pp.total_demand,
                   COALESCE(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT),
                            0) AS d
            FROM pp CROSS JOIN range(1, 13) m
            LEFT JOIN lineitem l ON l.l_partkey = pp.l_partkey
                 AND year(CAST(l.l_shipdate AS DATE)) = {_WW_YEAR}
                 AND month(CAST(l.l_shipdate AS DATE)) = m.range
            GROUP BY 1, 2, 3
        ), lastord AS MATERIALIZED (
            -- last order month <= m for every (mask, m); month 1 always
            -- orders, month k>1 orders iff bit k-2 is set
            SELECT mk.range AS mask, m.range AS m,
                   MAX(o.range) AS lo
            FROM range(2048) mk CROSS JOIN range(1, 13) m
            JOIN range(1, 13) o ON o.range <= m.range
                 AND (o.range = 1 OR ((mk.range >> (o.range - 2)) & 1) = 1)
            GROUP BY 1, 2
        ), costs AS (
            SELECT dm.l_partkey, dm.total_demand, lo.mask,
                   CAST({_WW_SETUP} AS BIGINT)
                       * (1 + bit_count(lo.mask))
                   + CAST(SUM({_WW_HOLD} * dm.d * (dm.m - lo.lo))
                          AS BIGINT) AS cost,
                   CAST(1 + bit_count(lo.mask) AS BIGINT) AS setups
            FROM dm JOIN lastord lo ON lo.m = dm.m
            GROUP BY 1, 2, 3
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY l_partkey
                ORDER BY cost, setups, mask) AS rk
            FROM costs
        )
        SELECT CAST(r.l_partkey AS BIGINT) AS partkey, r.total_demand,
               r.cost AS opt_cost_cents, r.setups AS opt_setups,
               s.cost AS single_order_cost_cents,
               CAST({_WW_SETUP} * 12 AS BIGINT) AS monthly_order_cost_cents
        FROM ranked r
        JOIN costs s ON s.l_partkey = r.l_partkey AND s.mask = 0
        WHERE r.rk = 1
        ORDER BY partkey
    """,
    description="Wagner-Whitin optimal lot sizing for the 5 highest-"
    f"demand parts over the {_WW_YEAR} monthly demand vector (setup "
    f"{_WW_SETUP} cents/order, holding {_WW_HOLD} cents/unit-month): "
    "instead of the sequential DP, every one of the 2^11 order-month "
    "subsets (month 1 always orders) is costed DECLARATIVELY — a "
    "(mask, month) -> last-order-month table built from three bounded "
    "ranges, joined to the demand panel, holding cost = h*d*(m-last). "
    "Argmin per part with (cost, setups, mask) tie-break, plus the "
    "single-order and order-every-month baselines. Fact-scale work is "
    "one filtered demand aggregation; the 2048x12 enumeration is "
    "constant in SF.",
)
def inventory_wagner_whitin_lotsize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    pp = (
        line.groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
             .alias("total_demand"))
        .orderBy(F.desc("total_demand"), "l_partkey")
        .limit(_WW_PARTS)
        .localCheckpoint(eager=False)
    )
    months = spark.range(1, 13).select(F.col("id").alias("m"))
    ly = line.where(
        F.year(F.col("l_shipdate").cast("date")) == _WW_YEAR
    ).select(
        "l_partkey",
        F.month(F.col("l_shipdate").cast("date")).alias("lm"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    dm = (
        pp.crossJoin(months)
        .join(
            ly,
            (ly.l_partkey == pp.l_partkey) & (F.col("lm") == F.col("m")),
            "left",
        )
        .groupBy(pp.l_partkey, "m", "total_demand")
        .agg(F.coalesce(F.sum("q").cast("long"), F.lit(0)).alias("d"))
    )
    mk = spark.range(2048).select(F.col("id").alias("mask"))
    om = spark.range(1, 13).select(F.col("id").alias("o"))
    lastord = (
        mk.crossJoin(months)
        .join(
            F.broadcast(om),
            F.expr(
                "o <= m and (o = 1 or (shiftright(mask, o - 2) & 1) = 1)"
            ),
        )
        .groupBy("mask", "m")
        .agg(F.max("o").alias("lo"))
    )
    costs = (
        dm.join(lastord, "m")
        .groupBy("l_partkey", "total_demand", "mask")
        .agg(
            (
                F.lit(_WW_SETUP).cast("long")
                * (F.lit(1) + F.bit_count("mask"))
                + F.sum(
                    F.lit(_WW_HOLD) * F.col("d") * (F.col("m") - F.col("lo"))
                ).cast("long")
            ).alias("cost"),
            (F.lit(1) + F.bit_count("mask")).cast("long").alias("setups"),
        )
        .localCheckpoint(eager=False)
    )
    ranked = costs.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_partkey").orderBy("cost", "setups", "mask")
        ),
    ).where(F.col("rk") == 1)
    single = costs.where(F.col("mask") == 0).select(
        F.col("l_partkey").alias("sp"),
        F.col("cost").alias("single_order_cost_cents"),
    )
    return (
        ranked.join(single, ranked.l_partkey == F.col("sp"))
        .select(
            F.col("l_partkey").cast("long").alias("partkey"),
            "total_demand",
            F.col("cost").alias("opt_cost_cents"),
            F.col("setups").alias("opt_setups"),
            "single_order_cost_cents",
            F.lit(_WW_SETUP * 12).cast("long")
            .alias("monthly_order_cost_cents"),
        )
        .orderBy("partkey")
    )


# ------------------------------------------ secretary-rule replay

_SEC_MIN_N = 8


@query(
    "opt_secretary_rule_replay",
    oracle=f"""
        WITH seq AS MATERIALIZED (
            SELECT o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
                       AS cents,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS n
            FROM orders
        ), scored AS (
            SELECT o_custkey, rn, cents, n,
                   GREATEST(1, n * 37 // 100) AS r,
                   MAX(CASE WHEN rn <= GREATEST(1, n * 37 // 100)
                            THEN cents END)
                       OVER (PARTITION BY o_custkey) AS phase_max,
                   MAX(cents) OVER (PARTITION BY o_custkey) AS best
            FROM seq WHERE n >= {_SEC_MIN_N}
        ), picked AS (
            SELECT o_custkey, n, r, best,
                   COALESCE(MIN(CASE WHEN rn > r AND cents > phase_max
                                     THEN rn END), n) AS pick_rn
            FROM scored GROUP BY 1, 2, 3, 4, phase_max
        ), outcome AS (
            SELECT p.o_custkey, p.n,
                   CASE WHEN s.cents = p.best THEN 1 ELSE 0 END AS success
            FROM picked p
            JOIN scored s ON s.o_custkey = p.o_custkey AND s.rn = p.pick_rn
        )
        SELECT CASE WHEN n < 10 THEN '08-09'
                    WHEN n < 12 THEN '10-11' ELSE '12+' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(success) AS BIGINT) AS n_success,
               CAST(SUM(success) * 1000 // COUNT(*) AS BIGINT)
                   AS success_permille,
               CAST(SUM(1000 // n) // COUNT(*) AS BIGINT)
                   AS random_baseline_permille
        FROM outcome GROUP BY 1 ORDER BY bucket
    """,
    description="Optimal-stopping (secretary-rule) replay over every "
    "customer's order sequence (n >= 8 orders, ordered by date then "
    "key): observe the first floor(0.37n) orders, then pick the first "
    "later order beating the observation-phase max (fall back to the "
    "last order). Success = the picked order ties the customer's true "
    "maximum. Reports per-sequence-length-bucket success permille vs "
    "the 1/n random-pick baseline — the classic ~37% guarantee made "
    "measurable. Single pass: three windows partitioned by the "
    "customer key, no joins of fact-scale relations, shuffle-safe at "
    "any SF.",
)
def opt_secretary_rule_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey")
    seq = orders.select(
        "o_custkey",
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
        F.row_number()
        .over(wc.orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    scored = seq.where(F.col("n") >= _SEC_MIN_N).select(
        "*",
        F.greatest(F.lit(1), F.expr("n * 37 div 100")).alias("r"),
    )
    scored = scored.select(
        "*",
        F.max(F.when(F.col("rn") <= F.col("r"), F.col("cents")))
        .over(wc)
        .alias("phase_max"),
        F.max("cents").over(wc).alias("best"),
    )
    picked = scored.groupBy("o_custkey", "n", "r", "best", "phase_max").agg(
        F.coalesce(
            F.min(
                F.when(
                    (F.col("rn") > F.col("r"))
                    & (F.col("cents") > F.col("phase_max")),
                    F.col("rn"),
                )
            ),
            F.col("n").cast("long"),
        ).alias("pick_rn")
    )
    outcome = picked.join(
        scored.select(
            F.col("o_custkey").alias("ck"),
            F.col("rn").alias("prn"),
            F.col("cents").alias("pick_cents"),
        ),
        (F.col("ck") == F.col("o_custkey")) & (F.col("prn") == F.col("pick_rn")),
    ).select(
        "n",
        F.when(F.col("pick_cents") == F.col("best"), 1)
        .otherwise(0)
        .alias("success"),
    )
    return (
        outcome.groupBy(
            F.when(F.col("n") < 10, "08-09")
            .when(F.col("n") < 12, "10-11")
            .otherwise("12+")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("success").cast("long").alias("n_success"),
            F.expr("sum(success) * 1000 div count(*)").cast("long")
            .alias("success_permille"),
            F.expr("sum(1000 div n) div count(*)").cast("long")
            .alias("random_baseline_permille"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------ WFQ conformance

_WFQ_CAP = 1200  # audited items per flow (bounded window)


@query(
    "sched_wfq_virtual_finish",
    oracle=f"""
        WITH items AS MATERIALIZED (
            SELECT l_suppkey,
                   1 + l_suppkey % 4 AS wt,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS k
            FROM lineitem WHERE l_suppkey <= 10
        ), capped AS MATERIALIZED (
            SELECT l_suppkey, wt, k, k * 12 // wt AS vfinish
            FROM items WHERE k <= {_WFQ_CAP}
        ), sched AS (
            SELECT l_suppkey, wt,
                   ROW_NUMBER() OVER (ORDER BY vfinish, l_suppkey, k) AS pos
            FROM capped
        ), st AS (
            SELECT CAST(COUNT(*) AS BIGINT) // 2 AS half FROM sched
        ), wsum AS (
            SELECT CAST(SUM(wt) AS BIGINT) AS tw
            FROM (SELECT DISTINCT l_suppkey, wt FROM capped)
        )
        SELECT CAST(s.l_suppkey AS BIGINT) AS suppkey,
               CAST(MAX(s.wt) AS BIGINT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN s.pos <= st.half THEN 1 ELSE 0 END)
                    AS BIGINT) AS served_first_half,
               CAST(SUM(CASE WHEN s.pos <= st.half THEN 1 ELSE 0 END)
                    * 1000 // st.half AS BIGINT) AS share_permille,
               CAST(MAX(s.wt) * 1000 // MAX(w.tw) AS BIGINT)
                   AS weight_share_permille,
               CAST(ABS(SUM(CASE WHEN s.pos <= st.half THEN 1 ELSE 0 END)
                        * 1000 // st.half
                        - MAX(s.wt) * 1000 // MAX(w.tw)) AS BIGINT)
                   AS deviation_permille
        FROM sched s CROSS JOIN st CROSS JOIN wsum w
        GROUP BY s.l_suppkey, st.half ORDER BY suppkey
    """,
    description="Weighted-fair-queueing conformance audit: suppliers "
    "1..10 are flows with weights 1 + key%4; each flow's items (ship "
    "order) get virtual finish times k*12//w (12 = lcm of the weights, "
    "so finishes are exact integers) and the global WFQ schedule is "
    "the rank by (finish, flow, k). The audit checks each flow's share "
    "of the first half of the schedule against its weight share — WFQ's "
    "bounded-unfairness guarantee as data. The per-flow numbering is a "
    f"partitioned window; the global rank runs on <= 10x{_WFQ_CAP} "
    "capped rows (the audit window), so the unpartitioned sort is "
    "constant-size at any SF.",
)
def sched_wfq_virtual_finish(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    items = (
        line.where(F.col("l_suppkey") <= 10)
        .select(
            "l_suppkey",
            (F.lit(1) + F.col("l_suppkey") % 4).alias("wt"),
            F.row_number()
            .over(
                Window.partitionBy("l_suppkey").orderBy(
                    "l_shipdate", "l_orderkey", "l_linenumber"
                )
            )
            .alias("k"),
        )
        .where(F.col("k") <= _WFQ_CAP)
        .select("*", F.expr("k * 12 div wt").alias("vfinish"))
    )
    sched = items.select(
        "l_suppkey",
        "wt",
        F.row_number()
        .over(Window.orderBy("vfinish", "l_suppkey", "k"))
        .alias("pos"),
    ).localCheckpoint(eager=False)
    st = sched.agg(F.expr("count(*) div 2").cast("long").alias("half"))
    wsum = (
        items.select("l_suppkey", "wt")
        .distinct()
        .agg(F.sum("wt").cast("long").alias("tw"))
    )
    served = F.sum(F.when(F.col("pos") <= F.col("half"), 1).otherwise(0))
    return (
        sched.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(wsum))
        .groupBy(F.col("l_suppkey"), F.col("half"))
        .agg(
            F.max("wt").cast("long").alias("weight"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
            served.cast("long").alias("served_first_half"),
            F.expr(
                "sum(case when pos <= half then 1 else 0 end)"
                " * 1000 div half"
            ).cast("long").alias("share_permille"),
            F.expr("max(wt) * 1000 div max(tw)").cast("long")
            .alias("weight_share_permille"),
            F.abs(
                F.expr(
                    "sum(case when pos <= half then 1 else 0 end)"
                    " * 1000 div half - max(wt) * 1000 div max(tw)"
                )
            ).cast("long").alias("deviation_permille"),
        )
        .select(
            F.col("l_suppkey").cast("long").alias("suppkey"),
            "weight", "n_items", "served_first_half", "share_permille",
            "weight_share_permille", "deviation_permille",
        )
        .orderBy("suppkey")
    )


# ------------------------------------------ uniform-price auction

_AUC_YEAR = 1995


@query(
    "auction_uniform_price_clearing",
    oracle=f"""
        WITH bids AS MATERIALIZED (
            SELECT year(CAST(o_orderdate AS DATE)) * 100
                       + month(CAST(o_orderdate AS DATE)) AS ym,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
                       AS cents,
                   o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY year(CAST(o_orderdate AS DATE)) * 100
                                  + month(CAST(o_orderdate AS DATE))
                       ORDER BY CAST(CAST(o_totalprice AS DECIMAL(15,2))
                                     * 100 AS BIGINT) DESC, o_orderkey)
                       AS rk,
                   COUNT(*) OVER (
                       PARTITION BY year(CAST(o_orderdate AS DATE)) * 100
                                  + month(CAST(o_orderdate AS DATE))) AS n
            FROM orders
            WHERE year(CAST(o_orderdate AS DATE)) = {_AUC_YEAR}
        )
        SELECT CAST(ym AS BIGINT) AS ym,
               CAST(MAX(n) AS BIGINT) AS n_bids,
               CAST(MAX(n) // 10 AS BIGINT) AS k_supply,
               CAST(MAX(CASE WHEN rk = n // 10 + 1 THEN cents END)
                    AS BIGINT) AS clearing_cents,
               CAST((MAX(n) // 10)
                    * MAX(CASE WHEN rk = n // 10 + 1 THEN cents END)
                    AS BIGINT) AS revenue_cents,
               CAST(SUM(CASE WHEN rk <= n // 10 THEN cents ELSE 0 END)
                    - (MAX(n) // 10)
                    * MAX(CASE WHEN rk = n // 10 + 1 THEN cents END)
                    AS BIGINT) AS bidder_surplus_cents
        FROM bids GROUP BY ym ORDER BY ym
    """,
    description=f"Uniform-price multi-unit auction clearing, one "
    f"auction per month of {_AUC_YEAR}: every order is a single-unit "
    "bid at its total price; supply is 10% of the bids; the market-"
    "clearing price is the first REJECTED bid (rank K+1, the multi-"
    "unit Vickrey convention), so winners are the top-K bids with "
    "deterministic orderkey tie-break. Emits clearing price, auction "
    "revenue, and inframarginal bidder surplus per month. One ranking "
    "window partitioned by month over a year-pruned scan — the "
    "pushed-down filter makes the fact cost proportional to one year "
    "regardless of corpus size.",
)
def auction_uniform_price_clearing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    bids = (
        orders.where(F.year(od) == _AUC_YEAR)
        .select(
            (F.year(od) * 100 + F.month(od)).alias("ym"),
            (dec("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        )
    )
    wym = Window.partitionBy("ym")
    bids = bids.select(
        "ym",
        "cents",
        F.row_number()
        .over(wym.orderBy(F.desc("cents"), "o_orderkey"))
        .alias("rk"),
        F.count(F.lit(1)).over(wym).alias("n"),
    )
    k = F.expr("max(n) div 10")
    clearing = F.max(
        F.when(F.col("rk") == F.expr("n div 10 + 1"), F.col("cents"))
    )
    return (
        bids.groupBy(F.col("ym").cast("long").alias("ym"))
        .agg(
            F.max("n").cast("long").alias("n_bids"),
            k.cast("long").alias("k_supply"),
            clearing.cast("long").alias("clearing_cents"),
            (k * clearing).cast("long").alias("revenue_cents"),
            (
                F.sum(
                    F.when(
                        F.col("rk") <= F.expr("n div 10"), F.col("cents")
                    ).otherwise(0)
                )
                - k * clearing
            ).cast("long").alias("bidder_surplus_cents"),
        )
        .orderBy("ym")
    )


# ------------------------------------------ airport-game Shapley


@query(
    "alloc_airport_game_shapley",
    oracle="""
        WITH costs AS MATERIALIZED (
            SELECT p.p_brand,
                   CAST(MAX(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS c
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        ), ordered AS (
            SELECT p_brand, c,
                   ROW_NUMBER() OVER (ORDER BY c, p_brand) AS j,
                   COUNT(*) OVER () AS n,
                   COALESCE(LAG(c) OVER (ORDER BY c, p_brand), 0) AS prev
            FROM costs
        ), terms AS (
            SELECT p_brand, c, j, n,
                   (c - prev) * 1000 // (n - j + 1) AS term
            FROM ordered
        )
        SELECT p_brand AS brand, c AS cost_cents,
               CAST(SUM(term) OVER (ORDER BY j
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS shapley_millicents
        FROM terms ORDER BY brand
    """,
    description="Airport-game cost sharing via the CLOSED-FORM Shapley "
    "value: brands are players whose 'runway length' is the max line "
    "price (cents) over their parts; sorting costs ascending, each "
    "increment c_j - c_(j-1) is split equally (integer millicents, "
    "truncation division) among the n-j+1 players needing at least "
    "that much, and a player's share is the running sum of its prefix "
    "— the O(n log n) formula that makes exact-enumeration Shapley "
    "(2^n, cf. attribution_shapley_exact) unnecessary when the game is "
    "a cost ladder. One fact-scale max aggregation; the ladder is the "
    "bounded brand panel.",
)
def alloc_airport_game_shapley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    costs = (
        line.join(F.broadcast(part), part.p_partkey == line.l_partkey)
        .groupBy("p_brand")
        .agg(F.max(dec("l_extendedprice") * 100).cast("long").alias("c"))
    )
    wo = Window.orderBy("c", "p_brand")
    ordered = costs.select(
        "p_brand",
        "c",
        F.row_number().over(wo).alias("j"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        F.coalesce(F.lag("c").over(wo), F.lit(0)).alias("prev"),
    )
    terms = ordered.select(
        "p_brand",
        "c",
        "j",
        F.expr("(c - prev) * 1000 div (n - j + 1)").alias("term"),
    )
    return terms.select(
        F.col("p_brand").alias("brand"),
        F.col("c").alias("cost_cents"),
        F.sum("term")
        .over(
            Window.orderBy("j").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
        .alias("shapley_millicents"),
    ).orderBy("brand")


# ------------------------------------------ AGM bound audit


@query(
    "optimizer_agm_bound_audit",
    oracle=f"""
        WITH {_UND_SQL}, edges AS MATERIALIZED (
            SELECT u, v FROM flows
        ), deg AS MATERIALIZED (
            SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
            ) GROUP BY n
        ), tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ), ecnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS e FROM edges),
        mdb AS (
            SELECT CAST(SUM(LEAST(du.d, dv.d) - 1) // 3 AS BIGINT) AS b
            FROM edges e
            JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
        )
        SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
               ecnt.e AS n_edges, tri.t AS triangles,
               CAST(FLOOR(SQRT(CAST(ecnt.e AS DOUBLE))
                          * CAST(ecnt.e AS DOUBLE)) AS BIGINT)
                   AS agm_bound,
               mdb.b AS mindeg_bound,
               CAST(CAST(FLOOR(SQRT(CAST(ecnt.e AS DOUBLE))
                               * CAST(ecnt.e AS DOUBLE)) AS BIGINT)
                    * 1000000 // GREATEST(tri.t, 1) AS BIGINT)
                   AS agm_qerr_micro,
               CAST(mdb.b * 1000000 // GREATEST(tri.t, 1) AS BIGINT)
                   AS mindeg_qerr_micro
        FROM ecnt CROSS JOIN tri CROSS JOIN mdb
    """,
    description="AGM-bound cardinality audit on the nation trade "
    "graph's triangle query: the worst-case-optimal-join bound "
    "|E|^(3/2) and the per-edge min-degree bound sum(min(deg_u,deg_v)"
    "-1)//3 versus the exact triangle count, each as a q-error in "
    "micro units. The floor(sqrt(e)*e) expression is evaluated with "
    "the identical double operation order in both engines. This is "
    "the estimate-vs-truth audit a cost-based optimizer needs before "
    "trusting a join-order plan for cyclic queries; the graph is the "
    "bounded nation panel, so the audit adds one trade aggregation to "
    "a constant-size join.",
)
def optimizer_agm_bound_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    und = _und(spark, sf_dir).localCheckpoint(eager=False)
    edges = und.select("u", "v")
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b2") == F.col("b"))
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    ecnt = edges.agg(F.count(F.lit(1)).cast("long").alias("e"))
    du = deg.select(F.col("n").alias("nu"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("nv"), F.col("d").alias("dv"))
    mdb = (
        edges.join(F.broadcast(du), F.col("nu") == F.col("u"))
        .join(F.broadcast(dv), F.col("nv") == F.col("v"))
        .agg(
            F.expr("cast(sum(least(du, dv) - 1) div 3 as bigint)").alias("b")
        )
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    agm = F.floor(
        F.sqrt(F.col("e").cast("double")) * F.col("e").cast("double")
    ).cast("long")
    return (
        ecnt.crossJoin(tri)
        .crossJoin(mdb)
        .crossJoin(nn)
        .select(
            "n_nodes",
            F.col("e").alias("n_edges"),
            F.col("t").alias("triangles"),
            agm.alias("agm_bound"),
            F.col("b").alias("mindeg_bound"),
            F.expr(
                "cast(cast(floor(sqrt(cast(e as double)) * cast(e as double))"
                " as bigint) * 1000000 div greatest(t, 1) as bigint)"
            ).alias("agm_qerr_micro"),
            F.expr("cast(b * 1000000 div greatest(t, 1) as bigint)")
            .alias("mindeg_qerr_micro"),
        )
    )
