"""Wave-162 (round 5): bipartite link analysis + survey design.

* ``graph_hits_bipartite_counts`` — HITS-style hub/authority scoring
  on the customer-part purchase graph, kept EXACT by using the
  un-normalized power-iteration integers: hub_0 = 1, authority(p) =
  sum of hub-degree over buyers, hub_2(c) = sum of authority over
  bought parts — the count of length-2 alternating paths ending at
  each node. Two aggregated joins, never a path materialization.

* ``sampling_neyman_allocation`` — textbook survey design: allocate a
  fixed interview budget across strata proportionally to N_h (size)
  vs N_h * S_h (Neyman-optimal). Within-stratum SDs use the exact
  integer variance numerator (DECIMAL(38)) and ONE floor(IEEE sqrt)
  on a < 2^53 radicand (the repo's bit-portable sqrt convention);
  both allocations are rounded by the shared largest-remainder
  operator, so each sums to the budget exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.money import allocate_largest_remainder
from ..sources.tables import load_table
from .registry import query

_HITS_TOPK = 10


@query(
    "graph_hits_bipartite_counts",
    oracle=f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), hub0 AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY c
        ), auth AS (
            SELECT e.p, CAST(SUM(h.deg) AS BIGINT) AS a1
            FROM edges e JOIN hub0 h ON h.c = e.c
            GROUP BY e.p
        ), hub2 AS (
            SELECT e.c, CAST(SUM(a.a1) AS BIGINT) AS h2
            FROM edges e JOIN auth a ON a.p = e.p
            GROUP BY e.c
        ), top_hubs AS (
            SELECT 'hub' AS kind, c AS node, h2 AS score,
                   ROW_NUMBER() OVER (ORDER BY h2 DESC, c) AS rnk
            FROM hub2
        ), top_auths AS (
            SELECT 'authority' AS kind, p AS node, a1 AS score,
                   ROW_NUMBER() OVER (ORDER BY a1 DESC, p) AS rnk
            FROM auth
        )
        SELECT kind, CAST(node AS BIGINT) AS node,
               CAST(score AS BIGINT) AS score,
               CAST(rnk AS BIGINT) AS rnk
        FROM (SELECT * FROM top_hubs WHERE rnk <= {_HITS_TOPK}
              UNION ALL
              SELECT * FROM top_auths WHERE rnk <= {_HITS_TOPK})
        ORDER BY kind, rnk
    """,
    description="HITS hub/authority on the bipartite customer-part "
    "purchase graph, exact by construction: instead of the float "
    "eigenvector, score with the un-normalized power-iteration "
    "integers — authority(p) = sum of buyer degrees, hub_2(c) = sum "
    "of authority over bought parts = the number of length-2 "
    "alternating paths at each node. Two aggregated joins on the "
    "deduped edge table; paths are COUNTED via aggregation, never "
    "materialized, so the shuffle is O(edges) per round. Top-10 per "
    "side with deterministic key tie-breaks. 100 TB shape: edge "
    "dedup is one shuffle, each iteration is one partial-agg join "
    "(the same shape PageRank uses here), and deeper iterations "
    "would ride DECIMAL(38) before any normalization is needed — "
    "the influencer/catalog-anchor detector for purchase graphs.",
)
def graph_hits_bipartite_counts(
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
        .localCheckpoint(eager=False)  # edge table feeds 3 joins
    )
    hub0 = edges.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    auth = (
        edges.join(hub0, "c")
        .groupBy("p")
        .agg(F.sum("deg").cast("long").alias("a1"))
        .localCheckpoint(eager=False)  # feeds hub2 + its own top-k
    )
    hub2 = (
        edges.join(auth, "p")
        .groupBy("c")
        .agg(F.sum("a1").cast("long").alias("h2"))
    )
    top_hubs = (
        hub2.select(
            F.lit("hub").alias("kind"),
            F.col("c").alias("node"),
            F.col("h2").alias("score"),
        )
    )
    top_auths = auth.select(
        F.lit("authority").alias("kind"),
        F.col("p").alias("node"),
        F.col("a1").alias("score"),
    )
    rw = Window.partitionBy("kind").orderBy(
        F.col("score").desc(), F.col("node")
    )
    return (
        top_hubs.unionAll(top_auths)
        .withColumn("rnk", F.row_number().over(rw).cast("long"))
        .where(F.col("rnk") <= _HITS_TOPK)
        .select(
            "kind",
            F.col("node").cast("long").alias("node"),
            F.col("score").cast("long").alias("score"),
            "rnk",
        )
        .orderBy("kind", "rnk")
    )


_NEYMAN_BUDGET = 10_000


@query(
    "sampling_neyman_sd_allocation",
    oracle=f"""
        WITH strata AS (
            SELECT l_returnflag AS rf, l_linestatus AS ls,
                   CAST(COUNT(*) AS BIGINT) AS n_h,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS HUGEINT) AS sx,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                            * 100 AS HUGEINT)
                            * CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                            * 100 AS HUGEINT)) AS HUGEINT) AS sx2
            FROM lineitem GROUP BY 1, 2
        ), sds AS (
            SELECT rf, ls, n_h,
                   CAST(FLOOR(SQRT(CAST((n_h * sx2 - sx * sx)
                        // (n_h * (n_h - 1)) AS DOUBLE))) AS BIGINT)
                       AS sd_floor
            FROM strata
        ), weighted AS (
            SELECT rf, ls, n_h, sd_floor,
                   n_h * sd_floor AS w_ney,
                   SUM(n_h) OVER () AS tot_n,
                   SUM(n_h * sd_floor) OVER () AS tot_w
            FROM sds
        ), based AS (
            SELECT rf, ls, n_h, sd_floor,
                   ({_NEYMAN_BUDGET} * n_h) // tot_n AS base_p,
                   ({_NEYMAN_BUDGET} * n_h) % tot_n AS rem_p,
                   ({_NEYMAN_BUDGET} * w_ney) // tot_w AS base_n,
                   ({_NEYMAN_BUDGET} * w_ney) % tot_w AS rem_n,
                   SUM(({_NEYMAN_BUDGET} * n_h) // tot_n) OVER ()
                       AS sb_p,
                   SUM(({_NEYMAN_BUDGET} * w_ney) // tot_w) OVER ()
                       AS sb_n,
                   ROW_NUMBER() OVER (ORDER BY ({_NEYMAN_BUDGET} * n_h)
                       % tot_n DESC, rf, ls) AS rr_p,
                   ROW_NUMBER() OVER (ORDER BY ({_NEYMAN_BUDGET} * w_ney)
                       % tot_w DESC, rf, ls) AS rr_n
            FROM weighted
        )
        SELECT rf, ls, n_h, sd_floor,
               CAST(base_p + CASE WHEN rr_p <= {_NEYMAN_BUDGET} - sb_p
                    THEN 1 ELSE 0 END AS BIGINT) AS proportional_n,
               CAST(base_n + CASE WHEN rr_n <= {_NEYMAN_BUDGET} - sb_n
                    THEN 1 ELSE 0 END AS BIGINT) AS neyman_n
        FROM based
        ORDER BY rf, ls
    """,
    description="Neyman-optimal vs proportional survey allocation "
    "(upgrading sampling_neyman_allocation's cent-range spread proxy "
    "to the TRUE within-stratum SD) "
    "over (returnflag, linestatus) strata: within-stratum SD from "
    "the exact integer variance numerator n*SUM(x^2)-SUM(x)^2 in "
    "DECIMAL(38)/HUGEINT cents^2, divided down to a < 2^53 radicand "
    "and passed through ONE floor(IEEE-correct sqrt) — the repo's "
    "bit-portable sqrt convention — then both allocations of the "
    "10000-interview budget are rounded largest-remainder so each "
    "sums to the budget EXACTLY (the shared money operator). 100 TB "
    "shape: one map-side partial agg to the handful of strata "
    "(sum/sumsq/count commute with partial aggregation); everything "
    "after is bounded-row arithmetic — the stratified-sampling "
    "designer for any petabyte labeling or audit campaign.",
)
def sampling_neyman_sd_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS DECIMAL(38,0))"
    strata = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.expr(f"SUM({cents})").alias("sx"),
        F.expr(f"SUM({cents} * {cents})").alias("sx2"),
    )
    sds = strata.select(
        "rf",
        "ls",
        "n_h",
        F.expr(
            "CAST(FLOOR(SQRT(CAST((n_h * sx2 - sx * sx)"
            " div (CAST(n_h AS DECIMAL(38,0)) * (n_h - 1))"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("sd_floor"),
    ).localCheckpoint(eager=False)  # bounded strata feed 2 allocations
    keyed = sds.select(
        "rf",
        "ls",
        "n_h",
        "sd_floor",
        F.lit("all").alias("grp"),
        F.lit(_NEYMAN_BUDGET).cast("long").alias("budget"),
        (F.col("n_h") * F.col("sd_floor")).alias("w_ney"),
    )
    prop = allocate_largest_remainder(
        keyed.withColumn("tb", F.concat("rf", "ls")),
        key="grp",
        weight="n_h",
        total="budget",
        tiebreak="tb",
        out="proportional_n",
    ).select("rf", "ls", "proportional_n")
    ney = allocate_largest_remainder(
        keyed.withColumn("tb", F.concat("rf", "ls")),
        key="grp",
        weight="w_ney",
        total="budget",
        tiebreak="tb",
        out="neyman_n",
    ).select("rf", "ls", "neyman_n")
    return (
        sds.join(prop, ["rf", "ls"])
        .join(ney, ["rf", "ls"])
        .select(
            "rf",
            "ls",
            "n_h",
            "sd_floor",
            F.col("proportional_n").cast("long").alias("proportional_n"),
            F.col("neyman_n").cast("long").alias("neyman_n"),
        )
        .orderBy("rf", "ls")
    )
