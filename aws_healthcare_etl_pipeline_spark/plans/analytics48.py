"""Wave-74 (round 5): pre-aggregated serving layer + mix-shift watch.

* ``serving_hierarchical_range_sums`` — the serving-layer pattern
  behind Druid/cube stores: power-of-two block sums (1/2/4/.../64-day
  blocks) are materialized over the day-index spine, and a battery of
  ad-hoc ranges is answered by decomposing each range into O(log n)
  CANONICAL blocks — never touching day rows. The oracle answers the
  same ranges directly from the daily table, so the hash match proves
  the segment-tree decomposition exact. Integer cents throughout.
* ``orders_priority_mix_shift`` — month-over-month order-priority mix
  monitor: the L1 distance between consecutive months' priority
  distributions, cross-multiplied to integers (|c_m*n_p - c_p*n_m|
  summed over priorities), flagging months whose mix moved more than
  10% — the distribution-shift tripwire for categorical columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------- hierarchical range-sum serving

_SRV_MAX_LEVEL = 6  # block sizes 2^0 .. 2^6

# query battery: [lo, hi] inclusive day-index ranges (0-based)
_SRV_RANGES = [
    ("r_week", 3, 9),
    ("r_month", 10, 40),
    ("r_quarter", 7, 97),
    ("r_long", 1, 321),
    ("r_aligned", 64, 127),
    ("r_point", 55, 55),
]


def _canonical_blocks(lo: int, hi: int) -> list[tuple[int, int]]:
    """Decompose [lo, hi] into canonical power-of-two blocks
    (level, start) greedily — the segment-serving read path."""
    blocks = []
    i = lo
    while i <= hi:
        lvl = _SRV_MAX_LEVEL
        while lvl > 0 and (i % (1 << lvl) != 0 or i + (1 << lvl) - 1 > hi):
            lvl -= 1
        blocks.append((lvl, i))
        i += 1 << lvl
    return blocks


def _srv_oracle() -> str:
    parts = []
    for label, lo, hi in _SRV_RANGES:
        parts.append(f"""
        SELECT '{label}' AS range_label,
               CAST({lo} AS BIGINT) AS lo, CAST({hi} AS BIGINT) AS hi,
               CAST(COALESCE(SUM(CASE WHEN di BETWEEN {lo} AND {hi}
                                      THEN cents ELSE 0 END), 0) AS BIGINT)
                   AS range_cents,
               CAST({len(_canonical_blocks(lo, hi))} AS BIGINT)
                   AS blocks_read
        FROM daily""")
    return f"""
        WITH daily AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate) - 1
                        AS BIGINT) AS di,
                   cents
            FROM (
                SELECT o_orderdate,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                            AS BIGINT) AS cents
                FROM orders GROUP BY o_orderdate
            )
        )
        SELECT * FROM ({" UNION ALL ".join(parts)}) ORDER BY range_label
    """


@query(
    "serving_hierarchical_range_sums",
    oracle=_srv_oracle(),
    description="Pre-aggregated serving layer: power-of-two block sums "
    "(1- through 64-day blocks) are materialized over the day-index "
    "spine in one pass per level (each level a groupBy on di div "
    "2^k), and an ad-hoc range battery is answered by greedy "
    "CANONICAL-block decomposition — O(log n) block lookups per "
    "range, never re-touching day rows; the oracle answers the same "
    "ranges directly from the daily table, so the hash match PROVES "
    "the segment decomposition (blocks_read documents the touched-"
    "block count per range). This is the Druid/cube read path: at "
    "100 TB the day rollup is the only fact-scale pass, the level "
    "tables are metadata-sized, and every dashboard range costs "
    "log-many lookups instead of a scan.",
)
def serving_hierarchical_range_sums(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents")
        )
        .select(
            (F.row_number().over(Window.orderBy("o_orderdate")) - 1)
            .cast("long")
            .alias("di"),
            "cents",
        )
    )
    # materialize the level tables (the serving layer build)
    levels = {}
    for lvl in range(_SRV_MAX_LEVEL + 1):
        size = 1 << lvl
        levels[lvl] = (
            daily.groupBy(
                F.expr(f"di div {size}").cast("long").alias("b")
            )
            .agg(F.sum("cents").cast("long").alias("s"))
            .withColumn("lvl", F.lit(lvl))
        )
    blocks_all = reduce(DataFrame.unionByName, levels.values()).cache()
    outs = []
    for label, lo, hi in _SRV_RANGES:
        blocks = _canonical_blocks(lo, hi)
        cond = reduce(
            lambda a, b: a | b,
            [
                (F.col("lvl") == lvl) & (F.col("b") == start >> lvl)
                for lvl, start in blocks
            ],
        )
        outs.append(
            blocks_all.filter(cond).agg(
                F.lit(label).alias("range_label"),
                F.lit(lo).cast("long").alias("lo"),
                F.lit(hi).cast("long").alias("hi"),
                F.coalesce(F.sum("s"), F.lit(0))
                .cast("long")
                .alias("range_cents"),
                F.lit(len(blocks)).cast("long").alias("blocks_read"),
            )
        )
    out = reduce(DataFrame.unionByName, outs).orderBy("range_label")
    return out


# ---------------------------------------------- priority mix shift


@query(
    "orders_priority_mix_shift",
    oracle="""
        WITH pm AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS mon,
                   o_orderpriority AS pri,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        ), mt AS (
            SELECT mon, SUM(c) AS n,
                   LAG(mon) OVER (ORDER BY mon) AS prev_mon
            FROM pm GROUP BY mon
        ), joined AS (
            SELECT m.mon, m.n AS n_cur, p.n AS n_prev,
                   COALESCE(cur.c, 0) AS c_cur, COALESCE(prv.c, 0) AS c_prv,
                   pri.pri
            FROM mt m
            JOIN mt p ON p.mon = m.prev_mon
            CROSS JOIN (SELECT DISTINCT pri FROM pm) pri
            LEFT JOIN pm cur ON cur.mon = m.mon AND cur.pri = pri.pri
            LEFT JOIN pm prv ON prv.mon = m.prev_mon AND prv.pri = pri.pri
        )
        SELECT mon,
               CAST(MAX(n_cur) AS BIGINT) AS n_orders,
               CAST(SUM(ABS(c_cur * n_prev - c_prv * n_cur)) AS BIGINT)
                   AS l1_shift_scaled,
               (10 * SUM(ABS(c_cur * n_prev - c_prv * n_cur)))
                   > (MAX(n_cur) * MAX(n_prev)) AS shifted
        FROM joined GROUP BY mon ORDER BY mon
    """,
    description="Month-over-month order-priority mix monitor: the L1 "
    "distance between consecutive months' priority distributions, "
    "cross-multiplied to integers (sum |c_cur*n_prev - c_prev*n_cur| "
    "over priorities) with a 10% tripwire compared the same way — the "
    "categorical distribution-shift alarm a pipeline runs on every "
    "enum column before a model retrain. At 100 TB: one partial-agg "
    "shuffle to (month, priority) counts; everything downstream — "
    "month totals, the lag join, the 5-priority grid — is metadata-"
    "sized, and no float rate ever materializes.",
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pm = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    mt = (
        pm.groupBy("mon")
        .agg(F.sum("c").alias("n"))
        .withColumn("prev_mon", F.lag("mon").over(Window.orderBy("mon")))
    )
    pris = pm.select("pri").distinct()
    cur = pm.select(
        F.col("mon").alias("c_mon"), F.col("pri").alias("c_pri"), F.col("c")
    )
    prv = pm.select(
        F.col("mon").alias("p_mon"),
        F.col("pri").alias("p_pri"),
        F.col("c").alias("pc"),
    )
    mtp = mt.alias("m").join(
        mt.select(F.col("mon").alias("pm_mon"), F.col("n").alias("n_prev")),
        F.col("pm_mon") == F.col("prev_mon"),
    )
    joined = (
        mtp.crossJoin(F.broadcast(pris))
        .join(
            cur,
            (F.col("c_mon") == F.col("mon")) & (F.col("c_pri") == F.col("pri")),
            "left",
        )
        .join(
            prv,
            (F.col("p_mon") == F.col("prev_mon"))
            & (F.col("p_pri") == F.col("pri")),
            "left",
        )
        .select(
            "mon",
            F.col("n").alias("n_cur"),
            "n_prev",
            F.coalesce(F.col("c"), F.lit(0)).alias("c_cur"),
            F.coalesce(F.col("pc"), F.lit(0)).alias("c_prv"),
        )
    )
    return (
        joined.groupBy("mon")
        .agg(
            F.max("n_cur").cast("long").alias("n_orders"),
            F.sum(
                F.abs(
                    F.col("c_cur") * F.col("n_prev")
                    - F.col("c_prv") * F.col("n_cur")
                )
            )
            .cast("long")
            .alias("l1_shift_scaled"),
            (
                10
                * F.sum(
                    F.abs(
                        F.col("c_cur") * F.col("n_prev")
                        - F.col("c_prv") * F.col("n_cur")
                    )
                )
                > F.max("n_cur") * F.max("n_prev")
            ).alias("shifted"),
        )
        .orderBy("mon")
    )
