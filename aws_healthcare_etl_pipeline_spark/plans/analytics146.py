"""Wave-172 (round 5): time-series codec economics + supply-chain SLA.

* ``storage_delta_of_delta_gorilla`` — the Gorilla/Prometheus
  question: do SECOND-order timestamp deltas compress better than
  first-order ones on this stream? Per-user event timestamps take
  two lags; both orders are costed with the same zigzag + class-
  ladder bit model (Gorilla's {1, 9, 12, 16, 36, 68}-bit classes),
  all generated CASE arithmetic, identical in both engines. The
  output is the total-bit bill per scheme (raw64 / delta / delta-of-
  delta) with ratios in permille — regular streams make d2 ~ 0 and
  the second order wins; this measures by how much, exactly.

* ``ops_otif_fill_rate`` — On-Time-In-Full by order month: an order
  counts only if EVERY line shipped within 30 days of the order
  date. The all-lines quantifier is a MAX over a per-line lateness
  flag at the order grain — one orderkey-local join, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Gorilla-style (threshold on zigzag value, bits) ladder; ELSE 68.
_GOR_CLASSES: list[tuple[int, int]] = [
    (1, 1),  # z = 0 -> 1 bit
    (1 << 7, 9),
    (1 << 9, 12),
    (1 << 12, 16),
    (1 << 32, 36),
]


def _gor_bits(var: str) -> str:
    branches = " ".join(
        f"WHEN {var} < {thr} THEN {bits}" for thr, bits in _GOR_CLASSES
    )
    return f"(CASE {branches} ELSE 68 END)"


@query(
    "storage_delta_of_delta_gorilla",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, epoch_us(ts) AS t,
                   LAG(epoch_us(ts)) OVER w AS t1,
                   LAG(epoch_us(ts), 2) OVER w AS t2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts),
                         event_id)
        ), deltas AS (
            SELECT CASE WHEN t1 IS NULL THEN NULL ELSE t - t1 END AS d1,
                   CASE WHEN t2 IS NULL THEN NULL
                        ELSE (t - t1) - (t1 - t2) END AS d2
            FROM seq
        ), costed AS (
            SELECT CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
                   CAST(SUM(CASE WHEN d1 IS NULL THEN 64
                        ELSE {_gor_bits("2 * ABS(d1)")} END)
                        AS BIGINT) AS delta_bits,
                   CAST(SUM(CASE WHEN d2 IS NULL THEN 64
                        ELSE {_gor_bits("2 * ABS(d2)")} END)
                        AS BIGINT) AS dod_bits
            FROM deltas
        )
        SELECT scheme, total_bits,
               CAST(total_bits * 1000 // raw_bits AS BIGINT)
                   AS ratio_permille
        FROM (
            SELECT 'raw64' AS scheme, raw_bits AS total_bits, raw_bits
            FROM costed
            UNION ALL
            SELECT 'delta_gorilla', delta_bits, raw_bits FROM costed
            UNION ALL
            SELECT 'delta_of_delta_gorilla', dod_bits, raw_bits
            FROM costed
        )
        ORDER BY scheme
    """,
    description="Gorilla's bet, measured: per-user event timestamps "
    "take first and second-order deltas (two lags in one partitioned "
    "window pass), and both orders are costed with the same zigzag + "
    "class-ladder bit model ({1,9,12,16,36,68}-bit Gorilla "
    "classes, generated CASE shared by both engines; per-series "
    "first values cost the full 64 bits). Output: total bit bill "
    "per scheme with permille compression ratios — regular streams "
    "drive d2 toward the 1-bit class, and this query says exactly "
    "how much the second order buys on THIS stream. 100 TB shape: "
    "one partitioned window (no global sort), pure per-row CASE "
    "arithmetic, one partial agg — the codec decision for every "
    "metrics/TSDB ingestion pipeline, decided from data.",
)
def storage_delta_of_delta_gorilla(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = events.select(
        F.unix_micros("ts").alias("t"), "user_id", "event_id"
    ).select(
        "t",
        F.lag("t").over(w).alias("t1"),
        F.lag("t", 2).over(w).alias("t2"),
    )
    deltas = seq.selectExpr(
        "CASE WHEN t1 IS NULL THEN NULL ELSE t - t1 END AS d1",
        "CASE WHEN t2 IS NULL THEN NULL"
        " ELSE (t - t1) - (t1 - t2) END AS d2",
    )
    costed = deltas.agg(
        (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
        F.expr(
            f"SUM(CASE WHEN d1 IS NULL THEN 64"
            f" ELSE {_gor_bits('2 * ABS(d1)')} END)"
        )
        .cast("long")
        .alias("delta_bits"),
        F.expr(
            f"SUM(CASE WHEN d2 IS NULL THEN 64"
            f" ELSE {_gor_bits('2 * ABS(d2)')} END)"
        )
        .cast("long")
        .alias("dod_bits"),
    )
    stacked = costed.selectExpr(
        "raw_bits",
        "stack(3,"
        " 'raw64', raw_bits,"
        " 'delta_gorilla', delta_bits,"
        " 'delta_of_delta_gorilla', dod_bits"
        ") AS (scheme, total_bits)",
    )
    return stacked.selectExpr(
        "scheme",
        "total_bits",
        "CAST(total_bits * 1000 div raw_bits AS BIGINT)"
        " AS ratio_permille",
    ).orderBy("scheme")


_OTIF_DAYS = 30


@query(
    "ops_otif_fill_rate",
    oracle=f"""
        WITH lines AS (
            SELECT l.l_orderkey,
                   EXTRACT(year FROM o.o_orderdate) * 100
                   + EXTRACT(month FROM o.o_orderdate) AS ym,
                   CASE WHEN date_diff('day', o.o_orderdate,
                                        l.l_shipdate) > {_OTIF_DAYS}
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
        ), per_order AS (
            SELECT l_orderkey, MAX(ym) AS ym,
                   MAX(late) AS any_late
            FROM lines GROUP BY l_orderkey
        )
        SELECT CAST(ym AS BIGINT) AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(1 - any_late) AS BIGINT) AS otif_orders,
               CAST(SUM(1 - any_late) * 1000 // COUNT(*) AS BIGINT)
                   AS otif_permille
        FROM per_order
        GROUP BY ym
        ORDER BY order_month
    """,
    description="On-Time-In-Full by order month: an order counts "
    "only when EVERY line ships within 30 days of the order date — "
    "the all-lines quantifier is MAX(lateness flag) at the order "
    "grain, no window, no correlated subquery. Dates compare via "
    "portable day-diff arithmetic. 100 TB shape: one orderkey-local "
    "join (lineitem and orders co-shuffle on the same key), one "
    "order-grain partial agg, one bounded month rollup — the "
    "supply-chain SLA metric (and the one the fixture's unenforced "
    "ship>=order rule makes interesting: early-ship lines count as "
    "in-full, late ones break the whole order).",
)
def ops_otif_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).selectExpr(
        "l_orderkey",
        "year(o_orderdate) * 100 + month(o_orderdate) AS ym",
        f"CASE WHEN datediff(l_shipdate, o_orderdate) > {_OTIF_DAYS}"
        f" THEN 1 ELSE 0 END AS late",
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.max("ym").alias("ym"), F.max("late").alias("any_late")
    )
    return (
        per_order.groupBy(F.col("ym").cast("long").alias("order_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(1 - F.col("any_late"))
            .cast("long")
            .alias("otif_orders"),
            F.expr(
                "CAST(SUM(1 - any_late) * 1000 div COUNT(*) AS BIGINT)"
            ).alias("otif_permille"),
        )
        .orderBy("order_month")
    )
