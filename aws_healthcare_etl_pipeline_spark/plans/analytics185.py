"""Wave-210 (round 6, part 2): finance recurrences + SQL-semantics
batteries.

* ``inventory_wac_moving_average`` — weighted-average-cost inventory
  valuation: the ORDER-SENSITIVE running recurrence (receipts re-price
  the pool, issues relieve it at the current average) that FIFO lots
  (``inventory_fifo_lot_valuation``) deliberately avoid. Spark runs it
  through the partition-wise keyed scan; the oracle replays the exact
  recurrence as a recursive CTE, so the hash match proves the
  distributed scan equals the textbook sequential definition.

* ``finance_amortization_schedule`` — 12-period equal-principal loan
  amortization with integer-cents balances: per-period interest is a
  CLOSED FORM of the period index, so the whole schedule is one
  explode + expression battery, no recursion — the declarative shape
  that scales where a per-loan loop cannot.

* ``finance_day_count_conventions`` — ACT/365, ACT/360 and 30/360-US
  interest accrual over the same order->ship spans: pure integer date
  arithmetic (the 30/360 end-of-month clamps included), the kind of
  convention battery a finance mart must pin because two engines that
  "both compute day counts" will differ exactly here.

* ``window_ntile_remainder_semantics`` — NTILE(4)'s remainder rule
  (the first n%4 tiles get the extra row) pinned on a deterministic
  total order, per order status.

* ``sql_qualify_window_filter`` — top-3 orders per market segment:
  Spark expresses it as the row_number subquery filter (kept UNCAST so
  the planner can collapse rank+filter), the oracle as DuckDB's
  QUALIFY clause — same rows, proving the rewrite every engine without
  QUALIFY ships.

* ``sql_grouping_id_rollup_decode`` — ROLLUP with GROUPING()-decoded
  level labels: the standard way to tell a subtotal row from a detail
  row whose key happens to be NULL, pinned cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------- WAC moving average

WAC_PARTS = 2000


@query(
    "inventory_wac_moving_average",
    oracle=f"""
        WITH RECURSIVE base AS (
            SELECT l_partkey AS pk,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice) AS rn,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS ep_cents,
                   l_linenumber % 2 AS kind
            FROM lineitem WHERE l_partkey < {WAC_PARTS}
        ), mx AS (SELECT MAX(rn) AS m FROM base),
        step AS (
            SELECT pk, CAST(0 AS BIGINT) AS qty,
                   CAST(0 AS BIGINT) AS total,
                   CAST(0 AS BIGINT) AS so, 0 AS rn
            FROM (SELECT DISTINCT pk FROM base)
            UNION ALL
            SELECT s.pk,
                   CASE WHEN b.pk IS NULL THEN s.qty
                        WHEN b.kind = 0 THEN s.qty + b.q
                        ELSE s.qty - LEAST(s.qty, b.q) END,
                   CASE WHEN b.pk IS NULL THEN s.total
                        WHEN b.kind = 0
                             THEN s.total + b.q * (b.ep_cents // b.q)
                        WHEN s.qty = 0 THEN s.total
                        ELSE s.total
                             - (s.total * LEAST(s.qty, b.q)) // s.qty
                        END,
                   s.so + CASE WHEN b.pk IS NOT NULL AND b.kind = 1
                                    AND b.q > s.qty
                               THEN 1 ELSE 0 END,
                   s.rn + 1
            FROM step s LEFT JOIN base b
              ON b.pk = s.pk AND b.rn = s.rn + 1
            WHERE s.rn < (SELECT m FROM mx)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(qty) AS BIGINT) AS total_qty,
               CAST(SUM(total) AS BIGINT) AS total_value_cents,
               CAST(SUM(so) AS BIGINT) AS n_stockouts
        FROM step WHERE rn = (SELECT m FROM mx)
    """,
    description="Weighted-average-cost (moving average) inventory "
    "valuation per part: even line numbers are receipts (repricing "
    "the pool at integer unit cents), odd are issues relieved at the "
    "CURRENT average via exact integer proration "
    "(total*issue_qty div qty) — the order-sensitive recurrence GAAP "
    "calls WAC, with stockout attempts counted. Spark runs the "
    "recurrence through the partition-wise keyed pandas scan (one "
    "shuffle on partkey, one Python pass per partition, groups never "
    "split); the oracle replays it as a recursive CTE stepping every "
    "part in lockstep, so the hash match proves the distributed scan "
    "equals the sequential definition. 100 TB shape: per-SKU history "
    "is bounded and independent — the scan parallelizes across the "
    "SKU dimension while each group stays a tiny in-memory fold.",
)
def inventory_wac_moving_average(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < WAC_PARTS)
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_shipdate").alias("sd"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("bigint").alias("q"),
            (dec("l_extendedprice") * 100)
            .cast("bigint")
            .alias("ep_cents"),
        )
    )

    def per_group(g):
        import pandas as pd

        qty = 0
        total = 0
        so = 0
        for q, ep, ln in zip(g["q"], g["ep_cents"], g["ln"]):
            q = int(q)
            ep = int(ep)
            if int(ln) % 2 == 0:  # receipt
                total += q * (ep // q)
                qty += q
            else:  # issue
                if q > qty:
                    so += 1
                iq = min(qty, q)
                if qty > 0:
                    total -= (total * iq) // qty
                qty -= iq
        return pd.DataFrame(
            {"pk": [g["pk"].iloc[0]], "qty": [qty], "total": [total],
             "so": [so]}
        )

    final = keyed_pandas_scan(
        li,
        key="pk",
        order=["sd", "ok", "ln", "q", "ep_cents"],
        per_group=per_group,
        out_schema="pk long, qty long, total long, so long",
    )
    return final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.sum("total").cast("bigint").alias("total_value_cents"),
        F.sum("so").cast("bigint").alias("n_stockouts"),
    )


# ------------------------------------------ amortization schedule

AMORT_ORDERS = 4000
AMORT_PERIODS = 12


@query(
    "finance_amortization_schedule",
    oracle=f"""
        WITH loans AS (
            SELECT o_orderkey AS id,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS p
            FROM orders WHERE o_orderkey < {AMORT_ORDERS}
        ), sched AS (
            SELECT id, p, k.k,
                   p - (k.k - 1) * (p // {AMORT_PERIODS}) AS bal_before,
                   (p - (k.k - 1) * (p // {AMORT_PERIODS})) // 100
                       AS interest,
                   CASE WHEN k.k < {AMORT_PERIODS}
                        THEN p // {AMORT_PERIODS}
                        ELSE p - {AMORT_PERIODS - 1}
                             * (p // {AMORT_PERIODS}) END AS principal
            FROM loans
            CROSS JOIN (SELECT unnest(range(1, {AMORT_PERIODS + 1}))
                            AS k) k
        )
        SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n_loans,
               CAST(SUM(principal) AS BIGINT) AS total_principal,
               CAST(SUM(interest) AS BIGINT) AS total_interest,
               CAST(MAX(CASE WHEN k = 1 THEN interest END) AS BIGINT)
                   AS max_first_interest,
               CAST(SUM(CASE WHEN k = {AMORT_PERIODS}
                             AND bal_before - principal <> 0
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonzero_final
        FROM sched
    """,
    description="Equal-principal 12-period amortization over order "
    "totals as integer-cent loans: period-k balance is the CLOSED "
    "FORM P - (k-1)*(P div 12), interest is 1% of the open balance "
    "(exact trunc division), and the last period sweeps the division "
    "remainder so every loan provably retires (n_nonzero_final = 0 "
    "is part of the result). Because the recurrence collapses to an "
    "expression of the period index, the whole schedule is one "
    "12-way explode + codegen battery — no per-loan loop, no "
    "recursion — which is why it scales to any number of loans as a "
    "single narrow pass.",
)
def finance_amortization_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    loans = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < AMORT_ORDERS)
        .select(
            F.col("o_orderkey").alias("id"),
            (dec("o_totalprice") * 100).cast("bigint").alias("p"),
        )
    )
    pp = F.expr(f"p div {AMORT_PERIODS}")
    sched = loans.select(
        "id",
        "p",
        F.explode(
            F.sequence(F.lit(1), F.lit(AMORT_PERIODS))
        ).alias("k"),
    ).select(
        "id",
        "k",
        (F.col("p") - (F.col("k") - 1) * pp).alias("bal_before"),
        F.expr(
            f"(p - (k - 1) * (p div {AMORT_PERIODS})) div 100"
        ).alias("interest"),
        F.when(F.col("k") < AMORT_PERIODS, pp)
        .otherwise(F.col("p") - (AMORT_PERIODS - 1) * pp)
        .alias("principal"),
    )
    return sched.agg(
        F.countDistinct("id").cast("bigint").alias("n_loans"),
        F.sum("principal").cast("bigint").alias("total_principal"),
        F.sum("interest").cast("bigint").alias("total_interest"),
        F.max(F.when(F.col("k") == 1, F.col("interest")))
        .cast("bigint")
        .alias("max_first_interest"),
        F.sum(
            F.when(
                (F.col("k") == AMORT_PERIODS)
                & (F.col("bal_before") - F.col("principal") != 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_nonzero_final"),
    )


# ------------------------------------------ day count conventions

DCC_ORDERS = 3000
DCC_RATE_BP = 500  # 5% annual


@query(
    "finance_day_count_conventions",
    oracle=f"""
        WITH spans AS (
            SELECT CAST(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS p,
                   CAST(o.o_orderdate AS DATE) AS d1,
                   GREATEST(CAST(l.l_shipdate AS DATE),
                            CAST(o.o_orderdate AS DATE)) AS d2
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey < {DCC_ORDERS}
        ), days AS (
            SELECT p,
                   datediff('day', d1, d2) AS act,
                   360 * (year(d2) - year(d1))
                   + 30 * (month(d2) - month(d1))
                   + (CASE WHEN day(d2) = 31
                                AND LEAST(day(d1), 30) = 30
                           THEN 30 ELSE day(d2) END
                      - LEAST(day(d1), 30)) AS d360
            FROM spans
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(act) AS BIGINT) AS total_act_days,
               CAST(SUM(d360) AS BIGINT) AS total_360_days,
               CAST(SUM((CAST(p AS HUGEINT) * act * {DCC_RATE_BP})
                        // (365 * 10000)) AS BIGINT)
                   AS interest_act365,
               CAST(SUM((CAST(p AS HUGEINT) * act * {DCC_RATE_BP})
                        // (360 * 10000)) AS BIGINT)
                   AS interest_act360,
               CAST(SUM((CAST(p AS HUGEINT) * d360 * {DCC_RATE_BP})
                        // (360 * 10000)) AS BIGINT)
                   AS interest_30_360
        FROM days
    """,
    description="Day-count convention battery: the same order-date -> "
    "ship-date accrual spans priced under ACT/365, ACT/360 and "
    "30/360-US (with the end-of-month clamps: start day capped at "
    "30, end day 31 -> 30 only when the capped start is 30) at 500bp "
    "on integer-cent principals — per-span interest is an exact "
    "cross-multiplied trunc division (HUGEINT / DECIMAL(38)), no "
    "floating rate math anywhere. Ship dates are clamped to >= order "
    "date (the fixture does not enforce the precedence). This is the "
    "convention pin every finance mart needs because ACT vs 30/360 "
    "day counts differ on exactly these month-end edges; the whole "
    "battery is one join + scan-side expressions.",
)
def finance_day_count_conventions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < DCC_ORDERS
    )
    li = load_table(spark, sf_dir, "lineitem")
    spans = orders.join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        (dec("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.to_date("o_orderdate").alias("d1"),
        F.greatest(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("d2"),
    )
    d1c = F.least(F.dayofmonth("d1"), F.lit(30))
    d2c = F.when(
        (F.dayofmonth("d2") == 31) & (d1c == 30), 30
    ).otherwise(F.dayofmonth("d2"))
    days = spans.select(
        "p",
        F.datediff("d2", "d1").alias("act"),
        (
            360 * (F.year("d2") - F.year("d1"))
            + 30 * (F.month("d2") - F.month("d1"))
            + (d2c - d1c)
        ).alias("d360"),
    )
    return days.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("act").cast("bigint").alias("total_act_days"),
        F.sum("d360").cast("bigint").alias("total_360_days"),
        F.sum(
            F.expr(
                "CAST(p AS DECIMAL(38,0)) * act * "
                f"{DCC_RATE_BP} div (365 * 10000)"
            )
        )
        .cast("bigint")
        .alias("interest_act365"),
        F.sum(
            F.expr(
                "CAST(p AS DECIMAL(38,0)) * act * "
                f"{DCC_RATE_BP} div (360 * 10000)"
            )
        )
        .cast("bigint")
        .alias("interest_act360"),
        F.sum(
            F.expr(
                "CAST(p AS DECIMAL(38,0)) * d360 * "
                f"{DCC_RATE_BP} div (360 * 10000)"
            )
        )
        .cast("bigint")
        .alias("interest_30_360"),
    )


# ------------------------------------------- ntile remainder

NTILE_ORDERS = 20000


@query(
    "window_ntile_remainder_semantics",
    oracle=f"""
        WITH tiled AS (
            SELECT o_orderstatus AS status,
                   NTILE(4) OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY CAST(o_totalprice AS DECIMAL(15,2)),
                                o_orderkey) AS tile,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   o_orderkey
            FROM orders WHERE o_orderkey < {NTILE_ORDERS}
        )
        SELECT status, CAST(tile AS BIGINT) AS tile,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM tiled
        GROUP BY status, tile
        ORDER BY status, tile
    """,
    description="NTILE(4) remainder semantics pinned: the SQL "
    "standard assigns the n%4 extra rows to the FIRST tiles, so "
    "per-tile counts differ by at most one and the low tiles are the "
    "larger ones — verified per order status over a fully "
    "deterministic total order (price then key; without the key "
    "tiebreak, tied prices make tile membership "
    "engine-nondeterministic, the ROWS-frame lesson). NTILE is the "
    "equal-frequency bucketer behind decile reports and quantile "
    "feature bins; one window over one shuffle, nothing else.",
)
def window_ntile_remainder_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < NTILE_ORDERS
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        dec("o_totalprice"), "o_orderkey"
    )
    tiled = orders.select(
        F.col("o_orderstatus").alias("status"),
        F.ntile(4).over(w).alias("tile"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    return (
        tiled.groupBy("status", F.col("tile").cast("bigint").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("status", "tile")
    )


# ------------------------------------------- QUALIFY equivalence


@query(
    "sql_qualify_window_filter",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY CAST(o.o_totalprice AS DECIMAL(15,2)) DESC,
                            o.o_orderkey) AS rnk,
               CAST(o.o_orderkey AS BIGINT) AS orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        QUALIFY rnk <= 3
        ORDER BY segment, rnk
    """,
    description="Top-3 orders per market segment, written as DuckDB's "
    "QUALIFY clause in the oracle and as the row_number subquery "
    "filter in Spark (which has no QUALIFY) — the rows matching "
    "proves the standard rewrite every QUALIFY-less engine ships. "
    "The Spark rank filter stays UNCAST so the planner keeps the "
    "rank-limit collapse available, and the window order carries the "
    "orderkey tiebreak (price ties would otherwise make the top-3 "
    "engine-nondeterministic). Per-group top-k over one shuffle — "
    "the window never materializes more than the partition.",
)
def sql_qualify_window_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        dec("o_totalprice").desc(), "o_orderkey"
    )
    joined = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.row_number().over(w).alias("rnk"),
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        joined.filter(F.col("rnk") <= 3)
        .select(
            "segment", F.col("rnk").cast("bigint").alias("rnk"),
            "orderkey", "cents",
        )
        .orderBy("segment", "rnk")
    )


# ------------------------------------- grouping_id rollup decode


@query(
    "sql_grouping_id_rollup_decode",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2
                    + GROUPING(l_linestatus) AS BIGINT) AS level_id,
               CASE GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                    WHEN 0 THEN 'detail'
                    WHEN 1 THEN 'flag_subtotal'
                    ELSE 'grand_total' END AS level_label,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY level_id, returnflag, linestatus
    """,
    description="ROLLUP with GROUPING()-decoded levels: the portable "
    "way to distinguish a subtotal row from a detail row whose key is "
    "genuinely NULL — GROUPING(col) is 1 exactly on aggregated-away "
    "columns, and the 2-bit level id (flag*2 + status) labels detail "
    "/ flag-subtotal / grand-total rows unambiguously. Pinned "
    "cross-engine because grouping-bit ORDER is exactly where "
    "engines diverge (Spark's grouping_id() bit order is "
    "left-to-right; composing from per-column GROUPING() sidesteps "
    "the trap). One pass: ROLLUP is partial-agg friendly, the 100 TB "
    "subtotal idiom.",
)
def sql_grouping_id_rollup_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    level = (
        F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    ).cast("bigint")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            level.alias("level_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias(
                "returnflag"
            ),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias(
                "linestatus"
            ),
            "level_id",
            F.when(F.col("level_id") == 0, "detail")
            .when(F.col("level_id") == 1, "flag_subtotal")
            .otherwise("grand_total")
            .alias("level_label"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("level_id", "returnflag", "linestatus")
    )
