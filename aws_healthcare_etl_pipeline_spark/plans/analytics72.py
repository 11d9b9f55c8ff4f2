"""Wave-98 (round 5): inventory policy simulation + auction clearing.

* ``inventory_reorder_point_replay`` — the (s, Q) reorder-point
  policy replayed exactly per user stream: daily demand draws down
  on-hand stock; when on-hand (plus on-order) falls below the
  reorder point s, an order of size Q is placed that arrives after
  a fixed lead time; stockouts ship nothing and count. The state
  (on-hand, outstanding-order arrival day) makes the recurrence
  non-linear and order-sensitive — the keyed Arrow scan executes
  it, the DuckDB RECURSIVE CTE replays it step-exactly, extending
  the stateful-DP family (capped balance, token bucket, bandit)
  with the operations-research classic warehouses actually run.
* ``auction_second_price_clearing`` — first-price vs second-price
  (Vickrey) clearing per part: bids are the part's lineitem
  extended prices, the winner pays the runner-up's bid under
  second-price rules, and per-brand revenue under both rules lands
  in exact cents — the auction-design what-if computed with one
  top-2-per-group window.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- (s, Q) reorder replay

_RP_START = 10  # opening on-hand units
_RP_S = 5  # reorder point
_RP_Q = 8  # order quantity
_RP_LEAD = 4  # arrival: LEAD days after the order-placing day


@query(
    "inventory_reorder_point_replay",
    oracle=f"""
        WITH RECURSIVE demand AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY dy) AS rn,
                   CAST(date_diff('day', DATE '1990-01-01', dy)
                        AS BIGINT) AS day_idx,
                   dem
            FROM (
                SELECT user_id, CAST(ts AS DATE) AS dy,
                       CAST(COUNT(*) AS BIGINT) AS dem
                FROM events GROUP BY 1, 2
            )
        ), span AS (
            SELECT user_id, MAX(rn) AS n_days FROM demand
            GROUP BY user_id
        ), replay(user_id, rn, onhand, due_day, n_orders, n_stockout_units
                 ) AS (
            SELECT user_id, 0, {_RP_START}, CAST(NULL AS BIGINT), 0, 0
            FROM span
            UNION ALL
            SELECT x.user_id, x.rn,
                   x.after_ship,
                   CASE WHEN x.reorder THEN x.day_idx + {_RP_LEAD}
                        ELSE x.due2 END,
                   x.n_orders + CASE WHEN x.reorder THEN 1 ELSE 0 END,
                   x.n_stockout_units + x.shortfall
            FROM (
                SELECT y.user_id, y.rn, y.day_idx, y.n_orders,
                       y.n_stockout_units, y.due2,
                       GREATEST(y.ah - y.dem, 0) AS after_ship,
                       GREATEST(y.dem - y.ah, 0) AS shortfall,
                       (GREATEST(y.ah - y.dem, 0) < {_RP_S}
                        AND y.due2 IS NULL) AS reorder
                FROM (
                    SELECT r.user_id, d.rn, d.day_idx, d.dem,
                           r.n_orders, r.n_stockout_units,
                           r.onhand + CASE WHEN r.due_day IS NOT NULL
                                           AND r.due_day <= d.day_idx
                                      THEN {_RP_Q} ELSE 0 END AS ah,
                           CASE WHEN r.due_day IS NOT NULL
                                     AND r.due_day <= d.day_idx
                                THEN NULL ELSE r.due_day END AS due2
                    FROM replay r JOIN demand d
                      ON d.user_id = r.user_id AND d.rn = r.rn + 1
                ) y
            ) x
        )
        SELECT s.user_id,
               CAST(s.n_days AS BIGINT) AS n_days,
               CAST(r.onhand AS BIGINT) AS final_onhand,
               CAST(r.n_orders AS BIGINT) AS n_orders,
               CAST(r.n_stockout_units AS BIGINT) AS n_stockout_units
        FROM span s JOIN replay r
          ON r.user_id = s.user_id AND r.rn = s.n_days
        ORDER BY s.user_id
    """,
    description="(s, Q) reorder-point inventory policy replayed "
    "exactly per user demand stream (daily event counts as demand): "
    "pending orders arrive after the lead time, demand ships from "
    "on-hand with stockouts counted (lost sales, not backorders), "
    "and a replenishment of Q=8 is placed whenever post-ship "
    "on-hand drops below s=5 with nothing outstanding (lead 4 days). The "
    "(on-hand, due-day) state makes the recurrence order-sensitive "
    "and non-linear — provably not a window — so execution is the "
    "Arrow-batched keyed scan (parallel across users, sequential "
    "within) and the DuckDB RECURSIVE CTE replays every "
    "arrive-ship-reorder step; the hash match proves the policy "
    "loop. The OR classic warehouses actually run. Scale: demand "
    "collapses to (user, day) grain map-side; one shuffle on "
    "user_id; per-user day sequences are calendar-bounded.",
)
def inventory_reorder_point_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    demand = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("dy")
    ).agg(F.count(F.lit(1)).cast("long").alias("dem")).select(
        "user_id",
        F.datediff("dy", F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("day_idx"),
        "dem",
    )
    start, s_pt, q, lead = _RP_START, _RP_S, _RP_Q, _RP_LEAD

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure (pandas/stdlib only); rows pre-sorted
        onhand, due, n_orders, short = start, None, 0, 0
        for day_idx, dem in zip(
            pdf["day_idx"].tolist(), pdf["dem"].tolist()
        ):
            day_idx, dem = int(day_idx), int(dem)
            if due is not None and due <= day_idx:
                onhand += q
                due = None
            shipped = min(onhand, dem)
            short += dem - shipped
            onhand -= shipped
            if onhand < s_pt and due is None:
                due = day_idx + lead
                n_orders += 1
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_days": [len(pdf)],
                "final_onhand": [onhand],
                "n_orders": [n_orders],
                "n_stockout_units": [short],
            }
        )

    out_schema = (
        "user_id long, n_days long, final_onhand long, "
        "n_orders long, n_stockout_units long"
    )
    return keyed_pandas_scan(
        demand, "user_id", ["day_idx"], replay, out_schema
    ).orderBy("user_id")


# ------------------------------------------- second-price clearing


@query(
    "auction_second_price_clearing",
    oracle="""
        WITH bids AS (
            SELECT l.l_partkey,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS bid_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY l.l_partkey
                       ORDER BY CAST(l.l_extendedprice AS DECIMAL(15,2))
                                DESC, l.l_orderkey, l.l_linenumber)
                       AS rk,
                   COUNT(*) OVER (PARTITION BY l.l_partkey) AS n_bids
            FROM lineitem l
        ), cleared AS (
            SELECT b1.l_partkey,
                   b1.n_bids,
                   b1.bid_cents AS first_price_cents,
                   b2.bid_cents AS second_price_cents
            FROM bids b1 JOIN bids b2
              ON b2.l_partkey = b1.l_partkey AND b2.rk = 2
            WHERE b1.rk = 1 AND b1.n_bids >= 2
        )
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_auctions,
               CAST(SUM(c.first_price_cents) AS BIGINT)
                   AS first_price_revenue_cents,
               CAST(SUM(c.second_price_cents) AS BIGINT)
                   AS second_price_revenue_cents,
               CAST((SUM(c.second_price_cents) * 1000)
                    // SUM(c.first_price_cents) AS BIGINT)
                   AS revenue_retained_permille
        FROM cleared c JOIN part p ON p.p_partkey = c.l_partkey
        GROUP BY p.p_brand
        ORDER BY p.p_brand
    """,
    description="First-price vs second-price (Vickrey) auction "
    "clearing per part: each part's lineitem extended prices are "
    "bids (deterministic (price DESC, orderkey, linenumber) "
    "ranking), the winner pays the runner-up under second-price "
    "rules, and per-brand revenue lands in exact cents with the "
    "retained-revenue ratio in integer permille — the auction-"
    "design what-if (how much revenue does truthful bidding cost?) "
    "computed with one top-2-per-group window. Scale: the window "
    "partitions on partkey (WindowGroupLimit prunes beyond rank 2 "
    "map-side), the part dim join broadcasts, and the brand rollup "
    "is map-side combined.",
)
def auction_second_price_clearing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(15,2)").alias("price_dec"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("bid_cents"),
    )
    wp = Window.partitionBy("l_partkey")
    w = wp.orderBy(
        F.col("price_dec").desc(), "l_orderkey", "l_linenumber"
    )
    bids = li.select(
        "l_partkey",
        "bid_cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n_bids"),
    ).filter(F.col("rk") <= 2).localCheckpoint(eager=False)
    # top-2 only survive; feeds both sides of the winner/runner-up join
    b1 = bids.filter((F.col("rk") == 1) & (F.col("n_bids") >= 2)).select(
        "l_partkey",
        F.col("bid_cents").alias("first_price_cents"),
    )
    b2 = bids.filter(F.col("rk") == 2).select(
        F.col("l_partkey").alias("pk2"),
        F.col("bid_cents").alias("second_price_cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cleared = b1.join(b2, F.col("l_partkey") == F.col("pk2")).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return (
        cleared.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_auctions"),
            F.sum("first_price_cents")
            .cast("long")
            .alias("first_price_revenue_cents"),
            F.sum("second_price_cents")
            .cast("long")
            .alias("second_price_revenue_cents"),
        )
        .select(
            "p_brand",
            "n_auctions",
            "first_price_revenue_cents",
            "second_price_revenue_cents",
            F.expr(
                "(second_price_revenue_cents * 1000)"
                " div first_price_revenue_cents"
            )
            .cast("long")
            .alias("revenue_retained_permille"),
        )
        .orderBy("p_brand")
    )
