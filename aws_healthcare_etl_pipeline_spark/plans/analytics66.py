"""Wave-92 (round 5): forecast backtesting + distribution transfer.

* ``forecast_backtest_naive_vs_seasonal`` — the honest forecasting
  baseline bake-off: persistence (predict yesterday) vs seasonal-7
  (predict last week's same weekday) backtested over every day both
  predictors can see, scored by exact integer MAE on milli-quantized
  daily values; the winner and its margin (permille of the larger
  MAE, always nonnegative via greatest/least) per series. Any model
  that can't beat these two numbers is noise — this query IS the
  go/no-go gate for forecasting work.
* ``stat_quantile_mapping_transfer`` — exact quantile mapping of
  AUTOMOBILE order values onto the BUILDING distribution (the
  calibration transfer behind domain adaptation and synthetic-data
  reshaping): source rank i of n_A maps to target index
  ((i-1)*(n_B-1)) div (n_A-1) + 1 — a type-1 (no-interpolation)
  quantile lookup in pure integer index arithmetic — and the
  transfer is summarized per source decile with original vs mapped
  cent ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------ naive-vs-seasonal backtest


@query(
    "forecast_backtest_naive_vs_seasonal",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ), preds AS (
            SELECT event_type, dy, v,
                   LAG(v, 1) OVER w AS pred_persist,
                   LAG(v, 7) OVER w AS pred_seasonal
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY dy)
        ), scored AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days_eval,
                   CAST(SUM(abs(v - pred_persist)) AS BIGINT)
                       AS mae_persist_millis,
                   CAST(SUM(abs(v - pred_seasonal)) AS BIGINT)
                       AS mae_seasonal_millis
            FROM preds
            WHERE pred_persist IS NOT NULL AND pred_seasonal IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n_days_eval,
               mae_persist_millis, mae_seasonal_millis,
               CASE WHEN mae_seasonal_millis < mae_persist_millis
                    THEN 'seasonal_7'
                    WHEN mae_persist_millis < mae_seasonal_millis
                    THEN 'persistence'
                    ELSE 'tie' END AS winner,
               CAST(((GREATEST(mae_persist_millis, mae_seasonal_millis)
                      - LEAST(mae_persist_millis, mae_seasonal_millis))
                     * 1000)
                    // GREATEST(mae_persist_millis, mae_seasonal_millis)
                    AS BIGINT) AS win_margin_permille
        FROM scored
        ORDER BY event_type
    """,
    description="Forecast baseline bake-off per event type: "
    "persistence (t-1) vs seasonal-7 (t-7) backtested over every "
    "day where both predictors exist, scored by EXACT integer MAE "
    "on milli-quantized daily sums; winner plus margin in permille "
    "of the larger MAE (greatest/least keeps the ratio nonnegative "
    "— floor-division semantics then agree across engines). Any "
    "forecasting model that can't beat both numbers is noise — the "
    "go/no-go gate that should precede every forecasting project. "
    "Scale: events collapse to day grain map-side; the lag windows "
    "run per series over calendar-bounded rows; the report is "
    "series-count-sized.",
)
def forecast_backtest_naive_vs_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("dy")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("dy")
    preds = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("pred_persist"),
        F.lag("v", 7).over(w).alias("pred_seasonal"),
    ).filter(
        F.col("pred_persist").isNotNull()
        & F.col("pred_seasonal").isNotNull()
    )
    scored = preds.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_eval"),
        F.sum(F.abs(F.col("v") - F.col("pred_persist")))
        .cast("long")
        .alias("mae_persist_millis"),
        F.sum(F.abs(F.col("v") - F.col("pred_seasonal")))
        .cast("long")
        .alias("mae_seasonal_millis"),
    )
    return scored.select(
        "event_type",
        "n_days_eval",
        "mae_persist_millis",
        "mae_seasonal_millis",
        F.when(
            F.col("mae_seasonal_millis") < F.col("mae_persist_millis"),
            "seasonal_7",
        )
        .when(
            F.col("mae_persist_millis") < F.col("mae_seasonal_millis"),
            "persistence",
        )
        .otherwise("tie")
        .alias("winner"),
        F.expr(
            "((greatest(mae_persist_millis, mae_seasonal_millis)"
            " - least(mae_persist_millis, mae_seasonal_millis)) * 1000)"
            " div greatest(mae_persist_millis, mae_seasonal_millis)"
        )
        .cast("long")
        .alias("win_margin_permille"),
    ).orderBy("event_type")


# --------------------------------------------- quantile mapping

_QM_SRC = "AUTOMOBILE"
_QM_TGT = "BUILDING"


@query(
    "stat_quantile_mapping_transfer",
    oracle=f"""
        WITH src AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (ORDER BY o.o_totalprice,
                                      o.o_orderkey) AS rk,
                   COUNT(*) OVER () AS n_a
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = '{_QM_SRC}'
        ), tgt AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (ORDER BY o.o_totalprice,
                                      o.o_orderkey) AS rk,
                   COUNT(*) OVER () AS n_b
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = '{_QM_TGT}'
        ), mapped AS (
            SELECT s.cents AS src_cents,
                   ((s.rk - 1) * 10) // s.n_a AS decile,
                   t.cents AS mapped_cents
            FROM src s JOIN tgt t
              ON t.rk = ((s.rk - 1) * (t.n_b - 1)) // (s.n_a - 1) + 1
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(src_cents) AS BIGINT) AS src_min_cents,
               CAST(MAX(src_cents) AS BIGINT) AS src_max_cents,
               CAST(MIN(mapped_cents) AS BIGINT) AS mapped_min_cents,
               CAST(MAX(mapped_cents) AS BIGINT) AS mapped_max_cents
        FROM mapped
        GROUP BY decile
        ORDER BY decile
    """,
    description="Exact quantile mapping of AUTOMOBILE order values "
    "onto the BUILDING distribution — the calibration transfer "
    "behind domain adaptation and synthetic-data reshaping: source "
    "rank i of n_A maps to target index ((i-1)*(n_B-1)) div "
    "(n_A-1) + 1, a type-1 quantile lookup in PURE integer index "
    "arithmetic (no interpolation, no floats), joined as an "
    "equi-join on the computed index; the transfer is summarized "
    "per source decile with original vs mapped cent ranges. The "
    "oracle pins the textbook global-rank form; at scale both "
    "rankings become the repo's exact-percentile cutpoint pattern "
    "(distributed running total over value histograms) and the "
    "index join stays an equi-join — the decile summary is "
    "10-row.",
)
def stat_quantile_mapping_transfer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)

    def ranked(seg: str, nname: str):
        w = Window.orderBy("o_totalprice", "o_orderkey")
        return (
            joined.filter(F.col("c_mktsegment") == seg)
            .select("cents", "o_totalprice", "o_orderkey")
            .select(
                "cents",
                F.row_number().over(w).alias("rk"),
                F.count(F.lit(1))
                .over(Window.partitionBy())
                .alias(nname),
            )
        )

    src = ranked(_QM_SRC, "n_a")
    tgt = ranked(_QM_TGT, "n_b").select(
        F.col("cents").alias("t_cents"),
        F.col("rk").alias("t_rk"),
        "n_b",
    )
    n_b_row = tgt.agg(F.max("n_b").alias("n_b_val"))
    mapped = (
        src.crossJoin(F.broadcast(n_b_row))
        .withColumn(
            "t_idx",
            F.expr("((rk - 1) * (n_b_val - 1)) div (n_a - 1) + 1"),
        )
        .join(tgt, F.col("t_idx") == F.col("t_rk"))
        .select(
            F.col("cents").alias("src_cents"),
            F.expr("((rk - 1) * 10) div n_a").alias("decile"),
            F.col("t_cents").alias("mapped_cents"),
        )
    )
    return (
        mapped.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("src_cents").cast("long").alias("src_min_cents"),
            F.max("src_cents").cast("long").alias("src_max_cents"),
            F.min("mapped_cents").cast("long").alias("mapped_min_cents"),
            F.max("mapped_cents").cast("long").alias("mapped_max_cents"),
        )
        .orderBy("decile")
    )
