"""Wave-6 analytics: event-sequence transitions, rolling distinct
users, incremental rollup maintenance.

  events_markov_transitions  next-event transition counts/probabilities
                             (the product-analytics "path" query)
  events_rolling_wau         trailing-7-day distinct users per day via
                             contribution fan-out — NOT a distinct-over-
                             RANGE-window (which would buffer every row
                             of a day's trailing week in one task)
  orders_incremental_rollup  merge a delta partition into a persisted
                             rollup and prove it equals the full
                             recompute — materialized-view maintenance

Oracle conventions follow plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query


@query(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ), pairs AS (
            SELECT event_type, next_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        ), outdeg AS (
            SELECT event_type, SUM(n) AS total FROM pairs
            GROUP BY event_type
        )
        SELECT p.event_type, p.next_type, p.n,
               round(CAST(p.n AS DOUBLE) / o.total, 6) AS p_next
        FROM pairs p JOIN outdeg o USING (event_type)
        ORDER BY p.event_type, p.next_type
    """,
    description="First-order Markov transition matrix over per-user "
    "event sequences: lead() within (user, time) order, pair counts, "
    "row-normalized probabilities. One shuffle on user_id for the "
    "window, then a tiny (types x types) aggregate; the probability is "
    "one exact int division. Tie-break on event_id keeps the sequence "
    "deterministic.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outdeg = pairs.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(outdeg), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p_next"),
        )
        .orderBy("event_type", "next_type")
    )


@query(
    "events_rolling_wau",
    oracle="""
        WITH user_days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), bounds AS (
            SELECT MIN(day) AS lo, MAX(day) AS hi FROM user_days
        ), contrib AS (
            SELECT user_id, unnest(list_transform(
                       generate_series(0, 6),
                       k -> day + CAST(k AS INTEGER)
                   )) AS as_of
            FROM user_days
        )
        SELECT CAST(as_of AS VARCHAR) AS as_of_day,
               COUNT(DISTINCT user_id) AS wau
        FROM contrib CROSS JOIN bounds
        WHERE as_of BETWEEN lo AND hi
        GROUP BY as_of
        ORDER BY as_of
    """,
    description="Trailing-7-day distinct active users per day (rolling "
    "WAU). Each distinct (user, day) fans out to the 7 as-of days it "
    "contributes to — a bounded 7x row expansion feeding one "
    "count-distinct aggregation, instead of a distinct-over-RANGE "
    "window (unsupported, and a per-day full re-count besides). Edge "
    "days outside the observed range are clipped so every reported "
    "day has a full-width window of real data behind it.",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    bounds = user_days.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("as_of"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("as_of").between(F.col("lo"), F.col("hi")))
        .groupBy("as_of")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("as_of").cast("string").alias("as_of_day"), "wau")
        .orderBy("as_of_day")
    )


CUTOVER = "1997-01-01"


@query(
    "orders_incremental_rollup",
    oracle=f"""
        WITH full_recompute AS (
            SELECT o_orderpriority,
                   CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                       AS revenue
            FROM orders
            GROUP BY 1, 2
        ), base AS (
            SELECT o_orderpriority,
                   CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS revenue_dec
            FROM orders WHERE o_orderdate < TIMESTAMP '{CUTOVER}'
            GROUP BY 1, 2
        ), delta AS (
            SELECT o_orderpriority,
                   CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS revenue_dec
            FROM orders WHERE o_orderdate >= TIMESTAMP '{CUTOVER}'
            GROUP BY 1, 2
        ), merged AS (
            SELECT o_orderpriority, month,
                   CAST(SUM(n_orders) AS BIGINT) AS n_orders,
                   CAST(SUM(revenue_dec) AS DOUBLE) AS revenue
            FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
            GROUP BY 1, 2
        )
        SELECT m.o_orderpriority, m.month, m.n_orders, m.revenue,
               (f.n_orders = m.n_orders AND f.revenue = m.revenue)
                   AS matches_full
        FROM merged m
        JOIN full_recompute f
          ON m.o_orderpriority = f.o_orderpriority AND m.month = f.month
        ORDER BY m.o_orderpriority, m.month
    """,
    description="Incremental materialized-rollup maintenance: a "
    "persisted (priority, month) rollup of pre-1997 orders is merged "
    "with the 1997+ delta partition by re-aggregating PARTIAL exact-"
    "decimal sums — the algebraic-merge property that lets a 100 TB "
    "pipeline fold one new partition into a rollup without rescanning "
    "history. matches_full proves merge == full recompute per group "
    "(decimal partials make the sums associative; double partials "
    "would not be).",
)
def orders_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority", month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("revenue_dec"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < CUTOVER))
    delta = partial(orders.filter(F.col("o_orderdate") >= CUTOVER))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_dec").cast("double").alias("revenue"),
        )
    )
    full = orders.groupBy("o_orderpriority", month).agg(
        F.count(F.lit(1)).alias("f_n"),
        F.sum(dec("o_totalprice")).cast("double").alias("f_rev"),
    )
    return (
        merged.join(full, ["o_orderpriority", "month"])
        .select(
            "o_orderpriority",
            "month",
            "n_orders",
            "revenue",
            (
                (F.col("f_n") == F.col("n_orders"))
                & (F.col("f_rev") == F.col("revenue"))
            ).alias("matches_full"),
        )
        .orderBy("o_orderpriority", "month")
    )
