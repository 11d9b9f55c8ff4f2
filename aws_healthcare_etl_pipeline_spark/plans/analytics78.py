"""Wave-104 (round 5): randomness testing + data-freshness SLAs.

* ``stat_runs_test_daily`` — the Wald-Wolfowitz runs test on each
  event type's daily up/down moves: the number of sign runs versus
  the null expectation E[R] = 2*n1*n2/n + 1, with the comparison
  kept exact by integer cross-multiplication (R*n vs 2*n1*n2 + n)
  — too FEW runs means the series trends (momentum), too many
  means it oscillates (mean reversion); a day-grain classic that
  needs nothing but run counting over the sign sequence.
* ``dq_freshness_staleness_audit`` — per-table freshness against
  each pipeline's own reference clock: latest order/ship/event
  date, staleness in days, and a per-table SLA flag — the first
  tile on any data-quality dashboard, deliberately minimal so the
  report rides one MAX aggregate per table (min/max footer
  statistics answer it without IO on a well-laid-out lake).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------- runs test


@query(
    "stat_runs_test_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ), moves AS (
            SELECT event_type, dy,
                   CASE WHEN v > LAG(v) OVER w THEN 1
                        WHEN v < LAG(v) OVER w THEN 0
                        ELSE NULL END AS up
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY dy)
        ), signs AS (
            SELECT event_type, dy, up,
                   CASE WHEN up IS DISTINCT FROM
                             LAG(up) OVER (PARTITION BY event_type
                                           ORDER BY dy)
                        THEN 1 ELSE 0 END AS run_start
            FROM moves WHERE up IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_moves,
               CAST(SUM(up) AS BIGINT) AS n_up,
               CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down,
               CAST(SUM(run_start) AS BIGINT) AS n_runs,
               CAST(SUM(run_start) * COUNT(*)
                    - (2 * SUM(up) * (COUNT(*) - SUM(up)) + COUNT(*))
                    AS BIGINT) AS runs_minus_expected_x_n,
               CAST(CASE WHEN SUM(run_start) * COUNT(*)
                              < 2 * SUM(up) * (COUNT(*) - SUM(up))
                                + COUNT(*)
                         THEN 1 ELSE 0 END AS BIGINT) AS trending
        FROM signs
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Wald-Wolfowitz runs test on daily up/down moves per "
    "event type: sign runs are counted with one LAG comparison "
    "(ties dropped, per the classic), and the observed run count "
    "compares against the null expectation E[R] = 2*n1*n2/n + 1 "
    "ENTIRELY by integer cross-multiplication R*n vs 2*n1*n2 + n "
    "— runs_minus_expected_x_n < 0 flags momentum (too few runs), "
    "> 0 oscillation. The randomness sanity check that should "
    "precede any trend claim. Scale: events collapse to day grain "
    "map-side; both lag windows run per series over calendar-"
    "bounded rows; the report is series-count-sized.",
)
def stat_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("dy")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("dy")
    moves = daily.select(
        "event_type",
        "dy",
        F.when(F.col("v") > F.lag("v").over(w), 1)
        .when(F.col("v") < F.lag("v").over(w), 0)
        .otherwise(F.lit(None))
        .alias("up"),
    ).filter(F.col("up").isNotNull())
    signs = moves.select(
        "event_type",
        "up",
        (~F.lag("up").over(w).eqNullSafe(F.col("up")))
        .cast("long")
        .alias("run_start"),
    )
    n = F.count(F.lit(1))
    n_up = F.sum("up")
    runs = F.sum("run_start")
    return (
        signs.groupBy("event_type")
        .agg(
            n.cast("long").alias("n_moves"),
            n_up.cast("long").alias("n_up"),
            (n - n_up).cast("long").alias("n_down"),
            runs.cast("long").alias("n_runs"),
            (runs * n - (2 * n_up * (n - n_up) + n))
            .cast("long")
            .alias("runs_minus_expected_x_n"),
            (runs * n < 2 * n_up * (n - n_up) + n)
            .cast("long")
            .alias("trending"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- freshness / staleness

# (table, date column, per-pipeline reference clock, SLA days)
_FRESH_TABLES = (
    ("orders", "o_orderdate", "2002-01-01", 200),
    ("lineitem", "l_shipdate", "2002-01-01", 100),
    ("events", "ts", "2024-03-01", 45),
)


def _fresh_oracle() -> str:
    parts = []
    for t, c, ref, sla in _FRESH_TABLES:
        parts.append(f"""
        SELECT '{t}' AS table_name,
               strftime(MAX(CAST({c} AS DATE)), '%Y-%m-%d')
                   AS latest_date,
               CAST(date_diff('day', MAX(CAST({c} AS DATE)),
                              DATE '{ref}') AS BIGINT)
                   AS staleness_days,
               CAST({sla} AS BIGINT) AS sla_days,
               CAST(CASE WHEN date_diff('day', MAX(CAST({c} AS DATE)),
                                        DATE '{ref}') <= {sla}
                         THEN 1 ELSE 0 END AS BIGINT) AS within_sla
        FROM {t}""")
    unions = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({unions}) u ORDER BY table_name"


@query(
    "dq_freshness_staleness_audit",
    oracle=_fresh_oracle(),
    description="Per-table freshness audit against each pipeline's "
    "own reference clock (order/ship pipelines vs the event "
    "stream's): latest date, staleness in days, and a per-table "
    "SLA flag — the first tile on a data-quality dashboard. "
    "Deliberately minimal per table: one MAX aggregate riding the "
    "scan (a date-typed max is footer-statistics-answerable at "
    "100 TB — the audit costs metadata, not IO, on a well-laid-out "
    "lake), three tables unioned into a three-row report.",
)
def dq_freshness_staleness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    outs = []
    for t, c, ref, sla in _FRESH_TABLES:
        df = load_table(spark, sf_dir, t)
        latest = F.max(F.col(c).cast("date"))
        outs.append(
            df.agg(
                F.date_format(latest, "yyyy-MM-dd").alias("latest_date"),
                F.datediff(F.lit(ref).cast("date"), latest)
                .cast("long")
                .alias("staleness_days"),
            ).select(
                F.lit(t).alias("table_name"),
                "latest_date",
                "staleness_days",
                F.lit(sla).cast("long").alias("sla_days"),
                (F.col("staleness_days") <= sla).cast("long").alias(
                    "within_sla"
                ),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy("table_name")
