"""Wave-91 (round 5): hysteresis alerting + gain-chart model eval.

* ``alert_hysteresis_daily`` — two-threshold (Schmitt-trigger)
  alerting per event type: enter alert when the daily value reaches
  the HIGH rail, exit only when it falls below the LOW rail — the
  flap-suppression every production monitor needs. The stateful-
  looking recurrence is decomposed into windows: the state at day t
  is simply the MOST RECENT crossing's direction (crossings are
  days that touch a rail; between rails the state carries), i.e. a
  last-non-null forward fill — no keyed scan required, which is the
  point: recognize when an 'obviously stateful' operator is
  actually a window.
* ``ml_gain_chart_deciles`` — the gain (cumulative capture) chart
  for the fixed-weight quality classifier: documents rank by score
  descending (deterministic doc_id tiebreak), split into exact
  row-number deciles, and each decile reports its positives plus
  the cumulative capture rate in integer permille — the 'how deep
  must I score to catch 80% of the good ones' curve that ranks
  models operationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ hysteresis alerting

_HYST_HI_MILLIS = 54_000  # enter alert: daily mean value >= 54.0
_HYST_LO_MILLIS = 48_000  # exit alert: daily mean value < 48.0


@query(
    "alert_hysteresis_daily",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ), crossings AS (
            SELECT event_type, dy, n, v,
                   CASE WHEN v >= n * {_HYST_HI_MILLIS} THEN 1
                        WHEN v < n * {_HYST_LO_MILLIS} THEN 0
                        ELSE NULL END AS cross_state
            FROM daily
        ), filled AS (
            SELECT event_type, dy,
                   COALESCE(
                       LAST_VALUE(cross_state IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY dy
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                       0) AS alert_on
            FROM crossings
        ), runs AS (
            SELECT event_type, dy, alert_on,
                   CASE WHEN alert_on = 1 AND COALESCE(
                            LAG(alert_on) OVER (PARTITION BY event_type
                                                ORDER BY dy), 0) = 0
                        THEN 1 ELSE 0 END AS episode_start
            FROM filled
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(alert_on) AS BIGINT) AS alert_days,
               CAST(SUM(episode_start) AS BIGINT) AS n_episodes,
               CASE WHEN SUM(episode_start) > 0
                    THEN strftime(MIN(CASE WHEN episode_start = 1
                                           THEN dy END), '%Y-%m-%d')
                    ELSE NULL END AS first_alert_day
        FROM runs
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Schmitt-trigger (hysteresis) alerting per event "
    "type: alert turns ON when daily mean value reaches 54 (integer "
    "cross-multiplication v >= n*54000, milli-exact) and OFF only "
    "below 48 — the flap-suppressor every monitor needs. The "
    "'stateful' recurrence is decomposed exactly: between-rails "
    "days carry the last rail crossing, so state = last-non-null "
    "forward fill over day-grain rows, then alert episodes are "
    "rising edges — pure windows, no keyed scan; recognizing that "
    "decomposition is precisely what keeps this operator "
    "distributed. Scale: events collapse to (type, day) grain "
    "map-side; both windows partition per series over calendar-"
    "bounded rows.",
)
def alert_hysteresis_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("dy")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v"),
    )
    crossings = daily.select(
        "event_type",
        "dy",
        F.when(F.col("v") >= F.col("n") * _HYST_HI_MILLIS, 1)
        .when(F.col("v") < F.col("n") * _HYST_LO_MILLIS, 0)
        .otherwise(F.lit(None))
        .alias("cross_state"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = crossings.select(
        "event_type",
        "dy",
        F.coalesce(
            F.last("cross_state", ignorenulls=True).over(wf), F.lit(0)
        ).alias("alert_on"),
    )
    wl = Window.partitionBy("event_type").orderBy("dy")
    runs = filled.select(
        "event_type",
        "dy",
        "alert_on",
        (
            (F.col("alert_on") == 1)
            & (F.coalesce(F.lag("alert_on").over(wl), F.lit(0)) == 0)
        )
        .cast("long")
        .alias("episode_start"),
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("alert_on").cast("long").alias("alert_days"),
            F.sum("episode_start").cast("long").alias("n_episodes"),
            F.when(
                F.sum("episode_start") > 0,
                F.date_format(
                    F.min(
                        F.when(F.col("episode_start") == 1, F.col("dy"))
                    ),
                    "yyyy-MM-dd",
                ),
            )
            .otherwise(F.lit(None).cast("string"))
            .alias("first_alert_day"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------- gain chart

_GAIN_LABEL_CHARS = 306  # positive: n_chars >= corpus median (same as
# the calibration query — one label definition across the eval family)


@query(
    "ml_gain_chart_deciles",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tok,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   1.5 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE))
                       - 0.002 * CAST(n_chars AS DOUBLE) - 5.0 AS score,
                   CASE WHEN n_chars >= {_GAIN_LABEL_CHARS}
                        THEN 1 ELSE 0 END AS label
            FROM feats
        ), ranked AS (
            SELECT label,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM scored
        ), deciled AS (
            SELECT ((rn - 1) * 10) // n AS decile, label FROM ranked
        ), per AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(label) AS BIGINT) AS n_pos
            FROM deciled GROUP BY decile
        )
        SELECT decile, n_docs, n_pos,
               CAST(SUM(n_pos) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos,
               CAST((SUM(n_pos) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     * 1000) // (SELECT SUM(n_pos) FROM per) AS BIGINT)
                   AS cum_capture_permille
        FROM per
        ORDER BY decile
    """,
    description="Gain chart for the fixed-weight quality classifier: "
    "documents rank by decision score descending (deterministic "
    "doc_id tiebreak; the score's expression tree is identical in "
    "both engines so the double sort key is bit-portable), split "
    "into exact row-number deciles, and each decile reports its "
    "positives plus cumulative capture in integer permille — the "
    "'score this deep to catch X% of positives' curve that decides "
    "review budgets. Scale note: the global rank is the textbook "
    "form pinned by the oracle; the production path for the decile "
    "assignment is the repo's exact-percentile cutpoint broadcast "
    "(rfm_customer_segments pattern) — only the 10-row decile "
    "report and its prefix sum are inherently ordered, and both "
    "are decile-grain.",
)
def ml_gain_chart_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    feats = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    score = (
        F.lit(1.5)
        * (F.col("n_chars").cast("double") / F.col("n_tok").cast("double"))
        - F.lit(0.002) * F.col("n_chars").cast("double")
        - F.lit(5.0)
    )
    scored = feats.select(
        "doc_id",
        score.alias("score"),
        (F.col("n_chars") >= _GAIN_LABEL_CHARS).cast("long").alias("label"),
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    ranked = scored.select(
        "label",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    per = (
        ranked.select(
            F.expr("((rn - 1) * 10) div n").alias("decile"), "label"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        .localCheckpoint(eager=False)  # 10 rows; feeds cumsum + total
    )
    tot = per.agg(F.sum("n_pos").alias("t"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.withColumn("cum_pos", F.sum("n_pos").over(wc).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            "cum_pos",
            F.expr("(cum_pos * 1000) div t")
            .cast("long")
            .alias("cum_capture_permille"),
        )
        .orderBy("decile")
    )
