"""Wave-82 (round 5): sequential experimentation + classifier
calibration.

* ``experiment_sprt_daily_replay`` — Wald's sequential probability
  ratio test replayed EXACTLY per event type: for the symmetric
  hypotheses p0=1/3 vs p1=2/3 the likelihood ratio is
  ``2^(2s-n)`` (s = successful days of the first n), so the SPRT
  with thresholds 32 / (1/32) reduces to the integer random walk
  ``2s-n`` crossing +/-5 — the earliest-stopping decision is the
  first day that crossing happens, with no logarithm or float ever
  entering the plan. The always-on experiment monitor: at 100 TB the
  walk lives at day grain (bounded rows per experiment arm), built
  from one map-side-combined daily aggregate of the event stream.
* ``ml_calibration_reliability_bins`` — the reliability diagram for
  the fixed-weight linear quality classifier: documents are bucketed
  by the integer floor of their decision score (identical expression
  trees in both engines make the double bit-portable; floor is
  exact), and each bin reports observed positive rate vs the bin's
  predicted sign — the monotonicity-of-calibration audit that
  catches a mis-scaled model before it gates a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------- SPRT daily replay

_SPRT_VALUE_MILLIS = 50_000  # success day: mean event value > 50.0
_SPRT_BOUND = 5  # |2s - n| >= 5  <=>  LR outside [1/32, 32]


@query(
    "experiment_sprt_daily_replay",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v_millis
            FROM events GROUP BY 1, 2
        ), trials AS (
            SELECT event_type, dy,
                   CASE WHEN v_millis > n * {_SPRT_VALUE_MILLIS}
                        THEN 1 ELSE 0 END AS success
            FROM daily
        ), walk AS (
            SELECT event_type, dy,
                   CAST(2 * SUM(success) OVER w
                        - COUNT(*) OVER w AS BIGINT) AS walk,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_days
            FROM trials
            WINDOW w AS (PARTITION BY event_type ORDER BY dy
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), crossed AS (
            SELECT event_type, MIN(dy) AS decision_dy
            FROM walk WHERE walk >= {_SPRT_BOUND} OR walk <= -{_SPRT_BOUND}
            GROUP BY event_type
        ), final AS (
            SELECT event_type,
                   MAX(n_days) AS total_days,
                   MAX_BY(walk, dy) AS final_walk
            FROM walk GROUP BY event_type
        )
        SELECT f.event_type,
               f.total_days,
               f.final_walk,
               CASE WHEN c.decision_dy IS NULL THEN 'continue'
                    WHEN w.walk >= {_SPRT_BOUND} THEN 'accept_high'
                    ELSE 'accept_low' END AS decision,
               CASE WHEN c.decision_dy IS NULL THEN NULL
                    ELSE strftime(c.decision_dy, '%Y-%m-%d') END
                   AS decision_day,
               CAST(COALESCE(w.n_days, 0) AS BIGINT) AS days_to_decision
        FROM final f
        LEFT JOIN crossed c ON c.event_type = f.event_type
        LEFT JOIN walk w ON w.event_type = f.event_type
                        AND w.dy = c.decision_dy
        ORDER BY f.event_type
    """,
    description="Wald SPRT replay per event type with EXACT integer "
    "arithmetic: for the symmetric hypotheses p0=1/3 vs p1=2/3 the "
    "likelihood ratio collapses to 2^(2s-n), so the 1/32..32 "
    "decision band is the random walk 2s-n crossing +/-5 — the "
    "sequential A/B monitor that stops experiments early, with the "
    "stopping day attributed exactly (first crossing wins, later "
    "excursions ignored). Success days compare milli-quantized "
    "value sums by integer cross-multiplication (mean value > 50). "
    "Scale: the event stream collapses to (arm, day) grain in one "
    "map-side-combined pass; the walk window runs over day-grain "
    "rows (bounded by calendar length per arm, independent of event "
    "volume), so the sequential part never touches raw events.",
)
def experiment_sprt_daily_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("dy")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v_millis"),
    )
    trials = daily.select(
        "event_type",
        "dy",
        (F.col("v_millis") > F.col("n") * _SPRT_VALUE_MILLIS)
        .cast("long")
        .alias("success"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = trials.select(
        "event_type",
        "dy",
        (2 * F.sum("success").over(w) - F.count(F.lit(1)).over(w))
        .cast("long")
        .alias("walk"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days"),
    ).localCheckpoint(eager=False)  # feeds crossing, final state, and the
    # decision-day join — pin the day-grain walk once
    crossed = (
        walk.filter(
            (F.col("walk") >= _SPRT_BOUND) | (F.col("walk") <= -_SPRT_BOUND)
        )
        .groupBy("event_type")
        .agg(F.min("dy").alias("decision_dy"))
    )
    final = walk.groupBy("event_type").agg(
        F.max("n_days").cast("long").alias("total_days"),
        F.max_by("walk", "dy").cast("long").alias("final_walk"),
    )
    wj = walk.select(
        F.col("event_type").alias("w_type"),
        F.col("dy").alias("w_dy"),
        F.col("walk").alias("w_walk"),
        F.col("n_days").alias("w_n_days"),
    )
    return (
        final.join(F.broadcast(crossed), "event_type", "left")
        .join(
            F.broadcast(wj),
            (F.col("event_type") == F.col("w_type"))
            & (F.col("decision_dy") == F.col("w_dy")),
            "left",
        )
        .select(
            "event_type",
            "total_days",
            "final_walk",
            F.when(F.col("decision_dy").isNull(), "continue")
            .when(F.col("w_walk") >= _SPRT_BOUND, "accept_high")
            .otherwise("accept_low")
            .alias("decision"),
            F.when(
                F.col("decision_dy").isNull(), F.lit(None).cast("string")
            )
            .otherwise(F.date_format("decision_dy", "yyyy-MM-dd"))
            .alias("decision_day"),
            F.coalesce(F.col("w_n_days"), F.lit(0))
            .cast("long")
            .alias("days_to_decision"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- calibration reliability bins

_CAL_LABEL_CHARS = 306  # positive label: n_chars >= corpus median


@query(
    "ml_calibration_reliability_bins",
    oracle=f"""
        WITH feats AS (
            SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tok,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        ), scored AS (
            SELECT 1.5 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE))
                       - 0.002 * CAST(n_chars AS DOUBLE) - 5.0 AS score,
                   CASE WHEN n_chars >= {_CAL_LABEL_CHARS}
                        THEN 1 ELSE 0 END AS label
            FROM feats
        ), binned AS (
            SELECT LEAST(GREATEST(CAST(floor(score) AS BIGINT), -4), 8)
                       AS score_bin,
                   label
            FROM scored
        )
        SELECT score_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST((SUM(label) * 1000) // COUNT(*) AS BIGINT)
                   AS pos_rate_permille,
               CAST(CASE WHEN score_bin >= 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS predicted_pass
        FROM binned
        GROUP BY score_bin
        ORDER BY score_bin
    """,
    description="Reliability diagram for the fixed-weight linear "
    "quality classifier: documents bucket by the integer floor of "
    "their decision score (clamped to [-4, 8]; the score's "
    "expression tree is written identically in both engines so the "
    "double is bit-portable, and floor/clamp are exact), and each "
    "bin reports its observed positive rate in integer permille "
    "against the bin's predicted side of the boundary — the "
    "calibration audit that catches a mis-scaled or inverted model "
    "before it gates a corpus. Scale: one narrow projection plus a "
    "map-side-combined aggregate over at most 13 bins; the report "
    "is bin-count-sized regardless of corpus size.",
)
def ml_calibration_reliability_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    feats = docs.select(
        n_tok.alias("n_tok"), F.col("n_chars").cast("bigint").alias("n_chars")
    )
    score = (
        F.lit(1.5)
        * (F.col("n_chars").cast("double") / F.col("n_tok").cast("double"))
        - F.lit(0.002) * F.col("n_chars").cast("double")
        - F.lit(5.0)
    )
    binned = feats.select(
        F.least(
            F.greatest(F.floor(score).cast("long"), F.lit(-4)), F.lit(8)
        ).alias("score_bin"),
        (F.col("n_chars") >= _CAL_LABEL_CHARS).cast("long").alias("label"),
    )
    return (
        binned.groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        .select(
            "score_bin",
            "n_docs",
            "n_pos",
            F.expr("(n_pos * 1000) div n_docs")
            .cast("long")
            .alias("pos_rate_permille"),
            (F.col("score_bin") >= 0).cast("long").alias("predicted_pass"),
        )
        .orderBy("score_bin")
    )
