"""Wave-79 (round 5): pipeline observability + temporal repeat rates.

* ``pipeline_filter_attrition_funnel`` — why-was-my-document-dropped
  observability: the quality gate's rules are ORDERED and every
  document is attributed to its FIRST failing rule (or survives), so
  the funnel sums exactly to the corpus — the attrition report that
  turns a black-box filter stack into a debuggable pipeline, computed
  as one conditional-aggregation pass (rule order = CASE order).
* ``events_repeat_rate_7d`` — per-day repeat rate: the share of
  events whose (user, event_type) pair already occurred in the prior
  7 days, via a day-grain range semi-join (distinct day pairs within
  the window) — the temporal-dedup diagnostic behind retention
  cleaning and bot detection, with no per-event self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- filter attrition funnel

# ordered gate: first failing rule claims the document
_ATTR_MIN_TOKENS = 15
_ATTR_MAX_TOKENS = 450
_ATTR_MAX_WORDLEN_X10 = 120  # mean word length <= 12.0 chars (x10 exact)


@query(
    "pipeline_filter_attrition_funnel",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS ntok,
                   len(replace(text, ' ', '')) AS nchar
            FROM documents
        ), staged AS (
            SELECT doc_id,
                   CASE
                     WHEN ntok < {_ATTR_MIN_TOKENS} THEN '1_too_short'
                     WHEN ntok > {_ATTR_MAX_TOKENS} THEN '2_too_long'
                     WHEN nchar * 10 > ntok * {_ATTR_MAX_WORDLEN_X10}
                         THEN '3_long_words'
                     ELSE '4_survived'
                   END AS stage
            FROM d
        )
        SELECT stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST((COUNT(*) * 1000) // (SELECT COUNT(*) FROM staged)
                    AS BIGINT) AS share_permille
        FROM staged GROUP BY stage ORDER BY stage
    """,
    description="Filter-attrition funnel for an ordered quality gate: "
    "every document is attributed to its FIRST failing rule (token "
    "floor, token ceiling, mean-word-length cap via the integer "
    "cross-multiplication nchar*10 > ntok*120 — no float means) or "
    "to the survivor bucket, so the funnel partitions the corpus "
    "exactly — the observability report that turns a filter stack "
    "into something debuggable ('rule 3 suddenly eats 40% of a "
    "source' is a data bug you want named). One conditional-"
    "aggregation pass; at 100 TB the report stays rule-count-sized "
    "and rides the same scan the filter itself needs.",
)
def pipeline_filter_attrition_funnel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("ntok"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).alias("nchar"),
    )
    staged = d.select(
        F.when(F.col("ntok") < _ATTR_MIN_TOKENS, "1_too_short")
        .when(F.col("ntok") > _ATTR_MAX_TOKENS, "2_too_long")
        .when(
            F.col("nchar") * 10 > F.col("ntok") * _ATTR_MAX_WORDLEN_X10,
            "3_long_words",
        )
        .otherwise("4_survived")
        .alias("stage")
    )
    tot = staged.agg(F.count(F.lit(1)).alias("t"))
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "stage",
            "n_docs",
            F.expr("(n_docs * 1000) div t")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("stage")
    )


# ------------------------------------------------ 7-day repeat rate


@query(
    "events_repeat_rate_7d",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events
        ), daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   user_id, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2, 3
        ), flagged AS (
            SELECT d.day, d.n,
                   EXISTS (
                       SELECT 1 FROM pairs p
                       WHERE p.user_id = d.user_id
                         AND p.event_type = d.event_type
                         AND p.day >= d.day - 7 AND p.day < d.day
                   ) AS is_repeat
            FROM daily d
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN is_repeat THEN n ELSE 0 END) AS BIGINT)
                   AS repeat_events,
               CAST((SUM(CASE WHEN is_repeat THEN n ELSE 0 END) * 1000)
                    // SUM(n) AS BIGINT) AS repeat_permille
        FROM flagged GROUP BY day ORDER BY day
    """,
    description="Per-day 7-day repeat rate: the share of events whose "
    "(user, event_type) pair already occurred in the prior seven "
    "days — the temporal-dedup diagnostic behind retention cleaning "
    "and bot detection. Events first collapse to (day, user, type) "
    "counts, so the lookback is a day-grain range SEMI join over "
    "distinct pairs (at most 7 candidate days per row), never a "
    "per-event self-join; at 100 TB both sides shuffle once on "
    "(user, type) and the 7-day range condition bounds the join "
    "fan-out by construction.",
)
def events_repeat_rate_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day"), "user_id", "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = daily.select(
        "user_id", "event_type", F.col("day").alias("pday")
    ).distinct()
    flagged = (
        daily.join(
            pairs,
            (daily["user_id"] == pairs["user_id"])
            & (daily["event_type"] == pairs["event_type"])
            & (pairs["pday"] >= F.date_sub(daily["day"], 7))
            & (pairs["pday"] < daily["day"]),
            "left_semi",
        )
        .select("day", "n")
        .withColumn("is_repeat", F.lit(True))
    )
    base = daily.groupBy("day").agg(F.sum("n").alias("n_events"))
    reps = flagged.groupBy("day").agg(F.sum("n").alias("repeat_events"))
    return (
        base.join(reps, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_events").cast("long").alias("n_events"),
            F.coalesce(F.col("repeat_events"), F.lit(0))
            .cast("long")
            .alias("repeat_events"),
            F.expr(
                "(coalesce(repeat_events, 0) * 1000) div n_events"
            )
            .cast("long")
            .alias("repeat_permille"),
        )
        .orderBy("day")
    )
