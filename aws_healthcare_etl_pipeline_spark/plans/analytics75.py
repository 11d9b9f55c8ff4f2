"""Wave-101 (round 5): nearest-direction as-of + voiced-run
segmentation.

* ``asof_nearest_purchase_click`` — the NEAREST as-of join (sensor-
  fusion semantics: pandas merge_asof direction='nearest'):
  each purchase matches its temporally closest click within a 1-day
  tolerance, composed from the repo's backward and forward as-of
  operators with an exact integer tie rule (smaller |delta| wins,
  ties to the backward match) — completing the as-of family
  (backward, forward, tolerance, nearest). Rolled up per user:
  matches, mean |delta| seconds, direction mix.
* ``multimodal_audio_vad_segments`` — voice-activity segmentation
  on top of the zero-crossing lane: per-frame voiced flags collapse
  into RUNS by the sentinel-gap identity (segment lengths are the
  gaps between consecutive unvoiced sentinel positions minus one),
  entirely inside-row list algebra — no explode, no shuffle until
  the per-source rollup of segment counts and longest runs. The
  utterance-extraction step between VAD flags and ASR in every
  speech pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- nearest as-of join

_NEAR_TOL = "1 day"


@query(
    "asof_nearest_purchase_click",
    oracle="""
        WITH purchases AS (
            SELECT event_id AS p_id, user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT user_id, ts AS c_ts, MIN(event_id) AS c_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ), cand AS (
            SELECT p.p_id, p.user_id,
                   c.c_id,
                   CAST(date_diff('second', c.c_ts, p.p_ts) AS BIGINT)
                       AS delta_s,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.p_id
                       ORDER BY abs(date_diff('second', c.c_ts, p.p_ts)),
                                CASE WHEN c.c_ts <= p.p_ts
                                     THEN 0 ELSE 1 END,
                                c.c_id) AS rk
            FROM purchases p JOIN clicks c
              ON c.user_id = p.user_id
             AND c.c_ts >= p.p_ts - INTERVAL 1 DAY
             AND c.c_ts <= p.p_ts + INTERVAL 1 DAY
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(abs(delta_s)) AS BIGINT) AS sum_abs_delta_s,
               CAST(SUM(CASE WHEN delta_s >= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_backward,
               CAST(MAX(abs(delta_s)) AS BIGINT) AS max_abs_delta_s
        FROM cand WHERE rk = 1
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Nearest-direction as-of join (merge_asof "
    "direction='nearest'): each purchase matches its temporally "
    "closest click within a 1-day tolerance — composed from the "
    "repo's backward and forward as-of operators, with the exact "
    "tie rule smaller |delta| wins, ties to the backward match "
    "(clicks deduped per (user, ts) to the minimum id first, per "
    "the operator's tie contract) — completing the as-of family. "
    "The oracle takes the argmin directly over a tolerance-bounded "
    "band join. Per-user rollup: matches, total/max |delta| "
    "seconds, backward share. Scale: both as-of passes are the "
    "union-window operator (one shuffle on user_id each, no range "
    "join); the nearest pick is a per-row CASE on two candidate "
    "columns.",
)
def asof_nearest_purchase_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("c_ts"))
        .agg(F.min("event_id").alias("c_id"))
    )
    bwd = asof_join(
        purchases,
        clicks.select(
            "user_id",
            "c_ts",
            F.col("c_id").alias("b_id"),
            F.col("c_ts").alias("b_ts"),  # matched time rides as payload
        ),
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        direction="backward",
        tolerance=_NEAR_TOL,
    ).select("p_id", "user_id", "p_ts", "b_id", "b_ts")
    fwd = asof_join(
        purchases,
        clicks.select(
            "user_id",
            "c_ts",
            F.col("c_id").alias("f_id"),
            F.col("c_ts").alias("f_ts"),
        ),
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        direction="forward",
        tolerance=_NEAR_TOL,
    ).select(F.col("p_id").alias("p_id2"), "f_id", "f_ts")
    both = bwd.join(fwd, F.col("p_id") == F.col("p_id2"))
    b_delta = F.col("p_ts").cast("long") - F.col("b_ts").cast("long")
    f_delta = F.col("p_ts").cast("long") - F.col("f_ts").cast("long")
    use_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_delta <= -f_delta)
    )
    chosen = both.select(
        "p_id",
        "user_id",
        F.when(use_b, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("c_id"),
        F.when(use_b, b_delta).otherwise(f_delta).alias("delta_s"),
    ).filter(F.col("c_id").isNotNull())
    return (
        chosen.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(F.abs("delta_s")).cast("long").alias("sum_abs_delta_s"),
            F.sum((F.col("delta_s") >= 0).cast("long"))
            .cast("long")
            .alias("n_backward"),
            F.max(F.abs("delta_s")).cast("long").alias("max_abs_delta_s"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------- audio VAD segments

_VAD_FRAME = 16
_VAD_HOP = 16  # non-overlapping frames: flags partition the stream
_VAD_DC = 79  # DC center: midpoint of the printable byte band


@query(
    "multimodal_audio_vad_segments",
    oracle=f"""
        WITH smp AS (
            SELECT doc_id, source,
                   list_filter(
                       list_transform(
                           list_filter(string_split_regex(text, ''),
                                       c -> c <> ''),
                           c -> ascii(c)),
                       s -> s BETWEEN 32 AND 126) AS s
            FROM documents
        ), flags AS (
            SELECT doc_id, source,
                   list_transform(
                       range(0, len(s) - {_VAD_FRAME} + 1, {_VAD_HOP}),
                       st -> CASE WHEN
                           list_sum(list_transform(
                               range(1, {_VAD_FRAME}),
                               i -> CASE WHEN (s[st + i] - {_VAD_DC})
                                             * (s[st + i + 1] - {_VAD_DC})
                                             < 0
                                    THEN 1 ELSE 0 END)) * 4
                           < {_VAD_FRAME - 1}
                           THEN 1 ELSE 0 END) AS v
            FROM smp
        ), seg AS (
            SELECT doc_id, source, v,
                   [0] || list_filter(
                       list_transform(range(1, len(v) + 1),
                                      i -> CASE WHEN v[CAST(i AS INT)] = 0
                                                THEN i END),
                       x -> x IS NOT NULL) || [len(v) + 1] AS unv
            FROM flags
        ), gaps AS (
            SELECT doc_id, source,
                   list_transform(range(1, len(unv)),
                                  j -> unv[CAST(j + 1 AS INT)]
                                       - unv[CAST(j AS INT)] - 1) AS g
            FROM seg
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(SUM(list_sum(list_transform(g,
                        x -> CASE WHEN x > 0 THEN 1 ELSE 0 END))), 0)
                    AS BIGINT) AS n_segments,
               CAST(COALESCE(SUM(list_sum(g)), 0) AS BIGINT)
                   AS voiced_frames,
               CAST(MAX(list_max(g)) AS BIGINT) AS max_segment_len
        FROM gaps
        GROUP BY source
        ORDER BY source
    """,
    description="Voice-activity segmentation over the zero-crossing "
    "lane: non-overlapping 16-sample frames flag voiced (low-ZCR "
    "via the integer cross-multiplication 4*zc < transitions), and "
    "voiced runs collapse to segments by the SENTINEL-GAP identity "
    "— segment lengths are the gaps between consecutive unvoiced "
    "positions (0 and n+1 as sentinels) minus one — entirely "
    "inside-row list algebra on MATERIALIZED arrays (no explode, "
    "no per-element re-evaluation), one shuffle only at the "
    "per-source rollup of segment counts and longest runs. The "
    "utterance-extraction step between VAD flags and ASR. Exact "
    "int64 end-to-end.",
)
def multimodal_audio_vad_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    samples = F.filter(
        F.transform(
            F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
            F.ascii,
        ),
        lambda s: (s >= 32) & (s <= 126),
    )
    smp = docs.select("source", samples.alias("s"))
    n = F.size("s")
    starts = F.when(
        n >= _VAD_FRAME,
        F.sequence(F.lit(0), n - _VAD_FRAME, F.lit(_VAD_HOP)),
    ).otherwise(F.array().cast("array<int>"))
    zc_of = lambda st: F.aggregate(  # noqa: E731
        F.zip_with(
            F.slice("s", st + 1, F.lit(_VAD_FRAME - 1)),
            F.slice("s", st + 2, F.lit(_VAD_FRAME - 1)),
            lambda a, b: F.when(
                (a - _VAD_DC).cast("long") * (b - _VAD_DC).cast("long") < 0,
                1,
            ).otherwise(0),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    v = F.transform(
        starts,
        lambda st: F.when(zc_of(st) * 4 < _VAD_FRAME - 1, 1).otherwise(0),
    )
    flags = smp.select("source", v.alias("v"))
    unv = F.concat(
        F.array(F.lit(0)),
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("v")),
                lambda i: F.when(F.element_at("v", i.cast("int")) == 0, i),
            ),
            lambda x: x.isNotNull(),
        ),
        F.array(F.size("v") + 1),
    )
    seg = flags.select("source", "v", unv.alias("unv"))
    g = F.transform(
        F.sequence(F.lit(1), F.size("unv") - 1),
        lambda j: F.element_at("unv", (j + 1).cast("int"))
        - F.element_at("unv", j.cast("int"))
        - 1,
    )
    gaps = seg.select("source", g.alias("g"))
    return (
        gaps.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(
                F.sum(
                    F.aggregate(
                        F.transform(
                            "g",
                            lambda x: F.when(x > 0, 1).otherwise(0),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x.cast("bigint"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_segments"),
            F.coalesce(
                F.sum(
                    F.aggregate(
                        "g",
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x.cast("bigint"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("voiced_frames"),
            F.max(F.array_max("g")).cast("long").alias("max_segment_len"),
        )
        .orderBy("source")
    )
