"""Wave-84 (round 5): word2vec-style pair generation + robust
time-series flagging.

* ``text_skipgram_pairs`` — skip-gram (center, context) pair counts
  with window +/-2, the data-prep pass behind word2vec/GloVe-style
  embedding training: tokens are positioned once, and the context
  join is an equi-join on doc with a position-band predicate, so the
  fan-out per token is bounded by the window (<= 4 contexts), never
  quadratic in document length.
* ``anomaly_hampel_filter_daily`` — the Hampel filter (rolling
  median +/- 3*MAD) on daily event value, done EXACTLY in integer
  arithmetic: medians of milli-quantized values live in the x2
  domain (2*median of ints is an exact integer), MAD in the x4
  domain, and the outlier test |v - med| > 3*MAD becomes the
  integer cross-multiplication 2*|2v - med_x2| > 3*mad_x4 — the
  robust anomaly gate that a mean/stddev z-score can't provide when
  the contaminating spike drags the baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# -------------------------------------------------- skip-gram pairs

_SKIP_WINDOW = 2
_SKIP_TOP = 20


@query(
    "text_skipgram_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   u.p.pos AS pos, u.p.tok AS tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split(trim(text), ' '),
                                   t -> t <> '') AS arr
                FROM documents
            ) d,
            unnest(list_transform(range(1, len(d.arr) + 1),
                                  i -> {{'pos': i, 'tok': d.arr[i]}})) u(p)
        ), fwd AS (
            SELECT a.tok AS w1, b.tok AS w2
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id
             AND b.pos - a.pos BETWEEN 1 AND {_SKIP_WINDOW}
        ), pairs AS (
            SELECT w1, w2 FROM fwd
            UNION ALL
            SELECT w2 AS w1, w1 AS w2 FROM fwd
        )
        SELECT w1 AS center, w2 AS context,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs
        GROUP BY w1, w2
        ORDER BY n_pairs DESC, center, context
        LIMIT {_SKIP_TOP}
    """,
    description="Skip-gram (center, context) pair generation with a "
    "+/-2 window — the data-prep pass behind word2vec/GloVe-style "
    "training: tokens are positioned once via posexplode, the "
    "context join is an equi-join on doc_id with a position-band "
    "predicate (each token sees at most 4 contexts, so the pair "
    "stream is a bounded multiple of the token stream, never "
    "quadratic in document length), and both directions come from "
    "ONE forward join mirrored, halving the join work. At 100 TB "
    "the join co-partitions on doc_id — the same shuffle the "
    "tokenizer already produced — and pair counting is map-side "
    "combined; top-k is TakeOrdered.",
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.trim(F.col("text")), " "), lambda t: t != "")
        ).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    a = toks.alias("a")
    b = toks.alias("b")
    fwd = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") - F.col("a.pos") >= 1)
        & (F.col("b.pos") - F.col("a.pos") <= _SKIP_WINDOW),
    ).select(F.col("a.tok").alias("w1"), F.col("b.tok").alias("w2"))
    pairs = fwd.unionAll(
        fwd.select(F.col("w2").alias("w1"), F.col("w1").alias("w2"))
    )
    return (
        pairs.groupBy(
            F.col("w1").alias("center"), F.col("w2").alias("context")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "center", "context")
        .limit(_SKIP_TOP)
    )


# --------------------------------------------- Hampel filter (3*MAD)


@query(
    "anomaly_hampel_filter_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ), med AS (
            SELECT d1.event_type, d1.dy, d1.v,
                   CAST(2 * MEDIAN(d2.v) AS BIGINT) AS med_x2
            FROM daily d1 JOIN daily d2
              ON d1.event_type = d2.event_type
             AND d2.dy BETWEEN d1.dy - 3 AND d1.dy + 3
            GROUP BY d1.event_type, d1.dy, d1.v
        ), mad AS (
            SELECT m.event_type, m.dy, m.v, m.med_x2,
                   CAST(2 * MEDIAN(abs(2 * d2.v - m.med_x2)) AS BIGINT)
                       AS mad_x4
            FROM med m JOIN daily d2
              ON m.event_type = d2.event_type
             AND d2.dy BETWEEN m.dy - 3 AND m.dy + 3
            GROUP BY m.event_type, m.dy, m.v, m.med_x2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN 2 * abs(2 * v - med_x2) > 3 * mad_x4
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(MAX(2 * abs(2 * v - med_x2) - 3 * mad_x4) AS BIGINT)
                   AS max_margin_x4
        FROM mad
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Hampel filter on daily event value per type: each "
    "day is tested against the median and MAD of its +/-3-day "
    "neighborhood, with the entire test in EXACT integer arithmetic "
    "— values are milli-quantized, medians live in the x2 domain "
    "(2*median of integers is an exact integer even when "
    "interpolated), MAD in the x4 domain, and |v - med| > 3*MAD is "
    "the cross-multiplication 2*|2v - med_x2| > 3*mad_x4. The "
    "robust gate a z-score can't be: one spike drags a mean but not "
    "a median. Scale: the event stream collapses to day grain "
    "first, so the two neighborhood joins (median pass, MAD pass) "
    "run over calendar-bounded rows per series — fan-out <= 7 by "
    "construction — and the report is series-count-sized.",
)
def anomaly_hampel_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy("event_type", F.col("ts").cast("date").alias("dy"))
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("long"))
            .cast("long")
            .alias("v")
        )
        .localCheckpoint(eager=False)  # feeds both neighborhood joins
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    med = (
        d1.join(
            d2,
            (F.col("d1.event_type") == F.col("d2.event_type"))
            & (F.col("d2.dy") >= F.date_sub(F.col("d1.dy"), 3))
            & (F.col("d2.dy") <= F.date_add(F.col("d1.dy"), 3)),
        )
        .groupBy(
            F.col("d1.event_type").alias("event_type"),
            F.col("d1.dy").alias("dy"),
            F.col("d1.v").alias("v"),
        )
        .agg(
            (2 * F.expr("percentile(d2.v, 0.5)"))
            .cast("long")
            .alias("med_x2")
        )
    )
    m = med.alias("m")
    mad = (
        m.join(
            d2,
            (F.col("m.event_type") == F.col("d2.event_type"))
            & (F.col("d2.dy") >= F.date_sub(F.col("m.dy"), 3))
            & (F.col("d2.dy") <= F.date_add(F.col("m.dy"), 3)),
        )
        .groupBy(
            F.col("m.event_type").alias("event_type"),
            F.col("m.dy").alias("dy"),
            F.col("m.v").alias("v"),
            F.col("m.med_x2").alias("med_x2"),
        )
        .agg(
            (2 * F.expr("percentile(abs(2 * d2.v - m.med_x2), 0.5)"))
            .cast("long")
            .alias("mad_x4")
        )
    )
    return (
        mad.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(
                (
                    2 * F.abs(2 * F.col("v") - F.col("med_x2"))
                    > 3 * F.col("mad_x4")
                ).cast("long")
            )
            .cast("long")
            .alias("n_flagged"),
            F.max(
                2 * F.abs(2 * F.col("v") - F.col("med_x2"))
                - 3 * F.col("mad_x4")
            )
            .cast("long")
            .alias("max_margin_x4"),
        )
        .orderBy("event_type")
    )
