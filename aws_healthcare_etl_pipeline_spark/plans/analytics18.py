"""Wave-28: search relevance, training-mix design, EWMA smoothing, and
padding-waste auditing — four operators an LLM-data platform runs daily.

Every query follows the engine-portability grammar established in
``registry.py`` / SCALE.md: no libm on data (the only transcendental
used is ``sqrt``, which IEEE 754 requires to be correctly rounded in
both engines), order-sensitive double sums are replaced by exact
integer sums (micro/nano fixed-point via ``floor``), and every exact
integer that leaves for DOUBLE stays below 2^53 or is a single
int64->double conversion (round-to-nearest in both the JVM and C).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from ..sources.tables import load_table
from .registry import dec, query

# fixed ad-hoc search: terms from the corpus vocabulary
BM25_TERMS = ["spark", "query", "vector", "stream", "filter", "hash"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)
K1 = 1.2  # BM25 tf saturation
# b = 0.75 written as 0.25 + 0.75*r on BOTH sides so the op shapes match


@query(
    "search_bm25_topk",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), dl AS (
            SELECT doc_id, t, len(t) AS dl FROM d
        ), stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
        ), hits AS (
            SELECT doc_id, dl, unnest(t) AS term FROM dl
        ), tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf
            FROM hits WHERE term IN ({_TERMS_SQL})
            GROUP BY doc_id, dl, term
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
            SELECT tf.doc_id,
                   CAST(FLOOR(
                       ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
                       * (CAST(tf AS DOUBLE) * ({K1} + 1.0)
                          / (CAST(tf AS DOUBLE)
                             + {K1} * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                                 / (CAST(total_dl AS DOUBLE)
                                    / CAST(n_docs AS DOUBLE))))))
                       * 1000000.0) AS BIGINT) AS term_micro
            FROM tf JOIN dfreq USING (term), stats
        )
        SELECT doc_id,
               CAST(SUM(term_micro) AS BIGINT) AS bm25_micro,
               CAST(COUNT(*) AS INT) AS n_terms_hit
        FROM scored GROUP BY doc_id
        ORDER BY bm25_micro DESC, doc_id
        LIMIT 20
    """,
    description="Ad-hoc search over the corpus: BM25 (k1=1.2, b=0.75) "
    "top-20 documents for a fixed 6-term query. The idf is the "
    "rational odds form (N-df+0.5)/(df+0.5) — BM25's ln is monotone "
    "in it, so the RANKING is unchanged while the score stays "
    "libm-free and bit-portable. Per-term scores are floored to "
    "integer micro-units before the per-doc sum, making the sum "
    "order-insensitive (doubles would hash-diverge under Spark's "
    "nondeterministic partial-agg order). Plan: tokenize once, "
    "explode+filter to the 6 terms (predicate right above the "
    "generator), tf one shuffle on (doc, term); df is a 6-row "
    "broadcast; corpus stats a 1-row broadcast; global top-20 is "
    "TakeOrdered (O(n) scan, k-row driver transfer) — at 100 TB the "
    "inverted-index variant (inverted_index_top_terms) builds the "
    "postings once instead of rescanning per query set.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).select("doc_id", "t", F.size("t").alias("dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    hits = toks.select(
        "doc_id", "dl", F.explode("t").alias("term")
    ).filter(F.col("term").isin(BM25_TERMS))
    tf = hits.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (
        F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tf_norm = (
        F.col("tf").cast("double") * F.lit(K1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + F.lit(K1)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * tf_norm * F.lit(1_000_000.0)).alias("term_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_micro").alias("bm25_micro"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(20)
    )


MIX_BUDGET_TOKENS = 1_000_000_000  # the training run's token budget


@query(
    "pipeline_source_mixing_weights",
    oracle=f"""
        WITH per_source AS (
            SELECT source,
                   SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                       AS n_tokens
            FROM documents GROUP BY source
        ), tot AS (
            SELECT SUM(n_tokens) AS total_tokens FROM per_source
        ), w AS (
            SELECT source, n_tokens,
                   CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)
                       / CAST(total_tokens AS DOUBLE)) * 1000000000.0)
                       AS BIGINT) AS weight_nano
            FROM per_source, tot
        ), norm AS (
            SELECT SUM(weight_nano) AS tot_nano FROM w
        )
        SELECT source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               weight_nano,
               CAST(weight_nano AS DOUBLE) / CAST(tot_nano AS DOUBLE)
                   AS p_mix,
               CAST(weight_nano AS DOUBLE) / CAST(tot_nano AS DOUBLE)
                   * {MIX_BUDGET_TOKENS}.0 / CAST(n_tokens AS DOUBLE)
                   AS expected_epochs
        FROM w, norm
        ORDER BY source
    """,
    description="Training-mix design: temperature-based source "
    "sampling weights (the multilingual/multi-source rebalancing "
    "step every LLM pretraining run performs). Temperature alpha=0.5 "
    "so the up-weighting is sqrt(share) — sqrt is the one "
    "transcendental IEEE 754 requires correctly rounded, so the "
    "weights are bit-portable; any other alpha plugs into the same "
    "plan via pow. Weights are floored to nano-units and normalized "
    "by an exact integer sum (source-count grain). expected_epochs = "
    "p_mix * budget / n_tokens flags sources the mix would repeat "
    "past memorization-risk thresholds. One partial-agg shuffle on "
    "source; everything after runs on a source-count-sized frame.",
)
def pipeline_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").alias("total_tokens"))
    w = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.floor(
            F.sqrt(
                F.col("n_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            )
            * F.lit(1_000_000_000.0)
        ).alias("weight_nano"),
    )
    norm = w.agg(F.sum("weight_nano").alias("tot_nano"))
    p_mix = F.col("weight_nano").cast("double") / F.col("tot_nano").cast("double")
    return (
        w.crossJoin(F.broadcast(norm))
        .select(
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "weight_nano",
            p_mix.alias("p_mix"),
            (
                p_mix
                * F.lit(float(MIX_BUDGET_TOKENS))
                / F.col("n_tokens").cast("double")
            ).alias("expected_epochs"),
        )
        .orderBy("source")
    )


EWMA_LAGS = 13  # trailing window; lambda = 1/2 per calendar day


def _ewma_sql_terms() -> tuple[str, str]:
    """Numerator / denominator SQL for the 14-day lag-weighted EWMA.

    Weight for a row k calendar days back is 2^(EWMA_LAGS - k), i.e.
    the current day carries 2^13 = 8192 and the oldest in-window day
    carries 1 — all weights are in [1, 8192], so the int64 product
    v_cents * weight is safe for any daily value below 2^50 cents
    (~$11.3e12/day) regardless of how many days the series spans.
    """
    num = " + ".join(
        f"COALESCE(lag(v_cents, {k}) OVER w * {1 << (EWMA_LAGS - k)}, 0)"
        for k in range(EWMA_LAGS + 1)
    )
    den = " + ".join(
        f"CASE WHEN lag(v_cents, {k}) OVER w IS NOT NULL"
        f" THEN {1 << (EWMA_LAGS - k)} ELSE 0 END"
        for k in range(EWMA_LAGS + 1)
    )
    return num, den


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_sql_terms()


@query(
    "events_ewma_daily_value",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(15,2))) * 100 AS BIGINT)
                       AS v_cents
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ), span AS (
            SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY event_type
        ), spine AS (
            SELECT event_type,
                   CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                               CAST(d1 AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM span
        ), dense AS (
            SELECT s.event_type, s.day, d.v_cents
            FROM spine s
            LEFT JOIN daily d
              ON s.event_type = d.event_type AND s.day = d.day
        ), win AS (
            SELECT event_type, day, v_cents,
                   {_EWMA_NUM_SQL} AS s_num,
                   {_EWMA_DEN_SQL} AS s_den
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, day::TIMESTAMP AS day,
               CAST(CAST(v_cents AS DOUBLE) / 100.0 AS DOUBLE) AS daily_value,
               CAST(s_num AS DOUBLE) / CAST(s_den AS DOUBLE) / 100.0
                   AS ewma_value
        FROM win
        WHERE v_cents IS NOT NULL
        ORDER BY event_type, day
    """,
    description="Exponentially weighted moving average of daily event "
    "value per event type (lambda=1/2 per calendar day, 14-day "
    "trailing window) — the standard smoothed-metric monitor. The "
    "two-engine trick: weights are carried as EXACT integers, and — "
    "this is the overflow fix — they are anchored to the CURRENT row, "
    "not the partition start: each calendar spine is densified "
    "(sequence/generate_series per type), and the frame is 14 "
    "explicit lag() taps where the tap k days back weighs "
    "2^(13-k) in [1, 8192]. The product v_cents * weight therefore "
    "stays below 2^63 for any daily value under ~$11e12 and ANY "
    "series length — no day_idx shift, no 62-day exclusion, no "
    "domain cliff; missing days contribute neither value nor weight "
    "(renormalized over observed days). The only doubles are two "
    "int64->double conversions and two divisions, deterministic in "
    "both engines. The heavy table reduces through one partial-agg "
    "shuffle to the (type x day) grain; the lag taps run on the "
    "bounded calendar spine, the scale-sanctioned place for an "
    "ordered window (SCALE.md).",
)
def events_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            dec("value").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg((F.sum("v") * 100).cast("bigint").alias("v_cents"))
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    dense = spine.join(daily, ["event_type", "day"], "left")
    w = Window.partitionBy("event_type").orderBy("day")
    taps = [F.lag("v_cents", k).over(w) for k in range(EWMA_LAGS + 1)]
    num = reduce(
        add,
        [
            F.coalesce(t * F.lit(1 << (EWMA_LAGS - k)), F.lit(0))
            for k, t in enumerate(taps)
        ],
    )
    den = reduce(
        add,
        [
            F.when(t.isNotNull(), F.lit(1 << (EWMA_LAGS - k))).otherwise(
                F.lit(0)
            )
            for k, t in enumerate(taps)
        ],
    )
    return (
        dense.select(
            "event_type",
            "day",
            "v_cents",
            num.alias("s_num"),
            den.alias("s_den"),
        )
        .filter(F.col("v_cents").isNotNull())
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            (F.col("v_cents").cast("double") / F.lit(100.0)).alias("daily_value"),
            (
                F.col("s_num").cast("double")
                / F.col("s_den").cast("double")
                / F.lit(100.0)
            ).alias("ewma_value"),
        )
        .orderBy("event_type", "day")
    )


PAD_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]


def _bucket_case_sql() -> str:
    branches = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in PAD_BUCKETS
    )
    return f"CASE {branches} ELSE -1 END"


@query(
    "pipeline_length_bucket_padding",
    oracle=f"""
        WITH lens AS (
            SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ), bucketed AS (
            SELECT {_bucket_case_sql()} AS bucket, n_tokens FROM lens
        )
        SELECT CAST(bucket AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
               CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
               CAST(bucket * COUNT(*) - SUM(n_tokens) AS BIGINT)
                   AS waste_tokens,
               CAST(bucket * COUNT(*) - SUM(n_tokens) AS DOUBLE)
                   / CAST(bucket * COUNT(*) AS DOUBLE) AS waste_frac
        FROM bucketed
        GROUP BY bucket
        ORDER BY bucket
    """,
    description="Padding-waste audit for length-bucketed batching: "
    "docs bin to the next power-of-two sequence length (fixed CASE "
    "boundaries — integer comparisons, no log2) and each bucket "
    "reports real vs padded token counts and the waste fraction. "
    "This is the measurement that decides between plain bucketing "
    "and sequence packing (pipeline_sequence_packing / "
    "pipeline_ffd_packing quantify the packed alternative). "
    "Map-only projection + one partial-agg shuffle onto <=9 bucket "
    "rows; waste_frac divides two exact sub-2^53 integers.",
)
def pipeline_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = token_count(F.col("text"))
    bucket = F.lit(None).cast("int")
    expr = None
    for b in PAD_BUCKETS:
        cond = nt <= F.lit(b)
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    bucket = expr.otherwise(F.lit(-1))
    lens = docs.select(bucket.alias("bucket"), nt.alias("n_tokens"))
    padded = F.col("bucket").cast("bigint") * F.col("n_docs")
    return (
        lens.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("real_tokens"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "real_tokens",
            padded.alias("padded_tokens"),
            (padded - F.col("real_tokens")).alias("waste_tokens"),
            (
                (padded - F.col("real_tokens")).cast("double")
                / padded.cast("double")
            ).alias("waste_frac"),
        )
        .orderBy("bucket")
    )
