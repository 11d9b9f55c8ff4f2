"""Wave-44 (round 5): tokenizer train→apply loop closure, and the
watermark-lateness profile via a running-MAX decomposition (the
associative-aggregate family proven for sum/count now demonstrated
for max — oracle keeps the textbook global window).

Portability notes follow the registry grammar (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .analytics21 import (
    _BPE_SQL_WORDS,
    _bpe_learn,
    _bpe_sql_merge,
    _bpe_sql_pairs,
)
from .registry import query

# -------------------------------------------- BPE tokenize (apply)


@query(
    "pipeline_bpe_tokenize_apply",
    oracle=f"""
        WITH {_BPE_SQL_WORDS},
        {_bpe_sql_pairs("b1", "r0")},
        {_bpe_sql_merge("r1", "r0", "b1")},
        {_bpe_sql_pairs("b2", "r1")},
        {_bpe_sql_merge("r2", "r1", "b2")},
        {_bpe_sql_pairs("b3", "r2")},
        {_bpe_sql_merge("r3", "r2", "b3")},
        counted AS (
            SELECT r0.w, r0.c,
                   len(list_filter(string_split(trim(r0.s, '·'), '··'),
                                   x -> x <> '')) AS n0,
                   len(list_filter(string_split(trim(r3.s, '·'), '··'),
                                   x -> x <> '')) AS n3
            FROM r0 JOIN r3 USING (w)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
               CAST(SUM(c * n0) AS BIGINT) AS symbols_before,
               CAST(SUM(c * n3) AS BIGINT) AS symbols_after,
               CAST(SUM(c * n3) AS DOUBLE) / CAST(SUM(c * n0) AS DOUBLE)
                   AS compression_ratio
        FROM counted
    """,
    description="Tokenizer train→APPLY loop closure: the 3 merges "
    "learned by text_bpe_merge_rounds are applied back to the whole "
    "frequency-weighted vocabulary and the corpus-level symbol counts "
    "before/after report the realized compression — the number a "
    "tokenizer owner actually ships on (every merge trades one "
    "vocab slot for measured corpus-wide savings). Same scale shape "
    "as the trainer: all passes run over the Heaps-saturating "
    "distinct-word table with the corpus read once for counts; "
    "per-word symbol counts are array lengths (exact ints), and the "
    "single double is the final ratio.",
)
def pipeline_bpe_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, r0, merged = _bpe_learn(spark, sf_dir)

    def n_syms(col):
        return F.size(
            F.filter(
                F.split(F.expr(f"trim(BOTH '·' FROM {col})"), "··"),
                lambda x: x != "",
            )
        )

    counted = (
        r0.select("w", "c", n_syms("s").alias("n0"))
        .join(merged.select("w", n_syms("s").alias("n3")), "w")
    )
    before = F.sum(F.col("c") * F.col("n0"))
    after = F.sum(F.col("c") * F.col("n3"))
    return counted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_words"),
        before.cast("bigint").alias("symbols_before"),
        after.cast("bigint").alias("symbols_after"),
        (after.cast("double") / before.cast("double")).alias(
            "compression_ratio"
        ),
    )


# ------------------------------------- watermark lateness profile



@query(
    "events_watermark_lateness_profile",
    oracle="""
        WITH ordered AS (
            SELECT event_id, epoch_us(ts) AS ts_us,
                   md5(CAST(event_id AS VARCHAR)) AS ak
            FROM events
        ), marked AS (
            SELECT event_id, ts_us,
                   MAX(ts_us) OVER (
                       ORDER BY ak, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS wm_us
            FROM ordered
        ), lat AS (
            SELECT CASE
                     WHEN wm_us IS NULL OR ts_us >= wm_us THEN 0
                     WHEN wm_us - ts_us <= 60000000 THEN 1
                     WHEN wm_us - ts_us <= 3600000000 THEN 2
                     WHEN wm_us - ts_us <= 86400000000 THEN 3
                     ELSE 4
                   END AS bucket_id
            FROM marked
        )
        SELECT bucket_id,
               CASE bucket_id WHEN 0 THEN 'on_time'
                              WHEN 1 THEN 'le_1m'
                              WHEN 2 THEN 'le_1h'
                              WHEN 3 THEN 'le_1d'
                              ELSE 'gt_1d' END AS lateness_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM lat
        GROUP BY bucket_id
        ORDER BY bucket_id
    """,
    description="Watermark-lateness profile: under a deterministic "
    "md5(event_id) arrival permutation (a synthetic out-of-order "
    "network-arrival model — the fixture's ids are time-ordered, so "
    "identity order would show nothing), each event's lateness is "
    "how far its event time "
    "sits behind the running maximum event time seen strictly before "
    "it — exactly the quantity a Structured Streaming watermark "
    "delay must cover, measured BEFORE committing a delay (too short "
    "drops data, too long bloats state). The running max is an "
    "entity-grain ordered aggregate, so the Spark side extends the "
    "cumsum two-level decomposition to MAX (any associative "
    "aggregate decomposes: md5-prefix bucket maxes + bounded-spine "
    "exclusive carry + bucket-partitioned exclusive windows) while "
    "the oracle keeps the textbook global exclusive window — the "
    "hash match proves the max decomposition just as it proved the "
    "sum. Lateness buckets (on-time / 1m / 1h / 1d / more) in exact "
    "microseconds.",
)
def events_watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ordered = events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.md5(F.col("event_id").cast("string")).alias("ak"),
        # 256 order-aligned buckets: the 2-hex-char prefix is a
        # monotone function of the (ak, event_id) arrival order
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2).alias("b"),
    )
    # bucket maxes -> exclusive carry over the bounded bucket spine
    bmax = ordered.groupBy("b").agg(F.max("ts_us").alias("bm"))
    spine = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bmax.select("b", F.max("bm").over(spine).alias("carry_us"))
    # exclusive running max within each bucket
    win = (
        Window.partitionBy("b")
        .orderBy("ak", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        ordered.withColumn("in_us", F.max("ts_us").over(win))
        .join(carry, "b")
        .withColumn(
            # greatest() skips nulls (first row of a bucket has no
            # in-bucket max; buckets before the first have no carry)
            "wm_us",
            F.greatest("in_us", "carry_us"),
        )
    )
    late = F.col("wm_us") - F.col("ts_us")
    bucket_id = (
        F.when(F.col("wm_us").isNull() | (late <= 0), 0)
        .when(late <= 60_000_000, 1)
        .when(late <= 3_600_000_000, 2)
        .when(late <= 86_400_000_000, 3)
        .otherwise(4)
    )
    return (
        marked.select(bucket_id.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "bucket_id",
            F.when(F.col("bucket_id") == 0, "on_time")
            .when(F.col("bucket_id") == 1, "le_1m")
            .when(F.col("bucket_id") == 2, "le_1h")
            .when(F.col("bucket_id") == 3, "le_1d")
            .otherwise("gt_1d")
            .alias("lateness_bucket"),
            "n_events",
        )
        .orderBy("bucket_id")
    )
