"""Structured-Streaming queries surfaced through the driver harness.

``streaming_hourly_counts`` actually runs a streaming query (file
source over the events parquet -> windowed agg -> memory sink,
Trigger.AvailableNow) and returns the materialized result; the oracle
is plain batch SQL — proving stream/batch semantic equivalence, which
is Structured Streaming's core contract.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

from ..sources.tables import convert_events_ts, events_read_schema, load_table
from ..streaming.windows import tumbling_counts
from .registry import query


@query(
    "streaming_hourly_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    description="True streaming run: parquet file source -> 1h tumbling "
    "window agg -> memory sink (AvailableNow); oracle is the batch SQL.",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source wants a directory; glob-filter to just the events
    # table inside the sf dir
    stream = convert_events_ts(
        spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = tumbling_counts(stream, window_size="1 hour")
    sink_name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name).orderBy("window_start", "event_type")


@query(
    "batch_hourly_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    description="Same windowed aggregation on the batch path (F.window on a "
    "static DataFrame) — stream/batch parity bookend.",
)
def batch_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events, window_size="1 hour").orderBy(
        "window_start", "event_type"
    )


@query(
    "streaming_sliding_counts",
    oracle="""
        WITH windows AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts)
                       - k * INTERVAL 30 MINUTE AS window_start,
                   event_type, value
            FROM events, (VALUES (0), (1)) offs(k)
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
        FROM windows
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    description="True streaming run of a SLIDING (hopping) window: 1h "
    "windows every 30min, each event lands in exactly two windows; the "
    "oracle replays the assignment with shifted 30-minute time buckets "
    "in batch SQL.",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import sliding_counts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = convert_events_ts(
        spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = sliding_counts(stream, window_size="1 hour", slide="30 minutes")
    sink_name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name).orderBy("window_start", "event_type")


@query(
    "streaming_dedup_replay",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT event_id) AS n_unique
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Exactly-once from at-least-once: the stream replays "
    "every event twice (two file-source reads unioned — the duplicate "
    "delivery an at-least-once source produces); dropDuplicates on "
    "event_id within the watermark restores exactly-once counts, which "
    "the oracle pins to the true distinct counts per type.",
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def one_pass() -> DataFrame:
        return convert_events_ts(
            spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )

    replayed = one_pass().unionByName(one_pass())
    deduped = (
        replayed.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    sink_name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name).orderBy("event_type")


@query(
    "streaming_stream_stream_join",
    oracle="""
        SELECT c.user_id AS user_id,
               COUNT(*) AS n_pairs,
               COUNT(DISTINCT c.event_id) AS n_clicks_matched,
               COUNT(DISTINCT p.event_id) AS n_purchases_matched
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click'
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 6 HOUR
        GROUP BY 1
        ORDER BY user_id
    """,
    description="True STREAM-STREAM inner join (the two-sided-state "
    "Structured Streaming operator): a click stream joins a purchase "
    "stream on user_id with a 6-hour event-time interval condition; "
    "both sides carry watermarks so the join state is bounded — exactly "
    "the plan shape a 100 TB two-topic correlation would run. The "
    "joined pairs land in an append-mode sink; the per-user pair/"
    "distinct counts are a batch rollup of the sink, and the oracle is "
    "the equivalent batch interval self-join.",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def side(event_type: str, prefix: str) -> DataFrame:
        stream = convert_events_ts(
            spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
        return (
            stream.filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "12 hours")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 6 HOURS")),
        "inner",
    )
    sink_name = f"stream_join_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink_name)
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_id").alias("n_clicks_matched"),
            F.countDistinct("p_id").alias("n_purchases_matched"),
        )
        .orderBy("user_id")
    )


@query(
    "skew_salted_event_totals",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Skew-safe two-phase aggregation (operators/skew.py::"
    "salted_aggregate): event_type has only 5 values — every key is a "
    "hot key — so the partial aggregates through a 16-way deterministic "
    "salt before the final merge. The oracle is the plain GROUP BY: "
    "salting must be invisible in the result.",
)
def skew_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    events = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(15,2)")
    )
    out = salted_aggregate(
        events,
        group_cols=["event_type"],
        agg_exprs={
            "n_events": ("count", "event_id"),
            "sum_dec": ("sum", "value_dec"),
            "max_value": ("max", "value"),
        },
        salt_cols=["event_id"],
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
        "max_value",
    ).orderBy("event_type")


@query(
    "streaming_stateful_user_totals",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events_total,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Custom stateful streaming operator "
    "(applyInPandasWithState): per-user lifetime counters maintained in "
    "the checkpointed state store across micro-batches. Values are "
    "accumulated as exact integer cents inside the Python state (float "
    "sums would be order-sensitive) and rescaled on output, so the "
    "result hash-matches the batch GROUP BY oracle.",
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_totals

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = convert_events_ts(
        spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # exact cents: value has two decimals by fixture contract, so
    # round(value*100) is an integer — deterministic accumulation
    cents = stream.select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("value")
    )
    totals = running_user_totals(cents)
    sink_name = f"stream_state_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # counters only grow: MAX per user = the final update even if the
    # source split into multiple micro-batches
    return (
        spark.table(sink_name)
        .groupBy("user_id")
        .agg(
            F.max("n_events_total").alias("n_events_total"),
            (F.max("sum_value_total") / 100.0).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_static_enrich",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Stream-static enrichment: the events file stream "
    "joins a STATIC broadcast customer dimension inside the "
    "micro-batch plan (the standard fact-stream x dim-table shape; "
    "no watermark needed on the static side, and the dim re-resolves "
    "per micro-batch so slowly-refreshed dims pick up new snapshots). "
    "Complete-mode agg to a memory sink under AvailableNow; oracle is "
    "the batch join.",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    stream = convert_events_ts(
        spark.readStream.schema(events_read_schema(os.path.join(sf_dir, "events.parquet")))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    enriched = stream.join(dim, stream.user_id == dim.c_custkey)
    # ONE streaming aggregation: structured streaming supports neither
    # chained aggs nor distinct aggs on a stream, so the surface here
    # is count + exact-decimal sum per segment
    final = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias("sum_value"),
    )
    sink_name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        final.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name).select(
        "c_mktsegment", "n_events", "sum_value"
    ).orderBy("c_mktsegment")


@query(
    "streaming_daily_distinct_users",
    oracle="""
        SELECT CAST(ts AS DATE)::TIMESTAMP AS day,
               COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS approx_within_10pct
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    description="Streaming distinct-cardinality monitoring: exact "
    "COUNT(DISTINCT) is not executable under streaming semantics "
    "(unbounded state per window), so the streaming path carries "
    "approx_count_distinct (HLL, rsd=0.02) through a 1-day tumbling "
    "window — mergeable partials, bounded state — and the batch path "
    "computes the exact count the oracle pins. The sketch estimate "
    "itself is engine-specific, so it leaves the result as the "
    "self-graded approx_within_10pct boolean (the sketch-tier "
    "convention): hash-stable, and a real assertion that the "
    "streaming sketch landed. This is the nightly-dashboard shape at "
    "100 TB/day: the stream maintains sketches; exact audits run "
    "behind on the batch path.",
)
def streaming_daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = convert_events_ts(
        spark.readStream.schema(
            events_read_schema(os.path.join(sf_dir, "events.parquet"))
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = stream.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    sink_name = f"stream_daily_users_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(sink_name).select(
        F.col("w.start").alias("day"), "approx_users", "n_events"
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").cast("timestamp").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
    )
    return (
        streamed.join(exact, "day")
        .select(
            "day",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(0.10) * F.col("exact_users").cast("double")
            ).alias("approx_within_10pct"),
        )
        .orderBy("day")
    )


RATE_CAP_MILLI = 2000  # 2-token bucket
RATE_REFILL_US = 21_600_000_000  # 1 token per 6 hours


def _rate_t2(cap: int, refill: int) -> str:
    return f"LEAST({cap}, s.tokens + (g.gap_us * 1000) // {refill})"


@query(
    "streaming_token_bucket_quota",
    oracle=f"""
        WITH RECURSIVE ev AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ), gaps AS (
            SELECT user_id, rn, ts_us,
                   ts_us - lag(ts_us) OVER (
                       PARTITION BY user_id ORDER BY rn
                   ) AS gap_us
            FROM ev
        ), sim AS (
            SELECT user_id, rn,
                   CASE WHEN {RATE_CAP_MILLI} >= 1000
                        THEN {RATE_CAP_MILLI} - 1000
                        ELSE {RATE_CAP_MILLI} END AS tokens,
                   CASE WHEN {RATE_CAP_MILLI} >= 1000
                        THEN 1 ELSE 0 END AS adm,
                   CASE WHEN {RATE_CAP_MILLI} >= 1000
                        THEN 0 ELSE 1 END AS den
            FROM gaps WHERE rn = 1
            UNION ALL
            SELECT g.user_id, g.rn,
                   CASE WHEN {_rate_t2(RATE_CAP_MILLI, RATE_REFILL_US)}
                             >= 1000
                        THEN {_rate_t2(RATE_CAP_MILLI, RATE_REFILL_US)}
                             - 1000
                        ELSE {_rate_t2(RATE_CAP_MILLI, RATE_REFILL_US)}
                        END,
                   s.adm + CASE WHEN
                       {_rate_t2(RATE_CAP_MILLI, RATE_REFILL_US)} >= 1000
                       THEN 1 ELSE 0 END,
                   s.den + CASE WHEN
                       {_rate_t2(RATE_CAP_MILLI, RATE_REFILL_US)} >= 1000
                       THEN 0 ELSE 1 END
            FROM sim s
            JOIN gaps g
              ON g.user_id = s.user_id AND g.rn = s.rn + 1
        ), final AS (
            SELECT user_id, rn, tokens, adm, den,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY rn DESC
                   ) AS rr
            FROM sim
        )
        SELECT user_id,
               CAST(rn AS BIGINT) AS n_events,
               CAST(adm AS BIGINT) AS n_admitted,
               CAST(den AS BIGINT) AS n_denied,
               CAST(tokens AS BIGINT) AS tokens_milli
        FROM final WHERE rr = 1
        ORDER BY user_id
    """,
    description="Per-user token-bucket rate limiting as a CUSTOM "
    "stateful streaming operator (applyInPandasWithState): a 2-token "
    "bucket refilling 1 token per 6 hours admits or denies each event "
    "in event-time order, with the bucket level + last timestamp "
    "living in the checkpointed state store across micro-batches — "
    "the admission-control primitive behind API quotas and ingest "
    "throttles, inexpressible as windowed aggregation because the "
    "recurrence is order-sensitive and non-associative. All "
    "arithmetic is exact integer milli-tokens (floor refill), so the "
    "DuckDB oracle can replay the identical simulation as a "
    "RECURSIVE CTE over per-user event ranks — a full cross-engine "
    "check of a stateful streaming program, recursion depth = max "
    "events per key. State is 5 ints per key partitioned across "
    "executors; the per-event Python loop is the honest cost of an "
    "inherently sequential recurrence.",
)
def streaming_token_bucket_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ratelimit import token_bucket_admissions

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = convert_events_ts(
        spark.readStream.schema(
            events_read_schema(os.path.join(sf_dir, "events.parquet"))
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    slim = stream.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    out = token_bucket_admissions(
        slim, RATE_CAP_MILLI, RATE_REFILL_US
    )
    sink_name = f"stream_rate_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # n_seen grows monotonically: the emission with max n_seen per user
    # is the final state even if the source split into micro-batches
    return (
        spark.table(sink_name)
        .groupBy("user_id")
        .agg(
            F.max("n_seen").cast("bigint").alias("n_events"),
            F.max_by("n_admitted", "n_seen").cast("bigint").alias("n_admitted"),
            F.max_by("n_denied", "n_seen").cast("bigint").alias("n_denied"),
            F.max_by("tokens_milli", "n_seen")
            .cast("bigint")
            .alias("tokens_milli"),
        )
        .orderBy("user_id")
    )
