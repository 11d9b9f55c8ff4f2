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

from ..sources.tables import EVENTS_RAW_SCHEMA, convert_events_ts, load_table
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
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
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
