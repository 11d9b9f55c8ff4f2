"""Watermark semantics in append mode: closed windows emit once; events
arriving later than the watermark delay are dropped, not double-counted.
"""

from __future__ import annotations

from pyspark.sql import types as T

from aws_healthcare_etl_pipeline_spark.streaming.windows import tumbling_counts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        + "\n".join(f"{e},{t},1,click,{v}," for e, t, v in rows)
        + "\n"
    )


def _run(spark, src, ckpt, collected):
    stream = spark.readStream.schema(SCHEMA).option("header", "true").csv(str(src))
    agg = tumbling_counts(stream, window_size="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, _: collected.extend(df.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_append_mode_emits_closed_windows_and_drops_late_events(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    collected: list = []

    # batch 1: window [10:00, 11:00) gets 2 events; max ts 12:00 ->
    # watermark 11:30 -> the 10:00 window is closed and emitted
    _write(
        src / "b1.csv",
        [
            (1, "2024-01-01 10:05:00", 1.0),
            (2, "2024-01-01 10:10:00", 2.0),
            (3, "2024-01-01 12:00:00", 4.0),
        ],
    )
    _run(spark, src, ckpt, collected)
    emitted = {
        (r.window_start.hour, r.n_events, r.sum_value) for r in collected
    }
    assert (10, 2, 3.0) in emitted
    assert not any(h == 12 for h, _, _ in emitted)  # 12:00 window still open

    # batch 2: a LATE event for the already-closed 10:00 window must be
    # dropped — the window never re-emits
    collected.clear()
    _write(src / "b2.csv", [(4, "2024-01-01 10:20:00", 99.0)])
    _run(spark, src, ckpt, collected)
    assert not any(r.window_start.hour == 10 for r in collected), collected
