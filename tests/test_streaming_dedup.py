"""Streaming exactly-once event dedup: dropDuplicates within the
watermark horizon — the standard at-least-once -> effectively-once
repair for replayed event streams (the reference's duplicate-on-retry
semantics, fixed in-stream)."""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "event_id,ts,value\n" + "\n".join(f"{e},{t},{v}" for e, t, v in rows) + "\n"
    )


def test_streaming_dedup_drops_replayed_events(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    # batch 1: events 1,2 (+ an in-batch duplicate of 1)
    _write(
        src / "b1.csv",
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 10:01:00", 2.0),
        ],
    )
    collected: list = []

    def run():
        stream = (
            spark.readStream.schema(SCHEMA).option("header", "true").csv(str(src))
        )
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
        q = (
            deduped.writeStream.outputMode("append")
            .foreachBatch(lambda df, _: collected.extend(df.collect()))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sorted(r.event_id for r in collected) == [1, 2]

    # batch 2 replays event 2 (at-least-once upstream) + new event 3:
    # the dedup state must drop the replay across batches
    _write(
        src / "b2.csv",
        [(2, "2024-01-01 10:01:00", 2.0), (3, "2024-01-01 10:05:00", 3.0)],
    )
    collected.clear()
    run()
    assert sorted(r.event_id for r in collected) == [3]
