"""Stream-stream join: the result is oracle-checked by
``streaming_stream_stream_join`` (plans/streaming_q.py); this test pins
the EXECUTION shape the 100 TB claim rests on — the join must run as
the two-sided stateful ``symmetricHashJoin`` operator with watermarks
wired in, not fall back to a batch-style join over a materialized
source.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
    ]
)


def test_stream_stream_join_runs_as_symmetric_hash_state(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "events.csv").write_text(
        "event_id,user_id,ts,kind\n"
        "1,7,2024-01-01 10:00:00,click\n"
        "2,7,2024-01-01 10:20:00,purchase\n"
        "3,7,2024-01-01 12:00:00,click\n"
        "4,7,2024-01-01 19:00:00,purchase\n"  # outside the 6h bound of 3
        "5,9,2024-01-01 11:00:00,purchase\n"  # right time, wrong user
    )

    def side(kind, prefix):
        return (
            spark.readStream.schema(SCHEMA)
            .option("header", "true")
            .csv(str(src))
            .filter(F.col("kind") == kind)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "12 hours")
        )

    pairs = side("click", "c").join(
        side("purchase", "p"),
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 6 HOURS")),
        "inner",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # semantic check: only the in-window pair joins
    got = {(r.c_id, r.p_id) for r in spark.table(name).collect()}
    assert got == {(1, 2)}

    # execution-shape check: a two-sided stateful join operator ran,
    # with state rows tracked on both sides
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no stateful progress recorded"
    ops = [op for p in progresses for op in p["stateOperators"]]
    assert any(op.get("operatorName") == "symmetricHashJoin" for op in ops), ops
    assert any(op.get("numRowsTotal", 0) > 0 for op in ops)
