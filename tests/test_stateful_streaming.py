"""applyInPandasWithState: per-user lifetime totals must accumulate
across micro-batches AND across query restarts (state-store recovery).
"""

from __future__ import annotations

from pyspark.sql import types as T

from aws_healthcare_etl_pipeline_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("user_id,value\n" + "\n".join(f"{u},{v}" for u, v in rows) + "\n")


def _run_batch(spark, src, ckpt, sink_name):
    # memory sink can't recover from a checkpoint; foreachBatch can —
    # and it's the production sink shape anyway
    collected: list = []

    stream = (
        spark.readStream.schema(SCHEMA).option("header", "true").csv(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, epoch: collected.extend(df.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r.user_id: (r.n_events_total, r.sum_value_total) for r in collected}


def test_state_accumulates_across_batches_and_restarts(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write(src / "b1.csv", [(1, 10.0), (1, 5.0), (2, 1.0)])
    out1 = _run_batch(spark, src, ckpt, "totals_1")
    assert out1 == {1: (2, 15.0), 2: (1, 1.0)}

    # second file, NEW query instance (restart): state must be recovered
    # from the checkpointed state store, not reset
    _write(src / "b2.csv", [(1, 2.0), (3, 7.0)])
    out2 = _run_batch(spark, src, ckpt, "totals_2")
    # update mode: only touched users are re-emitted
    assert out2[1] == (3, 17.0)
    assert out2[3] == (1, 7.0)
    assert 2 not in out2
