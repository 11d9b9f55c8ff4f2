"""Structured-Streaming paths: incremental CSV ingest (exactly-once per
file via checkpoint) and stream/batch window-agg equivalence."""

from __future__ import annotations

from pyspark.sql import types as T

from aws_healthcare_etl_pipeline_spark.sources.csv_ingest import IngestConfig

from aws_healthcare_etl_pipeline_spark.streaming.ingest_stream import (
    start_incremental_ingest,
)
from aws_healthcare_etl_pipeline_spark.streaming.windows import (
    sessionize,
    tumbling_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _write_csv(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("patient_id,amount\n" + "\n".join(f"{p},{a}" for p, a in rows) + "\n")


def test_incremental_ingest_exactly_once_per_file(spark, tmp_path):
    raw = tmp_path / "raw"
    curated = tmp_path / "curated"
    ckpt = tmp_path / "ckpt"
    _write_csv(raw / "incoming" / "f1.csv", [("p-1", 1.0), ("p-2", 2.0)])

    cfg = IngestConfig(
        raw_root=str(raw), curated_root=str(curated), ingest_date="2026-05-01"
    )
    q = start_incremental_ingest(spark, cfg, SCHEMA, str(ckpt))
    q.awaitTermination()
    assert spark.read.parquet(cfg.output_path).count() == 2

    # re-run with no new files: checkpoint prevents reprocessing
    q = start_incremental_ingest(spark, cfg, SCHEMA, str(ckpt))
    q.awaitTermination()
    assert spark.read.parquet(cfg.output_path).count() == 2

    # new file arrives -> only it is processed
    _write_csv(raw / "incoming" / "f2.csv", [("p-3", 3.0)])
    q = start_incremental_ingest(spark, cfg, SCHEMA, str(ckpt))
    q.awaitTermination()
    assert spark.read.parquet(cfg.output_path).count() == 3

    # non-CSV files are never picked up (source-level guard)
    (raw / "incoming" / "junk.txt").write_text("not,a,csv\n")
    q = start_incremental_ingest(spark, cfg, SCHEMA, str(ckpt))
    q.awaitTermination()
    assert spark.read.parquet(cfg.output_path).count() == 3


def test_stream_batch_window_equivalence(spark, sf_dir):
    """The same tumbling_counts plan over the events fixture must give
    identical results on the batch path and the streaming path (this is
    also asserted via DuckDB oracles in test_oracle_parity)."""
    from aws_healthcare_etl_pipeline_spark.plans.streaming_q import (
        batch_hourly_counts,
        streaming_hourly_counts,
    )

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch_hourly_counts(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in streaming_hourly_counts(spark, sf_dir).collect()
    }
    assert batch == stream


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),   # same session
        (1, base + dt.timedelta(minutes=50)),   # gap 40m > 30m -> new session
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    )
    assert got == [
        (1, base, 2),
        (1, base + dt.timedelta(minutes=50), 1),
        (2, base, 1),
    ]
