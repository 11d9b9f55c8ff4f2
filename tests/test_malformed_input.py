"""Robustness of the ingest path to malformed CSV input — the reference
never handles this (inferSchema on whatever arrives); the engine
supports Spark's three parse modes through extra_read_options."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from aws_healthcare_etl_pipeline_spark.sources.csv_ingest import (
    IngestConfig,
    ingest_csv,
    read_csv,
)

GOOD_AND_BAD = """patient_id,encounter_id,diagnosis,amount
p-1001,e-9001,flu,120.50
p-1002,e-9002,sprain,not_a_number
p-1003,e-9003,flu,80.00
"""

SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("encounter_id", T.StringType()),
        T.StructField("diagnosis", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


@pytest.fixture()
def workspace(tmp_path):
    raw = tmp_path / "raw"
    (raw / "incoming").mkdir(parents=True)
    (raw / "incoming" / "mixed.csv").write_text(GOOD_AND_BAD)
    return raw, tmp_path / "curated"


def test_permissive_default_nulls_bad_cells(spark, workspace):
    raw, curated = workspace
    cfg = IngestConfig(raw_root=str(raw), curated_root=str(curated), schema=SCHEMA)
    df = read_csv(spark, cfg)
    rows = {r.patient_id: r.amount for r in df.collect()}
    assert rows["p-1001"] == 120.50
    assert rows["p-1002"] is None  # PERMISSIVE: unparseable cell -> NULL
    assert rows["p-1003"] == 80.00


def test_dropmalformed_skips_bad_rows(spark, workspace):
    raw, curated = workspace
    cfg = IngestConfig(
        raw_root=str(raw),
        curated_root=str(curated),
        schema=SCHEMA,
        ingest_date="2026-07-01",
        extra_read_options={"mode": "DROPMALFORMED"},
    )
    out = ingest_csv(spark, cfg)
    got = sorted(r.patient_id for r in spark.read.parquet(out).collect())
    assert got == ["p-1001", "p-1003"]


def test_corrupt_record_capture(spark, workspace):
    """Quarantine pattern: keep bad rows in a _corrupt_record column for
    a dead-letter sink instead of silently dropping."""
    raw, _ = workspace
    schema = SCHEMA.add("_corrupt_record", T.StringType())
    df = (
        spark.read.option("header", "true")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(f"{raw}/incoming")
    )
    bad = df.filter(df._corrupt_record.isNotNull()).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
