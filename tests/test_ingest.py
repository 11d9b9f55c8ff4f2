"""Reference-pipeline parity tests (glue_job_script.py semantics) on the
sample.csv fixture shape (README.md:66-71)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.sources.csv_ingest import (
    IngestConfig,
    ingest_csv,
    is_csv_object,
    resolve_source_path,
    utc_ingest_date,
)

SAMPLE = """patient_id,encounter_id,diagnosis,amount
p-1001,e-9001,flu,120.50
p-1002,e-9002,sprain,80.00
"""


@pytest.fixture()
def workspace(tmp_path):
    raw = tmp_path / "raw"
    (raw / "incoming").mkdir(parents=True)
    (raw / "incoming" / "sample.csv").write_text(SAMPLE)
    curated = tmp_path / "curated"
    return raw, curated


def test_non_csv_guard():
    assert is_csv_object("incoming/a.csv")
    assert is_csv_object("incoming/A.CSV")  # case-insensitive, glue_job_script.py:33
    assert not is_csv_object("incoming/a.parquet")


def test_path_resolution():
    # glue_job_script.py:37 semantics
    assert (
        resolve_source_path("s3://b", "incoming/", "incoming/x.csv")
        == "s3://b/incoming/x.csv"
    )
    assert resolve_source_path("s3://b", "incoming/", "") == "s3://b/incoming"


def test_ingest_skips_non_csv(spark, workspace):
    raw, curated = workspace
    cfg = IngestConfig(
        raw_root=str(raw), curated_root=str(curated), object_key="incoming/a.txt"
    )
    assert ingest_csv(spark, cfg) is None
    assert not curated.exists()


def test_ingest_end_to_end(spark, workspace):
    raw, curated = workspace
    cfg = IngestConfig(
        raw_root=str(raw), curated_root=str(curated), ingest_date="2026-02-03"
    )
    out = ingest_csv(spark, cfg)
    df = spark.read.parquet(out)
    rows = df.orderBy("patient_id").collect()
    assert len(rows) == 2
    # schema inference: amount is double (FIXTURES.md §1)
    assert dict(df.dtypes)["amount"] == "double"
    assert rows[0].patient_id == "p-1001" and rows[0].amount == 120.50
    # hive layout: ingest_date=... directory (glue_job_script.py:52)
    assert os.path.isdir(os.path.join(out, "ingest_date=2026-02-03"))


def test_append_duplicates_then_idempotent_overwrite(spark, workspace):
    """Reference append semantics duplicate on re-run
    (glue_job_script.py:51); overwrite_partition mode is idempotent."""
    raw, curated = workspace
    cfg = IngestConfig(
        raw_root=str(raw), curated_root=str(curated), ingest_date="2026-02-03"
    )
    ingest_csv(spark, cfg)
    ingest_csv(spark, cfg)  # retry: at-least-once -> duplicates (parity)
    assert spark.read.parquet(cfg.output_path).count() == 4

    cfg_idem = IngestConfig(
        raw_root=str(raw),
        curated_root=str(curated),
        ingest_date="2026-02-03",
        mode="overwrite_partition",
    )
    ingest_csv(spark, cfg_idem)
    ingest_csv(spark, cfg_idem)
    assert spark.read.parquet(cfg.output_path).count() == 2


def test_explicit_schema_fast_path(spark, workspace):
    raw, curated = workspace
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("patient_id", T.StringType()),
            T.StructField("encounter_id", T.StringType()),
            T.StructField("diagnosis", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    cfg = IngestConfig(
        raw_root=str(raw),
        curated_root=str(curated),
        schema=schema,
        ingest_date="2026-02-04",
    )
    out = ingest_csv(spark, cfg)
    assert spark.read.parquet(out).count() == 2


def test_golden_query_shape(spark, workspace):
    """README.md:98-101: SELECT ingest_date, COUNT(*) ... ORDER BY DESC."""
    raw, curated = workspace
    for d in ("2026-02-01", "2026-02-02"):
        ingest_csv(
            spark,
            IngestConfig(raw_root=str(raw), curated_root=str(curated), ingest_date=d),
        )
    curated_df = spark.read.parquet(
        str(curated / "athena")
    )
    result = (
        curated_df.groupBy(F.col("ingest_date").cast("string").alias("ingest_date"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.col("ingest_date").desc())
        .collect()
    )
    assert [(r.ingest_date, r.rows) for r in result] == [
        ("2026-02-02", 2),
        ("2026-02-01", 2),
    ]


def test_utc_ingest_date_injectable():
    import datetime as dt

    fixed = dt.datetime(2026, 3, 4, 23, 59, tzinfo=dt.timezone.utc)
    assert utc_ingest_date(fixed) == "2026-03-04"
