"""Reference-parity queries [REF] (SURVEY.md §2.1-2.4).

These cover the reference's entire declared surface: CSV ingest ->
ingest_date stamp -> partitioned parquet -> the one published Athena
query (README.md:98-101: SELECT ingest_date, COUNT(*) GROUP BY
ingest_date ORDER BY ingest_date DESC).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.csv_ingest import IngestConfig, ingest_csv
from ..sources.tables import load_table
from .registry import query

FIXED_INGEST_DATE = "2026-01-01"  # injected so tests/oracles are deterministic


@query(
    "ref_golden_daily_counts",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS ingest_date,
               COUNT(*) AS num_rows
        FROM orders
        GROUP BY 1
        ORDER BY ingest_date DESC
    """,
    description="The reference's golden Athena query shape (README.md:98-101): "
    "daily row counts, newest first — over the orders fixture.",
)
def ref_golden_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("ingest_date"))
        .agg(F.count(F.lit(1)).alias("num_rows"))
        .orderBy(F.col("ingest_date").desc())
    )


@query(
    "ref_ingest_roundtrip",
    oracle=f"""
        SELECT '{FIXED_INGEST_DATE}' AS ingest_date, COUNT(*) AS num_rows
        FROM lineitem
    """,
    description="Full pipeline parity: fixture -> CSV -> ingest (guard, stamp, "
    "partitioned parquet append; glue_job_script.py:33-53) -> golden query on "
    "the curated output.",
)
def ref_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the actual ingest path end-to-end in a temp workspace."""
    work = tempfile.mkdtemp(prefix="ingest_rt_")
    try:
        raw = os.path.join(work, "raw")
        curated = os.path.join(work, "curated")
        incoming = os.path.join(raw, "incoming")
        os.makedirs(incoming)
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
            .write.option("header", True)
            .csv(os.path.join(incoming, "batch1"))
        )
        cfg = IngestConfig(
            raw_root=raw,
            curated_root=curated,
            raw_prefix="incoming/batch1",
            ingest_date=FIXED_INGEST_DATE,
        )
        out = ingest_csv(spark, cfg)
        curated_df = spark.read.parquet(out)
        result = (
            curated_df.groupBy(F.col("ingest_date").cast("string").alias("ingest_date"))
            .agg(F.count(F.lit(1)).alias("num_rows"))
            .orderBy(F.col("ingest_date").desc())
        )
        # materialize before the temp dir disappears
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
