"""Catalog layer: the Glue-database + crawler replacement.

Reference: a Glue crawler re-scans the curated prefix every 15 minutes
and (re)registers table schema + hive partitions (main.tf:196-204,
database main.tf:114-116); Athena then queries ``"<db>"."athena"``
(README.md:94-101).

Spark-native: register the parquet location as an external table once;
new partitions are picked up synchronously with
``spark.catalog.recoverPartitions`` (= ``MSCK REPAIR TABLE``) — the
15-minute crawler latency disappears.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_parquet_table(
    spark: SparkSession,
    database: str,
    table: str,
    location: str,
    partitioned_by: str | None = "ingest_date",
) -> str:
    """CREATE DATABASE/TABLE over an existing partitioned parquet dir.

    Schema is discovered from the files (crawler parity); the partition
    column must be listed explicitly for an external hive-layout table.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    fq = f"{database}.{table}"
    spark.sql(f"DROP TABLE IF EXISTS {fq}")
    # Infer the data schema from the files themselves (the crawler does
    # the same, main.tf:196-204).
    df = spark.read.parquet(location)
    data_cols = [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != partitioned_by
    ]
    partition_clause = ""
    if partitioned_by:
        partition_clause = f" PARTITIONED BY (`{partitioned_by}` string)"
    spark.sql(
        f"CREATE TABLE {fq} ({', '.join(data_cols)}) USING parquet"
        f"{partition_clause} LOCATION '{location}'"
    )
    refresh_partitions(spark, fq)
    return fq


def refresh_partitions(spark: SparkSession, fq_table: str) -> None:
    """MSCK REPAIR equivalent — makes newly-written partitions visible."""
    spark.catalog.recoverPartitions(fq_table)
