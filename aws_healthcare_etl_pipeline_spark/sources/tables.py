"""Fixture-table loaders for the driver's star schema (TESTDATA.md).

``load_table`` reads one parquet table; ``register_views`` registers all
of them as temp views so queries can be written in SQL. Reads are plain
``spark.read.parquet`` — Catalyst handles column pruning and predicate
pushdown into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in a star join.
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


# The events fixture stores ts as parquet TIMESTAMP(NANOS), which Spark
# has no native type for (SPARK-40819): read the raw int64 nanos via the
# legacy conf and truncate to microseconds — exactly what DuckDB's
# reader does, so oracle comparison stays bit-identical. (All fixture
# ts values are whole microseconds; verified in tests.)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanos
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def convert_events_ts(df: DataFrame) -> DataFrame:
    """int64 epoch-nanos -> microsecond timestamp (integer div, no fp)."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return convert_events_ts(spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
