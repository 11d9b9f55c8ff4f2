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


# The events fixture has shipped ts in two parquet vintages:
#  - TIMESTAMP(NANOS): Spark has no native type for it (SPARK-40819) —
#    read the raw int64 nanos via the legacy conf and truncate to
#    microseconds, exactly what DuckDB's reader does, so oracle
#    comparison stays bit-identical. (All fixture ts values are whole
#    microseconds; verified in tests.)
#  - TIMESTAMP(MICROS): Spark's native TimestampType — read directly.
# ``events_read_schema`` sniffs the parquet footer so either vintage
# loads identically; one footer read per call, no data scan.


def _events_ts_field(path: str):
    """Arrow type of the ``ts`` column, from the parquet footer."""
    import glob as _glob

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        cands = sorted(_glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not cands:
            raise FileNotFoundError(f"no parquet files under {path}")
        f = cands[0]
    return str(pq.read_schema(f).field("ts").type)


def events_ts_is_nanos(path: str) -> bool:
    return _events_ts_field(path) in ("timestamp[ns]", "int64")


def events_read_schema(path: str) -> T.StructType:
    """Read-schema for the events table, matched to the file's ts unit
    (LongType for TIMESTAMP(NANOS) via the legacy conf, TimestampType
    for TIMESTAMP(MICROS))."""
    ts_type = T.LongType() if events_ts_is_nanos(path) else T.TimestampType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# legacy alias (nanos vintage) kept for callers that staged nanos files
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
    """int64 epoch-nanos -> microsecond timestamp (integer div, no fp);
    identity when ts already is a native timestamp (micros vintage)."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# Read-schema cache, keyed by resolved parquet path. Schema inference
# on a bare ``spark.read.parquet`` costs ~130 ms of driver time per
# call at sf0.1 (footer sampling + file listing) vs ~20 ms with a
# pinned schema — and the suite issues load_table thousands of times.
# Caching the inferred StructType per path keeps behavior identical
# for ANY fixture vintage (the first load still infers from the real
# footer) while every later load skips inference, exactly what a
# catalog-backed table does in production. Metadata only — never rows.
_SCHEMA_CACHE: dict[str, T.StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _SCHEMA_CACHE.get(path)
        if schema is None:
            schema = events_read_schema(path)
            _SCHEMA_CACHE[path] = schema
        return convert_events_ts(spark.read.schema(schema).parquet(path))
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    return spark.read.schema(schema).parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
