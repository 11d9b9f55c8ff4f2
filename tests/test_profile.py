"""Column-profiler unit semantics (operators/profile.py).

The fixture tables are null-free, so the oracle-parity run never
exercises the null/rendering contract — pinned here on a hand-built
frame: nulls counted but excluded from distinct/min/max, doubles
rendered via DECIMAL(15,2) (not shortest-repr), timestamps at date
precision, and min/max taken in VALUE order (not lexicographic).
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from aws_healthcare_etl_pipeline_spark.operators.profile import profile_columns

SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("i", T.LongType()),
        T.StructField("t", T.TimestampType()),
    ]
)

ROWS = [
    ("b", 100.5, 9, datetime.datetime(2024, 3, 1, 12, 30)),
    ("a", 99.25, 10, datetime.datetime(2024, 1, 15, 0, 0)),
    (None, None, None, None),
    ("b", 2.0, -3, datetime.datetime(2024, 12, 31, 23, 59)),
]


def test_profile_columns_nulls_and_rendering(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["column"]: r.asDict() for r in profile_columns(df).collect()}

    assert set(out) == {"s", "d", "i", "t"}
    for row in out.values():
        assert row["n_rows"] == 4
        assert row["n_nulls"] == 1

    # distinct excludes nulls; "b" counted once
    assert out["s"]["n_distinct"] == 2
    assert out["d"]["n_distinct"] == 3
    # value-order min/max, then rendered
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    # 2.0 < 99.25 < 100.5 numerically; lexicographic order would have
    # put "100.50" before "2.00"
    assert out["d"]["min_value"] == "2.00"
    assert out["d"]["max_value"] == "100.50"
    assert out["i"]["min_value"] == "-3" and out["i"]["max_value"] == "10"
    # timestamps render at date precision
    assert out["t"]["min_value"] == "2024-01-15"
    assert out["t"]["max_value"] == "2024-12-31"


def test_profile_columns_subset_and_order(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = [r["column"] for r in profile_columns(df, ["i", "d"]).collect()]
    assert got == ["d", "i"]  # output sorted by column name
