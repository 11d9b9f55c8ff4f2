"""Salted aggregation/join must be semantically identical to the plain
forms while spreading hot keys across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.skew import (
    SALT_COL,
    salted_aggregate,
    salted_join,
)


def make_skewed(spark):
    # one pathologically hot key (90% of rows) + a long tail
    hot = [(0, i, float(i % 7)) for i in range(900)]
    tail = [(k, 1000 + k, float(k)) for k in range(1, 101)]
    return spark.createDataFrame(hot + tail, "key int, id int, v double")


def test_salted_aggregate_equals_plain(spark):
    df = make_skewed(spark)
    plain = {
        (r.key): (r.n, r.total, r.mx)
        for r in df.groupBy("key")
        .agg(
            F.count("id").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.key): (r.n, r.total, r.mx)
        for r in salted_aggregate(
            df,
            ["key"],
            {"n": ("count", "id"), "total": ("sum", "v"), "mx": ("max", "v")},
            salt_cols=["id"],
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    left = make_skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(0, 50)], "key int, name string"
    )
    plain = sorted(
        (r.id, r.name) for r in left.join(right, "key").select("id", "name").collect()
    )
    salted = sorted(
        (r.id, r.name)
        for r in salted_join(left, right, on="key", buckets=8)
        .select("id", "name")
        .collect()
    )
    assert plain == salted


def test_salt_is_deterministic(spark):
    df = make_skewed(spark)
    a = salted_join(df, df.select("key").distinct(), on="key", buckets=8)
    assert SALT_COL not in a.columns
    # same input -> same result set on repeat execution
    assert a.count() == a.count()
