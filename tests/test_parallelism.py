"""widen() contract (operators/parallelism.py): redistribute only when
the source's split granularity caps parallelism, no-op otherwise."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.parallelism import widen


def test_widen_noop_when_already_wide(spark):
    df = spark.range(1000).repartition(16, F.col("id"))
    out = widen(df, "id", min_parts=8)
    # 16 >= 8: the SAME plan comes back, no extra exchange
    assert out is df


def test_widen_repartitions_narrow_source(spark):
    df = spark.range(1000).coalesce(1)
    out = widen(df, "id", min_parts=8)
    assert out is not df
    assert out.rdd.getNumPartitions() == 8
    # same rows either way
    assert out.count() == 1000


def test_widen_threshold_is_half_target(spark):
    # current=4 against target=8: 4*2 >= 8 -> no-op (avoid churn when
    # the scan is within 2x of the session's parallelism)
    df = spark.range(1000).repartition(4, F.col("id"))
    assert widen(df, "id", min_parts=8) is df
