"""Property-based checks (hypothesis): the as-of join must agree with
pandas merge_asof on arbitrary inputs, and approximate aggregates must
stay within their error contracts."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.asof import asof_join
from aws_healthcare_etl_pipeline_spark.sources.tables import load_table

BASE = dt.datetime(2024, 1, 1)

# (key, minute-offset) pairs; distinct offsets per key to keep the match
# unique (merge_asof and our union+window both break exact-tie multiples
# arbitrarily, which is out of contract)
pairs = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),
    min_size=1,
    max_size=25,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(left_rows=pairs, right_rows=pairs)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_pdf = pd.DataFrame(
        {
            "key": [k for k, _ in left_rows],
            "t": [BASE + dt.timedelta(minutes=m) for _, m in left_rows],
        }
    ).sort_values("t", kind="mergesort", ignore_index=True)
    right_pdf = pd.DataFrame(
        {
            "key": [k for k, _ in right_rows],
            "rt": [BASE + dt.timedelta(minutes=m) for _, m in right_rows],
            "v": [float(m) for _, m in right_rows],
        }
    ).sort_values("rt", kind="mergesort", ignore_index=True)
    # drop duplicate (key, rt) to keep matches unique
    right_pdf = right_pdf.drop_duplicates(["key", "rt"], ignore_index=True)

    expected = pd.merge_asof(
        left_pdf,
        right_pdf,
        left_on="t",
        right_on="rt",
        by="key",
        direction="backward",
        allow_exact_matches=True,
    )

    left_df = spark.createDataFrame(left_pdf, "key int, t timestamp")
    right_df = spark.createDataFrame(right_pdf, "key int, rt timestamp, v double")
    got = (
        asof_join(left_df, right_df, on="key", left_time="t", right_time="rt")
        .toPandas()
        .sort_values(["key", "t"], kind="mergesort", ignore_index=True)
    )
    exp = expected.sort_values(["key", "t"], kind="mergesort", ignore_index=True)
    assert list(got["key"]) == list(exp["key"])
    assert list(got["t"]) == list(exp["t"])
    got_v = [None if pd.isna(x) else x for x in got["v"]]
    exp_v = [None if pd.isna(x) else x for x in exp["v"]]
    assert got_v == exp_v


@settings(max_examples=10, deadline=None)
@given(left_rows=pairs, right_rows=pairs, tol_minutes=st.integers(0, 120))
def test_asof_tolerance_matches_pandas(spark, left_rows, right_rows, tol_minutes):
    left_pdf = pd.DataFrame(
        {
            "key": [k for k, _ in left_rows],
            "t": [BASE + dt.timedelta(minutes=m) for _, m in left_rows],
        }
    ).sort_values("t", kind="mergesort", ignore_index=True)
    right_pdf = pd.DataFrame(
        {
            "key": [k for k, _ in right_rows],
            "rt": [BASE + dt.timedelta(minutes=m) for _, m in right_rows],
            "v": [float(m) for _, m in right_rows],
        }
    ).sort_values("rt", kind="mergesort", ignore_index=True)
    right_pdf = right_pdf.drop_duplicates(["key", "rt"], ignore_index=True)

    expected = pd.merge_asof(
        left_pdf,
        right_pdf,
        left_on="t",
        right_on="rt",
        by="key",
        direction="backward",
        allow_exact_matches=True,
        tolerance=pd.Timedelta(minutes=tol_minutes),
    )

    left_df = spark.createDataFrame(left_pdf, "key int, t timestamp")
    right_df = spark.createDataFrame(right_pdf, "key int, rt timestamp, v double")
    got = (
        asof_join(
            left_df,
            right_df,
            on="key",
            left_time="t",
            right_time="rt",
            tolerance=f"{tol_minutes} minutes",
        )
        .toPandas()
        .sort_values(["key", "t"], kind="mergesort", ignore_index=True)
    )
    exp = expected.sort_values(["key", "t"], kind="mergesort", ignore_index=True)
    got_v = [None if pd.isna(x) else x for x in got["v"]]
    exp_v = [None if pd.isna(x) else x for x in exp["v"]]
    assert got_v == exp_v


def test_approx_aggregates_error_bounds(spark):
    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_med"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05  # HLL default rsd
    assert abs(row.approx_med - row.exact_med) / row.exact_med < 0.05
