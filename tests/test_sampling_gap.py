"""Weighted-reservoir robustness: the A-ES key uses pow(), which libm
builds may round differently by an ulp. The sample is stable iff the
key gap at the k-boundary of every group is astronomically wider than
an ulp — asserted here at the correctness scale factors."""

from __future__ import annotations

import duckdb
import pytest

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY
from aws_healthcare_etl_pipeline_spark.plans.analytics13 import (
    HASH_MOD,
    RESERVOIR_K,
)

BOUNDARY_SQL = f"""
    WITH keyed AS (
        SELECT c_mktsegment, c_custkey,
               pow((CAST(list_reduce(
                        list_transform(
                          string_split_regex(
                            substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12), ''),
                          c -> strpos('0123456789abcdef', c) - 1)::BIGINT[],
                        (a, b) -> a * 16 + b) % {HASH_MOD} AS DOUBLE) + 0.5)
                   / {HASH_MOD}.0,
                   1.0 / ((CAST(c_acctbal AS DECIMAL(15,2)) + 1001.0)::DOUBLE)) AS k
        FROM customer
    ), ranked AS (
        SELECT c_mktsegment, k,
               row_number() OVER (PARTITION BY c_mktsegment ORDER BY k DESC)
                   AS rn
        FROM keyed
    )
    SELECT c_mktsegment,
           MAX(CASE WHEN rn = {RESERVOIR_K} THEN k END) AS kth,
           MAX(CASE WHEN rn = {RESERVOIR_K + 1} THEN k END) AS next_k
    FROM ranked
    GROUP BY c_mktsegment
"""


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_k_boundary_gap_dwarfs_ulp(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
    )
    rows = con.execute(BOUNDARY_SQL).fetchall()
    assert rows
    for seg, kth, next_k in rows:
        gap = kth - next_k
        # an ulp at k~1.0 is ~2.2e-16; require 6+ orders of margin
        assert gap > 1e-9, f"{sf} {seg}: boundary gap {gap} too tight"


def test_spark_sample_matches_oracle_at_smoke_sf(spark):
    """Belt-and-braces beyond the parity suite: the sampled ID SETS
    (ignoring rank) also match, so a pure ordering wobble inside the
    top k would still be caught."""
    sf = "/root/testdata/sf0.001"
    spec = REGISTRY["sampling_weighted_reservoir"]
    got = {
        (r.c_mktsegment, r.sampled_custkey)
        for r in spec.fn(spark, sf).collect()
    }
    con = duckdb.connect()
    for t in ("customer",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = {
        (seg, ck) for seg, ck, _ in con.execute(spec.oracle).fetchall()
    }
    assert got == want
