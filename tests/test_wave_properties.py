"""Cross-cutting invariants of the wave 19-24 operators: attribution
credit conservation, the chunking formula vs a direct Python loop, and
sliding-distinct vs a per-day recount."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY
from aws_healthcare_etl_pipeline_spark.plans.analytics13 import CHUNK, STRIDE


def test_attribution_conserves_purchase_cents(spark, sf_dir):
    """Every attributed purchase's cents are fully distributed: the
    summed credit equals the summed value of purchases that had >=1
    click in their window — no cent created or lost by the
    floor-div + largest-remainder split."""
    out = REGISTRY["attribution_linear_multitouch"].fn(spark, sf_dir).collect()
    total_credit = sum(r.total_credit_cents for r in out)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    expected = con.execute(
        """
        WITH p AS (
            SELECT event_id, user_id, ts,
                   CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        )
        SELECT COALESCE(SUM(cents), 0) FROM p
        WHERE EXISTS (
            SELECT 1 FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 3 DAY)
        """
    ).fetchone()[0]
    assert total_credit == expected


def _chunks_reference(n: int) -> list[tuple[int, int]]:
    """Direct Python statement of the chunking contract: emit (start,
    len) windows of CHUNK tokens at STRIDE; keep a window iff it is
    the first or adds at least one token beyond its predecessor's
    coverage."""
    out = []
    s = 0
    while True:
        length = min(CHUNK, n - s)
        if s == 0 or length > CHUNK - STRIDE:
            out.append((s, length))
        if s + CHUNK >= n:
            break
        s += STRIDE
    return out


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=5000))
def test_chunk_count_formula_matches_reference_loop(n):
    if n <= CHUNK - STRIDE:
        formula = 1
    else:
        formula = (n - (CHUNK - STRIDE) - 1) // STRIDE + 1
    assert formula == len(_chunks_reference(n)), (n, _chunks_reference(n))


def test_sliding_distinct_matches_per_day_recount(spark, sf_dir):
    got = {
        r.day.date(): r.distinct_users_7d
        for r in REGISTRY["events_sliding_distinct_users"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(
        """
        WITH days AS (
            SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
        )
        SELECT d, (SELECT COUNT(DISTINCT user_id) FROM events e
                   WHERE CAST(e.ts AS DATE) BETWEEN d - INTERVAL 6 DAY AND d)
        FROM days ORDER BY d
        """
    ).fetchall()
    for d, n in rows:
        assert got[d] == n, (d, got[d], n)


def test_kth_smallest_matches_sorted_order(spark, sf_dir):
    from aws_healthcare_etl_pipeline_spark.operators.selection import kth_smallest
    from aws_healthcare_etl_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(15,2)") * 100).cast("long").alias("c")
    )
    vals = sorted(r.c for r in df.collect())
    for k in (1, 7, len(vals) // 2, len(vals)):
        assert kth_smallest(df, "c", k) == vals[k - 1], k


def test_kth_smallest_multi_resolves_all_ranks_together(spark, sf_dir):
    from aws_healthcare_etl_pipeline_spark.operators.selection import (
        kth_smallest_multi,
    )
    from aws_healthcare_etl_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(15,2)") * 100).cast("long").alias("c")
    )
    vals = sorted(r.c for r in df.collect())
    n = len(vals)
    # all nine decile edges plus extremes, one shared histogram descent
    ks = [1, n] + [-(-k * n // 10) for k in range(1, 10)]
    got = kth_smallest_multi(df, "c", ks)
    for k in ks:
        assert got[k] == vals[k - 1], k
