"""Semantic invariants for the wave-212 operators.

Oracle parity proves Spark == DuckDB; these tests prove both match the
MATH — structural guarantees (Banzhaf monotonicity in weight, clique
census downward closure, cut bounds, Wagner-Whitin optimality vs both
baselines, WFQ conservation, auction surplus non-negativity, airport-
game efficiency, AGM/min-degree soundness, chain-ladder IBNR sign,
Fisher between Laspeyres and Paasche, LPM totality, LSM read/write
tradeoff direction, unicity refinement, WAND losslessness) that hold
on any data. Empirical tendencies are NOT asserted.
"""

from __future__ import annotations

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_banzhaf_monotone_in_weight(spark, sf_dir):
    """In a weighted majority game, a heavier player is never less
    powerful (swing-count monotonicity); swings are bounded by the
    number of coalitions of the others; shares sum to <= 1000 with
    truncation."""
    rows = sorted(_rows(spark, sf_dir, "election_banzhaf_power_index"),
                  key=lambda r: r.player)
    assert len(rows) == 10
    total = sum(r.swings for r in rows)
    assert total > 0
    prev = None
    for r in rows:  # players are ordered by weight desc
        assert 0 <= r.swings <= 2 ** 9
        if prev is not None:
            assert prev.weight >= r.weight
            assert prev.swings >= r.swings
        prev = r
    assert sum(r.banzhaf_permille for r in rows) <= 1000


def test_clique_census_downward_closed(spark, sf_dir):
    """Every k-clique contains k distinct (k-1)-cliques, so if the
    census has size k it must show >= k cliques at size k-1 (for
    k >= 3); counts never exceed C(10, k)."""
    from math import comb

    rows = {r.clique_size: r.n_cliques
            for r in _rows(spark, sf_dir, "graph_max_clique_enumeration")}
    assert rows, "census empty"
    for k, n in rows.items():
        assert 1 <= n <= comb(10, k)
    for k in sorted(rows):
        if k >= 3 and rows[k] >= 1:
            assert rows.get(k - 1, 0) >= k


def test_mincut_bounds(spark, sf_dir):
    """The s-t pair is the heaviest edge, and that edge crosses every
    s-t cut, so the min cut is strictly positive; min <= max; at
    least one argmin exists."""
    [r] = _rows(spark, sf_dir, "graph_mincut_subset_enumeration")
    assert r.s_nation != r.t_nation
    assert 0 < r.min_cut_cents <= r.max_cut_cents
    assert r.n_min_cuts >= 1


def test_wagner_whitin_beats_baselines(spark, sf_dir):
    """The optimum over ALL order plans is <= both the single-order
    plan and the order-every-month plan; at least one setup is paid;
    setups in [1, 12]."""
    rows = _rows(spark, sf_dir, "inventory_wagner_whitin_lotsize")
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.opt_setups <= 12
        assert r.opt_cost_cents >= 100_000  # at least the month-1 setup
        assert r.opt_cost_cents <= r.single_order_cost_cents
        assert r.opt_cost_cents <= r.monthly_order_cost_cents


def test_secretary_rates_in_range(spark, sf_dir):
    """Success and baseline are probabilities in permille; the random
    baseline for n >= 8 is at most 125."""
    rows = _rows(spark, sf_dir, "opt_secretary_rule_replay")
    assert rows
    for r in rows:
        assert 0 <= r.success_permille <= 1000
        assert 0 < r.random_baseline_permille <= 125
        assert r.n_success <= r.n_customers


def test_wfq_conservation(spark, sf_dir):
    """Exactly half of the schedule is served in the first half (ball
    conservation), and every flow's deviation is the |difference| of
    the two reported shares."""
    rows = _rows(spark, sf_dir, "sched_wfq_virtual_finish")
    assert rows
    total = sum(r.n_items for r in rows)
    assert sum(r.served_first_half for r in rows) == total // 2
    for r in rows:
        assert r.deviation_permille == abs(
            r.share_permille - r.weight_share_permille
        )


def test_auction_surplus_nonnegative(spark, sf_dir):
    """Winners bid >= the clearing price (the first rejected bid), so
    bidder surplus is non-negative and revenue = K * clearing."""
    rows = _rows(spark, sf_dir, "auction_uniform_price_clearing")
    assert len(rows) == 12
    for r in rows:
        assert r.n_bids >= 10 * r.k_supply
        assert r.revenue_cents == r.k_supply * r.clearing_cents
        assert r.bidder_surplus_cents >= 0


def test_airport_shapley_efficient_and_monotone(spark, sf_dir):
    """Shares are non-decreasing in cost (a longer runway never costs
    less), and they sum to the grand-coalition cost up to bounded
    truncation loss (< 25 players * 25 terms millicents)."""
    rows = sorted(_rows(spark, sf_dir, "alloc_airport_game_shapley"),
                  key=lambda r: (r.cost_cents, r.brand))
    assert rows
    cmax = max(r.cost_cents for r in rows)
    total = sum(r.shapley_millicents for r in rows)
    assert cmax * 1000 - 625 <= total <= cmax * 1000
    prev = None
    for r in rows:
        assert r.shapley_millicents >= 0
        if prev is not None and r.cost_cents > prev.cost_cents:
            assert r.shapley_millicents >= prev.shapley_millicents
        prev = r


def test_agm_bounds_sound(spark, sf_dir):
    """Both the AGM bound and the min-degree bound are true upper
    bounds on the triangle count, so both q-errors are >= 1e6."""
    [r] = _rows(spark, sf_dir, "optimizer_agm_bound_audit")
    assert r.triangles >= 0
    assert r.agm_bound >= r.triangles
    assert r.mindeg_bound >= r.triangles
    if r.triangles > 0:
        assert r.agm_qerr_micro >= 1_000_000
        assert r.mindeg_qerr_micro >= 1_000_000


def test_matrix_profile_motif_pair(spark, sf_dir):
    """The globally closest window pair realizes the profile minimum
    for BOTH of its members, so at least two rows attain the minimum;
    no window is its own neighbor."""
    rows = _rows(spark, sf_dir, "timeseries_sad_matrix_profile")
    assert len(rows) > 2
    mn = min(r.profile_sad_cents for r in rows)
    assert sum(1 for r in rows if r.profile_sad_cents == mn) >= 2
    for r in rows:
        assert r.profile_sad_cents >= 0
        assert r.nn_ym != r.ym


def test_chain_ladder_ibnr_nonnegative(spark, sf_dir):
    """Cumulative paid never decreases, so every age-to-age factor is
    >= 1 and IBNR >= 0; fully developed origins project exactly their
    latest."""
    rows = _rows(spark, sf_dir, "actuarial_chain_ladder_projection")
    assert len(rows) == 12
    for r in rows:
        assert r.ibnr >= -1e-9
        assert r.ultimate >= r.latest_cents - 1e-9
        if r.origin_ym % 100 <= 6:  # dobs = 6: fully developed
            assert abs(r.ultimate - r.latest_cents) < 1e-9


def test_fisher_between_l_and_p(spark, sf_dir):
    """Fisher is the geometric mean of Laspeyres and Paasche, so it
    lies between them (floor slack 1 micro)."""
    rows = _rows(spark, sf_dir, "finance_price_index_lpf")
    assert rows
    for r in rows:
        lo = min(r.laspeyres_micro, r.paasche_micro)
        hi = max(r.laspeyres_micro, r.paasche_micro)
        assert lo - 1 <= r.fisher_micro <= hi + 1


def test_lpm_total_and_valid(spark, sf_dir):
    """The /0 default route makes the match TOTAL: per-route event
    counts sum to the full events table; prefix lengths are from the
    declared ladder."""
    rows = _rows(spark, sf_dir, "net_longest_prefix_match")
    total = sum(r.n_events for r in rows)
    n_events = (
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    assert total == n_events
    assert all(r.prefix_len in (0, 8, 16, 24) for r in rows)


def test_lsm_tradeoff_direction(spark, sf_dir):
    """Tiered never writes more than leveled and never reads less
    (the tradeoff the two policies exist to make); cumulative records
    are non-decreasing."""
    rows = _rows(spark, sf_dir, "layout_lsm_writeamp_economics")
    assert rows
    prev_cum = 0
    for r in sorted(rows, key=lambda r: r.ym):
        assert r.tiered_write_amp <= r.leveled_write_amp
        assert r.tiered_read_amp >= r.leveled_read_amp
        assert r.cum_records >= prev_cum
        prev_cum = r.cum_records


def test_unicity_refinement(spark, sf_dir):
    """Adding a second observation point can only split signature
    classes, so two-point unicity >= one-point unicity."""
    [r] = _rows(spark, sf_dir, "privacy_unicity_two_points")
    assert 0 <= r.unicity1_permille <= r.unicity2_permille <= 1000
    assert r.unique_one_point <= r.unique_two_points <= r.n_users


def test_wand_pruning_lossless(spark, sf_dir):
    """ub >= score always, so every true top-k document survives the
    prune: at least k candidates remain; prunable <= candidates."""
    rows = _rows(spark, sf_dir, "search_wand_pruning_economics")
    assert rows
    for r in rows:
        assert 0 <= r.n_prunable <= r.n_candidates
        assert r.n_candidates - r.n_prunable >= 10
        assert r.theta > 0


def test_mattr_ranges(spark, sf_dir):
    """TTRs are ratios: windowed permille in (0, 1000], global
    permicro in (0, 1e6]."""
    rows = _rows(spark, sf_dir, "text_mattr_lexical_diversity")
    assert rows
    for r in rows:
        assert 0 < r.mattr_permille <= 1000
        assert 0 < r.global_ttr_permicro <= 1_000_000
        assert r.n_windows > 0
