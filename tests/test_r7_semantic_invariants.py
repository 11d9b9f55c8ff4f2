"""Semantic invariants for the wave-211 operators.

Oracle parity proves Spark == DuckDB; these tests prove both match
the MATH — structural guarantees (Bloom soundness, Count-Sketch
bounds, rank-identity mismatch counts at zero, Wilcoxon rank-sum
conservation, pass@k monotonicity, Elo zero-sum) that must hold on
any data. Empirical tendencies that are NOT theorems (the two-choice
herding penalty) are gated on the pinned sf0.001 fixture.
"""

from __future__ import annotations

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_bloom_prefilter_soundness(spark, sf_dir):
    """The Bloom guarantee: no false negatives — every member key
    passes, so the prefiltered exact join equals the plain semi
    join; false positives only ever ADD probe work, never rows."""
    [r] = _rows(spark, sf_dir, "join_bloom_prefilter_equivalence")
    assert r.prefilter_sound
    assert r.keys_member <= r.keys_pass <= r.n_keys
    assert r.keys_false_pos == r.keys_pass - r.keys_member
    assert r.fact_member == r.fact_plain_semi
    assert r.fact_member <= r.fact_pass <= r.fact_rows


def test_count_sketch_estimates_bounded(spark, sf_dir):
    """A Count-Sketch estimate is a signed sum of bucket contents, so
    its magnitude can never exceed the stream length; the panel is
    the top-20 so every exact count is positive."""
    rows = _rows(spark, sf_dir, "approx_count_sketch_signed")
    assert len(rows) == 20
    total = sum(r.exact_cnt for r in rows)
    for r in rows:
        assert r.exact_cnt > 0
        assert r.abs_err == abs(r.cs_estimate - r.exact_cnt)
        # estimate magnitude bounded by any cell's max magnitude (<= N)
        assert abs(r.cs_estimate) <= total * 20


def test_hbos_topk_scores_positive_and_sorted(spark, sf_dir):
    """Every order has at least itself in each bin, so bin counts and
    the product score are >= 1; the top-k is ascending."""
    rows = _rows(spark, sf_dir, "anomaly_hbos_bincount_topk")
    assert len(rows) == 15
    scores = [r.hbos_score for r in rows]
    assert scores == sorted(scores)
    for r in rows:
        assert r.c1 >= 1 and r.c2 >= 1 and r.c3 >= 1
        assert r.hbos_score == r.c1 * r.c2 * r.c3


def test_percent_rank_cume_identities_hold(spark, sf_dir):
    """The battery's whole point: the engine's PERCENT_RANK/CUME_DIST
    must equal their manual definitions on every row."""
    rows = _rows(spark, sf_dir, "window_percent_rank_cume_battery")
    assert rows
    for r in rows:
        assert r.pr_mismatch == 0
        assert r.cd_mismatch == 0


def test_wilcoxon_rank_sum_conservation(spark, sf_dir):
    """Doubled midranks of n items must sum to n(n+1); W+ and W- are
    its two-part split and the statistic is their min."""
    [r] = _rows(spark, sf_dir, "stat_wilcoxon_signed_rank")
    assert r.rank_sum_ok
    assert r.w_plus_x2 + r.w_minus_x2 == r.n_pairs * (r.n_pairs + 1)
    assert r.w_stat_x2 == min(r.w_plus_x2, r.w_minus_x2)


def test_progressive_tax_marginal_bounds(spark, sf_dir):
    """Effective rate must sit inside the marginal-rate envelope
    (>= lowest bracket-0 share, < top rate) and taxes are positive."""
    rows = _rows(spark, sf_dir, "finance_progressive_tax_brackets")
    assert rows
    for r in rows:
        assert 0 < r.total_tax_cents < r.total_cents
        assert 0 < r.eff_rate_permille < 400


def test_edf_lateness_consistency(spark, sf_dir):
    """n_late > 0 iff max_lateness > 0, and feasibility is exactly
    max_lateness <= 0 (Jackson's rule certificate)."""
    rows = _rows(spark, sf_dir, "sched_edf_feasibility_audit")
    assert rows
    for r in rows:
        assert (r.n_late > 0) == (r.max_lateness > 0)
        assert r.edf_feasible == (r.max_lateness <= 0)
        assert r.n_late <= r.n_jobs


def test_two_choice_herding_audit_consistent(spark, sf_dir):
    """Ball conservation across both strategies (a true invariant),
    plus pigeonhole on the single-choice max. The herding penalty
    itself (static two-choice max >= single-choice max) is an
    EMPIRICAL tendency of one-round load-blind two-choice, not a
    theorem — a regenerated or differently-sized fixture could
    legitimately violate it — so it is checked only on the known
    sf0.001 fixture rather than asserted unconditionally."""
    rows = {r.strategy: r for r in _rows(
        spark, sf_dir, "dist_two_choice_load_audit")}
    assert set(rows) == {"single_choice", "two_choice_static"}
    s, t = rows["single_choice"], rows["two_choice_static"]
    assert s.n_balls == t.n_balls  # ball conservation: invariant
    assert s.max_load >= s.n_balls // 64  # pigeonhole: invariant
    if sf_dir.rstrip("/").endswith("sf0.001"):
        # fixture-specific: the herding penalty as measured on the
        # pinned driver fixture (not a data-independent law)
        assert t.max_load >= s.max_load
        assert t.min_load <= s.min_load


def test_pass_at_k_monotone_in_k_and_c(spark, sf_dir):
    """pass@k is monotone in k (more samples can only help) and in c
    (more passing attempts can only help); endpoints are exact:
    c=0 -> 0, c=n -> 1000."""
    rows = sorted(
        _rows(spark, sf_dir, "eval_pass_at_k_estimator"),
        key=lambda r: r.c,
    )
    prev = None
    for r in rows:
        assert (
            r.pass_at_1_permille
            <= r.pass_at_5_permille
            <= r.pass_at_10_permille
        )
        if prev is not None:
            assert r.pass_at_1_permille >= prev.pass_at_1_permille
            assert r.pass_at_10_permille >= prev.pass_at_10_permille
        if r.c == 0:
            assert r.pass_at_10_permille == 0
        if r.c == 20:
            assert r.pass_at_1_permille == 1000
        prev = r


def test_resource_allocation_scores_bounded(spark, sf_dir):
    """Each common neighbor contributes at most 1e6/2 micro (min
    degree of a middle vertex on a wedge is 2... at least 1), so
    ra_micro <= common * 1e6; candidates are non-edges with >= 2
    common neighbors."""
    rows = _rows(spark, sf_dir, "graph_resource_allocation_linkpred")
    for r in rows:
        assert r.common >= 2
        assert 0 < r.ra_micro <= r.common * 1_000_000


def test_missingness_flags_exactly_planted_pair(spark, sf_dir):
    """The miner must flag the planted correlated pair (ship_ref,
    contact) and nothing else at the 1.5x lift threshold."""
    rows = _rows(spark, sf_dir, "dq_missingness_pattern_mining")
    assert len(rows) == 6
    flagged = {(r.col_a, r.col_b) for r in rows if r.flagged}
    assert flagged == {("ship_ref", "contact")}, flagged


def test_viterbi_scores_bounded_by_path_length(spark, sf_dir):
    """Each step adds at most 0 and at least -6-6 to the best score,
    so sum over users is bounded by total event count."""
    rows = _rows(spark, sf_dir, "seq_viterbi_integer_decode")
    assert rows
    n_users = sum(r.n_users for r in rows)
    for r in rows:
        assert r.min_score <= r.max_score <= 0
        assert r.best_state in (0, 1, 2)
    assert n_users > 0


def test_ss_policy_conservation(spark, sf_dir):
    """Inventory position is always in [0, S] at day ends; with
    S=200 and reorder-up-to, final inventory per part is in
    [small, big] unless the part never reordered."""
    [r] = _rows(spark, sf_dir, "inventory_ss_policy_replay")
    assert r.n_parts > 0
    assert 0 <= r.sum_final_inv <= r.n_parts * 200
    assert r.total_orders >= 0 and r.total_lost_qty >= 0


def test_lcs_bounded_by_basket_size(spark, sf_dir):
    """LCS of two 8-element sequences is in [0, 8]; pair counts per
    nation are at most months-1."""
    rows = _rows(spark, sf_dir, "seq_lcs_monthly_baskets")
    assert rows
    for r in rows:
        assert 0 <= r.max_lcs <= 8
        assert 0 <= r.sum_lcs <= r.n_pairs * 8


def test_elo_zero_sum_conservation(spark, sf_dir):
    """Every update is +delta/-delta, so total rating stays at
    1000 * n_players; wins never exceed games."""
    rows = _rows(spark, sf_dir, "rank_elo_lut_replay")
    assert rows
    assert sum(r.final_rating for r in rows) == 1000 * len(rows)
    for r in rows:
        assert 0 <= r.n_wins <= r.n_games


def test_textrank_ranks_in_damping_envelope(spark, sf_dir):
    """With damping 0.85 and micro units, every rank is >= the
    teleport floor 150000; the total cannot exceed the undamped
    total mass (n * 1e6) plus truncation slack."""
    rows = _rows(spark, sf_dir, "text_textrank_keywords")
    assert rows
    for r in rows:
        assert r.rank_micro >= 150000
    assert sum(r.rank_micro for r in rows) <= len(rows) * 1_000_000
