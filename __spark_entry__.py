"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``aws_healthcare_etl_pipeline_spark.plans.REGISTRY``:
every implemented operator from SURVEY.md §2 is a named query; those
with SQL-expressible semantics carry a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust to
# however the harness loads this module (file-path import, foreign cwd)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

# Runtime confs the queries depend on, applied to WHATEVER session the
# driver hands us (it builds its own, not ours from session.py):
#  - UTC: timestamp/date values must match the DuckDB oracle bit-for-bit
#  - nanosAsLong: events.parquet is TIMESTAMP(NANOS), unreadable otherwise
#  - excludedRules: InferFiltersFromGenerate re-inlines computed arrays
#    under explode (see SCALE.md "Planner-level traps") — quadratic
#    blowup for the winnowing/LSH/minhash queries
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def _prepared(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # diagnosed by the read-back below, with a clear message
    # Verify every required conf actually took effect: a session that
    # locks e.g. nanosAsLong would otherwise fail much later with an
    # opaque parquet/hash error on every events-table query.
    problems = []
    for k, v in _REQUIRED_CONFS.items():
        try:
            got = spark.conf.get(k, None)
        except Exception:
            got = None
        if got != v:
            problems.append(f"{k}={got!r} (need {v!r})")
    if problems:
        raise RuntimeError(
            "session confs required by this engine could not be applied: "
            + "; ".join(problems)
            + ". events.parquet is TIMESTAMP(NANOS) and the oracle compare "
            "is UTC-pinned — these confs must be settable on the session."
        )
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-table star join
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue/region)."""
    return REGISTRY["q5_region_revenue"].fn(_prepared(spark), "/root/testdata/sf0.001")


# Verification-window ordering. The driver checks the FIRST ~50 entries
# of queries() each round; rounds 1-8 verified 396 distinct queries green
# (CORRECTNESS_r01-r08, zero unfixed failures). Round 9 front-loads 50 of
# the 242 never-driver-checked queries, heaviest (measured sf0.1 bench
# cost) first — the round-8 verdict's named rotation list. Past slot 50:
# every OTHER never-checked query by cost desc (so any wider window still
# hits fresh rows first); previously-green entries trail via
# _ordered_names (still covered by the sf0.001 pytest parity gate and the
# full sf0.01 driver_sim certification each round).
_VERIFICATION_PRIORITY = [
    # --- wave-214 queries (round 10) lead: same-round driver rows,
    # the r8/r9 wave discipline (oracle + sf0.001/0.01 MATCH before
    # registration). Slot count is kept small so the ~50-query window
    # still retires a full tranche of the never-checked backlog. ---
    "ref_partition_pruning_audit",
    "stats_brown_forsythe_variance",
    "forecast_holt_winters_additive",
    "quality_drift_triangular_divergence",
    "sched_interval_partitioning_depth",
    "pipeline_span_corruption_accounting",
    "sql_recursive_bom_cost_rollup",
    "stats_energy_distance_exact",
    "stat_mann_whitney_cliffs_delta",
    "stats_friedman_blocked_ranks",
    # --- the never-driver-checked backlog (212 after round 9), by
    # sf0.1 bench cost desc — the round-9 verdict's named tranche
    # (haar wavelet, BH-FDR, approx-percentile guarantee, MDM
    # survivorship, design-error comparison, ...) leads. Rounds 1-9
    # verified 446 distinct queries green with zero unfixed failures;
    # the 50 round-9 rows moved to the trailing registry-order tail
    # via _ordered_names. ---
    "forecast_holt_linear_replay",
    "time_business_day_sla",
    "ml_naive_bayes_exact_argmax",
    "lakehouse_time_travel_merge",
    "join_salted_skew_equivalence",
    "graph_katz_centrality_integer",
    "finance_net_dollar_retention",
    "inequality_hoover_index",
    "scd2_point_in_time_join",
    "experiment_ipw_confounder_correction",
    "events_dau_mau_stickiness",
    "orders_backlog_daily",
    "emb_fisher_separation_ratio",
    "audit_duplicate_invoice_candidates",
    "text_integer_surprisal_scores",
    "graph_degree_assortativity",
    "lakehouse_cdc_changefeed",
    "experiment_cuped_variance_reduction",
    "graph_avg_neighbor_degree",
    "layout_learned_index_epsilon",
    "timeseries_haar_wavelet_energy",
    "stats_benjamini_hochberg_fdr",
    "agg_approx_percentile_rank_guarantee",
    "mdm_survivorship_policy_battery",
    "sampling_design_error_comparison",
    "dq_constraint_mining_audit",
    "market_concentration_cr4",
    "finance_price_index_lpf",
    "events_circular_hour_stats",
    "stats_exact_raw_moments",
    "election_voting_rules_compared",
    "window_ignore_nulls_battery",
    "events_markov_homogeneity",
    "privacy_erasure_blast_radius",
    "privacy_unicity_two_points",
    "linkage_phonetic_blocking",
    "audit_duplicate_payment_detector",
    "finance_max_drawdown_underwater",
    "experiment_mde_power_analysis",
    "layout_codec_chooser",
    "causal_diff_in_differences",
    "stats_grain_fallacy_audit",
    "dq_missingness_pattern_mining",
    "sec_impossible_travel_audit",
    "alloc_airport_game_shapley",
    "causal_rdd_quantity_cutoff",
    "sched_wfq_virtual_finish",
    "sales_quarter_hockey_stick",
    "finance_price_volume_bridge",
    "events_watermark_lateness_profile",
    "hash_truncation_collision_audit",
    "sql_full_outer_rewrite_equivalence",
    "finance_vwap_divergence",
    "supply_bullwhip_ratio",
    "text_zipf_bigram_buckets",
    "stat_runs_test_daily",
    "anomaly_hbos_bincount_topk",
    "ops_incident_mttr_stats",
    "queueing_littles_law_audit",
    "layout_delta_varint_economics",
    "audit_merkle_month_digests",
    "opt_knapsack_density_gap",
    "ml_leakage_detector_audit",
    "alloc_apportionment_methods",
    "emb_int8_quantization_error",
    "election_banzhaf_power_index",
    "sql_relational_division",
    "pipeline_dataset_shard_manifest",
    "join_hot_cold_split_equivalence",
    "timeseries_kadane_extremes",
    "ml_gini_stump_induction",
    "layout_dictionary_encoding_economics",
    "forecast_pinball_loss_eval",
    "finance_rounding_mode_battery",
    "multimodal_video_scene_cuts",
    "sql_integer_division_semantics_battery",
    "routing_tsp_nn_2opt",
    "approx_cms_count_estimates",
    "ml_evalset_sizing_curve",
    "events_repeat_rate_7d",
    "privacy_t_closeness_emd",
    "changepoint_two_segment_sse",
    "orders_cum_distinct_customers",
    "text_hashing_trick_collisions",
    "election_kemeny_rank_4",
    "stat_wilcoxon_signed_rank",
    "trend_mann_kendall_monthly",
    "rank_wilson_lower_bound",
    "join_bloom_prefilter_equivalence",
    "multimodal_frame_dedup",
    "stat_exact_permutation_pvalue",
    "audit_tv_distance_drift",
    "text_boilerplate_line_removal",
    "events_cusum_changepoint",
    "ml_permutation_feature_importance",
    "layout_compaction_coalesce_plan",
    "approx_hll_register_audit",
    "time_fiscal_445_calendar",
    "inventory_dead_stock_audit",
    "sched_edf_feasibility_audit",
    "privacy_dp_geometric_counts",
    "ops_sla_credit_calculation",
    "linkage_fellegi_sunter_scores",
    "privacy_k_anonymity_audit",
    "causal_coarsened_exact_matching",
    "dq_freshness_staleness_audit",
    "stats_median_of_means",
    "optimizer_independence_qerror",
    "sql_decorrelation_equivalence",
    "stats_simpsons_paradox_scan",
    "format_csv_malformed_modes",
    "regression_ransac_deterministic",
    "sketch_bloom_fpr_audit",
    "lakehouse_snapshot_diff_audit",
    "ml_target_encoding_loo",
    "ops_incident_cooccurrence_lift",
    "ops_backoff_conformance_audit",
    "format_csv_dialect_battery",
    "attribution_position_based",
    "sql_grouping_id_rollup_decode",
    "timeseries_best_split_changepoint",
    "sql_pivot_quarterly_revenue",
    "events_sliding_window_rate_limit",
    "sim_ndcg_retrieval_eval",
    "quality_expectation_suite",
    "risk_block_maxima_return_level",
    "privacy_generalization_ladder",
    "finance_price_volume_mix",
    "finance_day_count_conventions",
    "inventory_eoq_batch_sizing",
    "scd_aswas_vs_asis_revenue",
    "sql_not_in_null_trap_battery",
    "layout_zonemap_skipping_audit",
    "audience_overlap_matrix",
    "stat_quantile_mapping_transfer",
    "events_autocorrelation_daily",
    "stats_effective_sample_size",
    "layout_lsm_writeamp_economics",
    "auction_uniform_price_clearing",
    "finance_progressive_tax_brackets",
    "stats_jackknife_ratio_variance",
    "orders_priority_mix_shift",
    "isotonic_regression_exact",
    "ops_erlang_b_blocking",
    "time_fiscal_calendar_rollup",
    "web_url_canonical_dedup",
    "search_phrase_positional_index",
    "ml_kfold_cv_accuracy",
    "compression_rle_economics",
    "agg_mode_deterministic",
    "ops_cron_schedule_expansion",
    "optimizer_predicate_order_cost",
    "finance_fx_triangulation_audit",
    "survival_logrank_test",
    "quality_shewhart_control_chart",
    "corpus_drift_idf_shift",
    "cdc_log_compaction",
    "dist_rendezvous_hash_rebalance",
    "trend_theil_sen_slope",
    "regression_ols_exact",
    "sql_range_vs_rows_frames",
    "privacy_fpe_mask_audit",
    "storage_delta_of_delta_gorilla",
    "text_good_turing_mass",
    "window_ntile_remainder_semantics",
    "anomaly_hampel_filter_daily",
    "fairness_selection_rate_audit",
    "forecast_conformal_interval_audit",
    "finance_amortization_schedule",
    "geo_point_in_polygon_winding",
    "pipeline_curriculum_stage_budgets",
    "slo_multiwindow_burn_alerts",
    "emb_triangle_inequality_audit",
    "text_stopword_discovery",
    "fairness_equalized_odds_audit",
    "sql_window_frame_default_trap",
    "layout_prefix_compression_audit",
    "privacy_randomized_response_estimate",
    "privacy_l_diversity_audit",
    "pipeline_temperature_sampling_weights",
    "experiment_sprt_daily_replay",
    "ml_auc_feature_screen",
    "dq_luhn_check_digit_audit",
    "dq_ingestion_gap_detector",
    "sql_null_ordering_battery",
    "time_add_months_eom_battery",
    "events_poisson_dispersion_test",
    "experiment_srm_guardrail",
    "ml_negative_sampling_audit",
    "dedup_shard_strategy_audit",
    "serving_decayed_leaderboard",
    "timeseries_sax_motifs",
    "timeseries_rolling_correlation",
    "sql_explode_outer_battery",
    "ml_gain_chart_deciles",
    "search_autocomplete_prefix_topk",
    "ml_mcnemar_paired_classifiers",
    "time_t2_settlement_battery",
    "pipeline_filter_attrition_funnel",
    "alert_hysteresis_daily",
    "sql_null_semantics_battery",
    "ml_annotator_agreement_kappa",
    "time_iso_week_battery",
    "forecast_backtest_naive_vs_seasonal",
    "text_hapax_ratio_by_lang",
    "ml_calibration_reliability_bins",
    "sampling_neyman_allocation",
    "survival_km_hazard_table",
    "events_weekday_hour_heatmap",
    "audit_price_round_number_bias",
    "text_encoding_byte_audit",
    "slo_error_budget_burn",
]


def _ordered_names() -> list[str]:
    missing = [n for n in _VERIFICATION_PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    prioritized = set(_VERIFICATION_PRIORITY)
    return _VERIFICATION_PRIORITY + [n for n in REGISTRY if n not in prioritized]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_prepared(spark), sf_dir)

        return run

    return {name: wrap(REGISTRY[name].fn) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same order as ``queries()``).
    As of r2 every registered query carries an oracle: approximate/
    sketch operators emit exact companions plus self-graded tolerance
    booleans where sketch values can't hash-match across engines."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
