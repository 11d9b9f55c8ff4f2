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
# of queries() each round; rounds 1-6 verified 296 distinct queries green
# (CORRECTNESS_r01-r06, zero unfixed failures). Round 7 front-loads 50 of
# the 307 never-driver-checked queries, heaviest (measured sf0.1 bench
# cost) first — the round-6 verdict's named rotation list. Past slot 50:
# every OTHER never-checked query by cost desc (so any wider window still
# hits fresh rows first); previously-green entries trail via
# _ordered_names (still covered by the sf0.001 pytest parity gate and the
# full sf0.01 driver_sim certification each round).
_VERIFICATION_PRIORITY = [
    # --- front 50 (round 7): never driver-checked, heaviest first ---
    # (the round-6 verdict's named list: bandit replay, cost-optimal
    # threshold, Kendall tau, rich club, RRF fusion, IRV, demand
    # quantiles, triplet-margin audit, correlation matrix, split-half
    # top-k stability, FD discovery, n-gram novelty, Hilbert-vs-Zorder,
    # betweenness, power-iteration eigenvector — then by sf0.1 cost desc.)
    "bandit_epsilon_greedy_replay",
    "ml_cost_optimal_threshold",
    "rank_kendall_tau_nations",
    "graph_rich_club_permille",
    "search_rrf_rank_fusion",
    "election_irv_rounds",
    "inventory_demand_quantiles_counting",
    "emb_triplet_margin_audit",
    "dq_correlation_matrix",
    "eval_topk_stability_splithalf",
    "fd_discovery_audit",
    "text_ngram_novelty_rate",
    "layout_hilbert_vs_zorder_locality",
    "graph_betweenness_nations",
    "emb_power_iteration_top_eigen",
    "graph_eccentricity_diameter",
    "approx_hdr_histogram_quantile_audit",
    "emb_mmr_diversified_topk",
    "causal_quantile_treatment_effect",
    "process_trace_variants_conformance",
    "dedup_lsh_band_row_tradeoff",
    "dist_consistent_hash_rebalance",
    "inventory_newsvendor_quantile",
    "brand_rank_momentum",
    "sched_smith_rule_wspt",
    "interval_allen_census",
    "customer_value_tier_migration",
    "queue_lindley_wait_replay",
    "stats_ndv_correlation_audit",
    "geo_getis_ord_hotspots",
    "events_heavy_hitters_mg_replay",
    "inventory_leadtime_demand_convolution",
    "risk_cvar_tail_concentration",
    "emb_nearest_centroid_accuracy",
    "dq_semantic_type_inference",
    "graph_bfs_reachability_khop",
    "text_rake_keyphrases",
    "serving_hierarchical_range_sums",
    "sim_matryoshka_prefix_recall",
    "alloc_maxmin_fair_share",
    "text_skipgram_pairs",
    "emb_fisher_label_separation",
    "graph_two_hop_reach_panel",
    "ops_littles_law_identity",
    "graph_jaccard_link_prediction",
    "ml_model_scorecard",
    "inventory_fifo_lot_valuation",
    "stats_cusum_arl_calibration",
    "stats_median_ci_orderstat",
    "stats_ipf_raking",
    # --- wave-211 (round 7): never driver-checked, behind the window ---
    "join_bloom_prefilter_equivalence",
    "approx_count_sketch_signed",
    "anomaly_hbos_bincount_topk",
    "window_ignore_nulls_battery",
    "window_percent_rank_cume_battery",
    "stat_wilcoxon_signed_rank",
    "finance_progressive_tax_brackets",
    "sched_edf_feasibility_audit",
    "dist_two_choice_load_audit",
    "eval_pass_at_k_estimator",
    "graph_resource_allocation_linkpred",
    "dq_missingness_pattern_mining",
    "seq_viterbi_integer_decode",
    "inventory_ss_policy_replay",
    "seq_lcs_monthly_baskets",
    "rank_elo_lut_replay",
    "text_textrank_keywords",
    # --- remaining never-driver-checked (257), by cost desc ---
    "ml_nb_learning_curve",
    "graph_triangle_sample_estimator",
    "attribution_position_based",
    "audit_join_fanout_estimates",
    "fd_inclusion_dependency_discovery",
    "dq_primary_key_violation_audit",
    "stats_bootstrap_ci_deterministic",
    "search_rbo_rank_overlap",
    "search_postings_gap_stats",
    "graph_friendship_paradox",
    "inequality_hoover_index",
    "data_shapley_knn_exact",
    "text_burrows_delta_stylometry",
    "streaming_token_bucket_quota",
    "geo_grid_radius_join",
    "layout_dictionary_encoding_economics",
    "graph_katz_centrality_integer",
    "streaming_windowed_topk_types",
    "events_repeat_rate_7d",
    "sampling_systematic_vs_hash",
    "inventory_wac_moving_average",
    "search_trigram_fuzzy_parts",
    "emb_cosine_pair_histogram",
    "stat_ks_two_sample",
    "inventory_capped_running_balance",
    "regression_ransac_deterministic",
    "inventory_reorder_point_replay",
    "compression_rle_economics",
    "sampling_neyman_sd_allocation",
    "layout_range_partition_balance",
    "optimizer_join_order_cost_audit",
    "attribution_shapley_exact",
    "ml_naive_bayes_exact_argmax",
    "inventory_intermittency_quadrants",
    "repair_mode_imputation_accuracy",
    "auction_second_price_clearing",
    "multimodal_audio_frame_energy",
    "multimodal_audio_zero_crossings",
    "view_incremental_join_maintenance",
    "events_session_type_lift",
    "multimodal_audio_vad_segments",
    "ml_qini_uplift_deciles",
    "ops_otif_fill_rate",
    "multimodal_audio_gain_normalize",
    "inequality_gini_lorenz",
    "ml_brier_murphy_decomposition",
    "finance_npv_irr_rate_grid",
    "assortment_coverage_gaps",
    "layout_learned_index_epsilon",
    "time_business_day_sla",
    "approx_countmin_sketch_audit",
    "stat_quantile_mapping_transfer",
    "finance_max_drawdown_underwater",
    "stats_exact_raw_moments",
    "orders_abc_xyz_classification",
    "asof_nearest_purchase_click",
    "finance_arc_price_elasticity",
    "supplier_composite_scorecard",
    "market_concentration_cr4",
    "text_kwic_concordance",
    "search_phrase_positions",
    "finance_net_dollar_retention",
    "geo_closest_pair_pernation",
    "multimodal_video_scene_cuts",
    "sql_integer_division_semantics_battery",
    "timeseries_haar_wavelet_energy",
    "supply_bullwhip_variance_ratio",
    "mdm_survivorship_policy_battery",
    "graph_modularity_nations",
    "sql_relational_division",
    "stats_grain_fallacy_audit",
    "causal_diff_in_differences",
    "dq_constraint_mining_audit",
    "layout_codec_chooser",
    "pipeline_dataloader_shuffle_audit",
    "privacy_erasure_blast_radius",
    "audit_merkle_month_digests",
    "stat_exact_permutation_pvalue",
    "pipeline_bpe_tokenize_apply",
    "ml_evalset_sizing_curve",
    "scd2_point_in_time_join",
    "multimodal_frame_dedup",
    "linkage_phonetic_blocking",
    "election_voting_rules_compared",
    "sql_qualify_window_filter",
    "events_peak_prominence_daily",
    "audit_event_hash_chain",
    "ml_target_encoding_loo",
    "experiment_cuped_variance_reduction",
    "ml_average_precision_exact",
    "sec_impossible_travel_audit",
    "finance_vwap_divergence",
    "events_markov_homogeneity",
    "experiment_mde_power_analysis",
    "supply_bullwhip_ratio",
    "forecast_holt_linear_replay",
    "cdc_log_compaction",
    "agg_approx_percentile_rank_guarantee",
    "ops_kingman_vut_approximation",
    "experiment_ipw_confounder_correction",
    "finance_price_volume_mix",
    "lakehouse_snapshot_diff_audit",
    "stats_benjamini_hochberg_fdr",
    "events_dau_mau_stickiness",
    "hash_truncation_collision_audit",
    "corpus_drift_idf_shift",
    "quality_expectation_suite",
    "forecast_croston_intermittent",
    "stats_jackknife_ratio_variance",
    "emb_mips_vs_cosine_divergence",
    "alloc_apportionment_methods",
    "orders_priority_mix_shift",
    "opt_knapsack_density_gap",
    "forecast_conformal_interval_audit",
    "graph_degree_assortativity",
    "lakehouse_cdc_changefeed",
    "lakehouse_time_travel_merge",
    "sales_quarter_hockey_stick",
    "orders_backlog_daily",
    "text_zipf_bigram_buckets",
    "stats_simpsons_paradox_scan",
    "emb_int8_quantization_error",
    "routing_tsp_nn_2opt",
    "anomaly_hampel_filter_daily",
    "causal_coarsened_exact_matching",
    "sim_ndcg_retrieval_eval",
    "graph_avg_neighbor_degree",
    "finance_price_volume_bridge",
    "isotonic_regression_exact",
    "audit_duplicate_invoice_candidates",
    "emb_fisher_separation_ratio",
    "ml_leakage_detector_audit",
    "sampling_design_error_comparison",
    "risk_block_maxima_return_level",
    "causal_rdd_quantity_cutoff",
    "audit_duplicate_payment_detector",
    "sql_full_outer_rewrite_equivalence",
    "privacy_l_diversity_audit",
    "ops_incident_mttr_stats",
    "finance_rounding_mode_battery",
    "trend_theil_sen_slope",
    "events_circular_hour_stats",
    "ops_incident_cooccurrence_lift",
    "layout_zonemap_skipping_audit",
    "ops_backoff_conformance_audit",
    "ops_erlang_b_blocking",
    "timeseries_kadane_extremes",
    "layout_delta_varint_economics",
    "changepoint_two_segment_sse",
    "sketch_bloom_fpr_audit",
    "text_hashing_trick_collisions",
    "layout_prefix_compression_audit",
    "approx_cms_count_estimates",
    "audit_tv_distance_drift",
    "ops_sla_credit_calculation",
    "sql_grouping_id_rollup_decode",
    "layout_compaction_coalesce_plan",
    "time_fiscal_445_calendar",
    "privacy_t_closeness_emd",
    "events_watermark_lateness_profile",
    "forecast_pinball_loss_eval",
    "text_boilerplate_line_removal",
    "linkage_fellegi_sunter_scores",
    "inventory_dead_stock_audit",
    "pipeline_dataset_shard_manifest",
    "ml_gain_chart_deciles",
    "privacy_dp_geometric_counts",
    "rank_wilson_lower_bound",
    "search_autocomplete_prefix_topk",
    "ml_permutation_feature_importance",
    "timeseries_rolling_correlation",
    "election_kemeny_rank_4",
    "sql_decorrelation_equivalence",
    "alert_hysteresis_daily",
    "stats_median_of_means",
    "join_salted_skew_equivalence",
    "queueing_littles_law_audit",
    "sql_not_in_null_trap_battery",
    "approx_hll_register_audit",
    "scd_aswas_vs_asis_revenue",
    "join_hot_cold_split_equivalence",
    "format_csv_malformed_modes",
    "events_cusum_changepoint",
    "optimizer_independence_qerror",
    "privacy_generalization_ladder",
    "quality_shewhart_control_chart",
    "ops_cron_schedule_expansion",
    "finance_fx_triangulation_audit",
    "ml_gini_stump_induction",
    "forecast_backtest_naive_vs_seasonal",
    "optimizer_predicate_order_cost",
    "inventory_eoq_batch_sizing",
    "time_fiscal_calendar_rollup",
    "experiment_sprt_daily_replay",
    "finance_day_count_conventions",
    "survival_logrank_test",
    "window_ntile_remainder_semantics",
    "events_sliding_window_rate_limit",
    "text_hapax_ratio_by_lang",
    "privacy_k_anonymity_audit",
    "regression_ols_exact",
    "timeseries_sax_motifs",
    "dq_luhn_check_digit_audit",
    "stats_effective_sample_size",
    "storage_delta_of_delta_gorilla",
    "slo_multiwindow_burn_alerts",
    "dist_rendezvous_hash_rebalance",
    "search_phrase_positional_index",
    "dedup_shard_strategy_audit",
    "fairness_selection_rate_audit",
    "ml_auc_feature_screen",
    "emb_triangle_inequality_audit",
    "format_csv_dialect_battery",
    "experiment_srm_guardrail",
    "fairness_equalized_odds_audit",
    "ml_negative_sampling_audit",
    "sql_window_frame_default_trap",
    "web_url_canonical_dedup",
    "orders_cum_distinct_customers",
    "sampling_neyman_allocation",
    "time_add_months_eom_battery",
    "audience_overlap_matrix",
    "sql_range_vs_rows_frames",
    "text_good_turing_mass",
    "pipeline_filter_attrition_funnel",
    "privacy_fpe_mask_audit",
    "survival_km_hazard_table",
    "finance_amortization_schedule",
    "pipeline_curriculum_stage_budgets",
    "sql_null_ordering_battery",
    "stat_runs_test_daily",
    "trend_mann_kendall_monthly",
    "geo_point_in_polygon_winding",
    "sql_explode_outer_battery",
    "timeseries_best_split_changepoint",
    "serving_decayed_leaderboard",
    "audit_price_round_number_bias",
    "dq_freshness_staleness_audit",
    "ml_kfold_cv_accuracy",
    "pipeline_temperature_sampling_weights",
    "events_poisson_dispersion_test",
    "sql_nulls_ordering_battery",
    "ml_mcnemar_paired_classifiers",
    "ml_annotator_agreement_kappa",
    "privacy_randomized_response_estimate",
    "dq_ingestion_gap_detector",
    "time_iso_week_battery",
    "agg_mode_deterministic",
    "sql_pivot_quarterly_revenue",
    "events_weekday_hour_heatmap",
    "ml_calibration_reliability_bins",
    "sql_null_semantics_battery",
    "time_t2_settlement_battery",
    "events_autocorrelation_daily",
    "slo_error_budget_burn",
    "text_stopword_discovery",
    "text_encoding_byte_audit",
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
