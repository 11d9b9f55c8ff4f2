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
# of queries() each round; rounds 1-5 verified 246 distinct queries green
# (CORRECTNESS_r01-r05, zero unfixed failures). Round 6 front-loads 50 of
# the 338 never-driver-checked queries, leading with the HEAVIEST AND MOST
# NOVEL (the round-5 verdict's named list: stable matching, Boruvka MST,
# k-hop SSSP, monthly DTW, the refinery capstone, Apriori triples,
# asymmetric-containment dedup, revenue recognition, LRU replay, Markov
# removal attribution, the F2 moment sketch, and the session-6 novelties),
# then the remaining never-checked sorted by measured sf0.1 cost
# descending. Past slot 50: every OTHER never-checked query (so any wider
# window still hits fresh rows first); previously-green entries trail via
# _ordered_names (still covered by the sf0.001 pytest parity gate and the
# full sf0.01 driver_sim certification each round).
_VERIFICATION_PRIORITY = [
    # --- front 50: never driver-checked, heavy/novel first ---
    "match_stable_assignment",
    "graph_mst_boruvka",
    "graph_sssp_khop_cheapest",
    "timeseries_dtw_monthly",
    "pipeline_refinery_capstone_v2",
    "basket_apriori_triples",
    "dedup_containment_asymmetric",
    "revenue_recognition_schedule",
    "cache_lru_hit_rate",
    "attribution_markov_removal",
    "approx_f2_moment_sketch",
    "stats_cramer_von_mises_exact",
    "finance_order_total_reconciliation",
    "anomaly_mahalanobis_diag_topk",
    "graph_health_card",
    "finance_stepdown_allocation",
    "experiment_icc_design_effect",
    "pipeline_release_scorecard_capstone",
    "graph_clustering_coefficient",
    "graph_functional_cycle_structure",
    "graph_dag_critical_path",
    "search_prf_query_expansion",
    "stat_mood_dispersion_test",
    "emb_knn_distance_outliers",
    "ml_adaboost_two_round_stumps",
    "dq_foreign_key_inference",
    "cf_recommendation_coverage",
    "stat_kruskal_wallis_ranksums",
    "graph_personalized_pagerank",
    "layout_sort_order_rle_bakeoff",
    "ml_roc_threshold_sweep",
    "seq_lis_per_customer",
    "dedup_minhash_estimator_error",
    "dedup_threshold_yield_curve",
    "dedup_shingle_size_sensitivity",
    "multimodal_audio_pitch_autocorr",
    "dedup_cross_source_matrix",
    "ml_capstone_nb_threshold_fairness",
    "emb_jl_projection_distortion",
    "scheduling_knapsack_exact",
    "selection_greedy_max_coverage",
    "scheduling_weighted_interval_dp",
    "join_bucketed_colocated",
    "geo_dbscan_grid_clusters",
    "stats_histogram_selectivity_audit",
    "stat_spearman_rank_correlation",
    "graph_hits_bipartite_counts",
    "events_markov_stationary_power",
    "cf_item_item_topk",
    "encoding_huffman_5symbol_exact",
    # --- wave-210 (round 6): never driver-checked, behind the window ---
    "approx_countmin_sketch_audit",
    "sketch_bloom_fpr_audit",
    "dedup_lsh_band_row_tradeoff",
    "inventory_wac_moving_average",
    "finance_amortization_schedule",
    "finance_day_count_conventions",
    "window_ntile_remainder_semantics",
    "sql_qualify_window_filter",
    "sql_grouping_id_rollup_decode",
    "pipeline_curriculum_stage_budgets",
    "pipeline_temperature_sampling_weights",
    "web_url_canonical_dedup",
    "text_boilerplate_line_removal",
    "events_sliding_window_rate_limit",
    "agg_approx_percentile_rank_guarantee",
    "emb_power_iteration_top_eigen",
    "graph_avg_neighbor_degree",
    "join_hot_cold_split_equivalence",
    "multimodal_audio_gain_normalize",
    # --- remaining never-driver-checked (288) ---
    "serving_hierarchical_range_sums",
    "dist_consistent_hash_rebalance",
    "streaming_token_bucket_quota",
    "graph_bfs_reachability_khop",
    "graph_betweenness_nations",
    "events_heavy_hitters_mg_replay",
    "text_ngram_novelty_rate",
    "audit_join_fanout_estimates",
    "stats_ndv_correlation_audit",
    "graph_eccentricity_diameter",
    "approx_hdr_histogram_quantile_audit",
    "election_irv_rounds",
    "ml_cost_optimal_threshold",
    "search_rrf_rank_fusion",
    "graph_triangle_sample_estimator",
    "graph_two_hop_reach_panel",
    "queue_lindley_wait_replay",
    "emb_mmr_diversified_topk",
    "stats_exact_raw_moments",
    "stats_bootstrap_ci_deterministic",
    "customer_value_tier_migration",
    "inventory_leadtime_demand_convolution",
    "bandit_epsilon_greedy_replay",
    "inventory_capped_running_balance",
    "fd_inclusion_dependency_discovery",
    "process_trace_variants_conformance",
    "multimodal_audio_zero_crossings",
    "inventory_demand_quantiles_counting",
    "orders_abc_xyz_classification",
    "rank_kendall_tau_nations",
    "graph_katz_centrality_integer",
    "fd_discovery_audit",
    "geo_grid_radius_join",
    "geo_getis_ord_hotspots",
    "attribution_shapley_exact",
    "sim_matryoshka_prefix_recall",
    "inventory_reorder_point_replay",
    "emb_triplet_margin_audit",
    "auction_second_price_clearing",
    "interval_allen_census",
    "ml_model_scorecard",
    "graph_jaccard_link_prediction",
    "inventory_newsvendor_quantile",
    "sched_smith_rule_wspt",
    "inventory_fifo_lot_valuation",
    "multimodal_audio_vad_segments",
    "audit_merkle_month_digests",
    "stats_cusum_arl_calibration",
    "streaming_windowed_topk_types",
    "layout_range_partition_balance",
    "ml_qini_uplift_deciles",
    "graph_rich_club_permille",
    "sampling_neyman_sd_allocation",
    "ml_average_precision_exact",
    "text_skipgram_pairs",
    "search_rbo_rank_overlap",
    "search_postings_gap_stats",
    "finance_price_volume_mix",
    "ml_nb_learning_curve",
    "causal_quantile_treatment_effect",
    "events_session_type_lift",
    "brand_rank_momentum",
    "view_incremental_join_maintenance",
    "graph_modularity_nations",
    "stats_simpsons_paradox_scan",
    "finance_arc_price_elasticity",
    "timeseries_haar_wavelet_energy",
    "inequality_gini_lorenz",
    "text_burrows_delta_stylometry",
    "asof_nearest_purchase_click",
    "emb_cosine_pair_histogram",
    "events_peak_prominence_daily",
    "dq_correlation_matrix",
    "inventory_intermittency_quadrants",
    "search_trigram_fuzzy_parts",
    "eval_topk_stability_splithalf",
    "finance_net_dollar_retention",
    "dq_primary_key_violation_audit",
    "supply_bullwhip_variance_ratio",
    "events_repeat_rate_7d",
    "market_concentration_cr4",
    "data_shapley_knn_exact",
    "repair_mode_imputation_accuracy",
    "time_business_day_sla",
    "ops_littles_law_identity",
    "geo_closest_pair_pernation",
    "election_voting_rules_compared",
    "graph_friendship_paradox",
    "dq_semantic_type_inference",
    "layout_hilbert_vs_zorder_locality",
    "experiment_ipw_confounder_correction",
    "orders_priority_mix_shift",
    "stats_ipf_raking",
    "finance_vwap_divergence",
    "emb_nearest_centroid_accuracy",
    "search_phrase_positions",
    "ml_brier_murphy_decomposition",
    "experiment_cuped_variance_reduction",
    "optimizer_join_order_cost_audit",
    "ops_kingman_vut_approximation",
    "text_kwic_concordance",
    "emb_fisher_label_separation",
    "quality_expectation_suite",
    "layout_delta_varint_economics",
    "risk_cvar_tail_concentration",
    "pipeline_bpe_tokenize_apply",
    "emb_mips_vs_cosine_divergence",
    "graph_degree_assortativity",
    "audit_duplicate_invoice_candidates",
    "forecast_croston_intermittent",
    "lakehouse_cdc_changefeed",
    "forecast_holt_linear_replay",
    "ml_target_encoding_loo",
    "compression_rle_economics",
    "alloc_maxmin_fair_share",
    "stats_median_ci_orderstat",
    "isotonic_regression_exact",
    "ml_naive_bayes_exact_argmax",
    "multimodal_audio_frame_energy",
    "text_rake_keyphrases",
    "text_zipf_bigram_buckets",
    "ops_otif_fill_rate",
    "multimodal_video_scene_cuts",
    "corpus_drift_idf_shift",
    "dq_constraint_mining_audit",
    "linkage_phonetic_blocking",
    "trend_theil_sen_slope",
    "sampling_design_error_comparison",
    "stat_quantile_mapping_transfer",
    "attribution_position_based",
    "emb_fisher_separation_ratio",
    "stats_benjamini_hochberg_fdr",
    "assortment_coverage_gaps",
    "lakehouse_time_travel_merge",
    "pipeline_dataloader_shuffle_audit",
    "cdc_log_compaction",
    "stat_ks_two_sample",
    "events_circular_hour_stats",
    "inequality_hoover_index",
    "scd2_point_in_time_join",
    "layout_learned_index_epsilon",
    "finance_npv_irr_rate_grid",
    "rank_wilson_lower_bound",
    "sampling_systematic_vs_hash",
    "sim_ndcg_retrieval_eval",
    "causal_diff_in_differences",
    "mdm_survivorship_policy_battery",
    "sql_relational_division",
    "ml_evalset_sizing_curve",
    "layout_dictionary_encoding_economics",
    "layout_prefix_compression_audit",
    "timeseries_kadane_extremes",
    "forecast_pinball_loss_eval",
    "regression_ransac_deterministic",
    "routing_tsp_nn_2opt",
    "anomaly_hampel_filter_daily",
    "supplier_composite_scorecard",
    "privacy_erasure_blast_radius",
    "pipeline_dataset_shard_manifest",
    "changepoint_two_segment_sse",
    "stats_grain_fallacy_audit",
    "inventory_eoq_batch_sizing",
    "join_salted_skew_equivalence",
    "audit_event_hash_chain",
    "layout_compaction_coalesce_plan",
    "causal_coarsened_exact_matching",
    "sql_not_in_null_trap_battery",
    "finance_price_volume_bridge",
    "stat_exact_permutation_pvalue",
    "layout_zonemap_skipping_audit",
    "privacy_t_closeness_emd",
    "events_dau_mau_stickiness",
    "sec_impossible_travel_audit",
    "queueing_littles_law_audit",
    "ml_permutation_feature_importance",
    "layout_codec_chooser",
    "events_watermark_lateness_profile",
    "alloc_apportionment_methods",
    "optimizer_independence_qerror",
    "approx_cms_count_estimates",
    "orders_backlog_daily",
    "events_cusum_changepoint",
    "ops_incident_mttr_stats",
    "time_fiscal_calendar_rollup",
    "linkage_fellegi_sunter_scores",
    "forecast_conformal_interval_audit",
    "privacy_k_anonymity_audit",
    "hash_truncation_collision_audit",
    "text_hashing_trick_collisions",
    "survival_logrank_test",
    "supply_bullwhip_ratio",
    "opt_knapsack_density_gap",
    "privacy_dp_geometric_counts",
    "privacy_l_diversity_audit",
    "multimodal_frame_dedup",
    "sql_integer_division_semantics_battery",
    "format_csv_malformed_modes",
    "stats_jackknife_ratio_variance",
    "emb_int8_quantization_error",
    "sales_quarter_hockey_stick",
    "ml_gini_stump_induction",
    "dist_rendezvous_hash_rebalance",
    "finance_max_drawdown_underwater",
    "audit_duplicate_payment_detector",
    "geo_point_in_polygon_winding",
    "format_csv_dialect_battery",
    "experiment_sprt_daily_replay",
    "approx_hll_register_audit",
    "ml_auc_feature_screen",
    "causal_rdd_quantity_cutoff",
    "stats_median_of_means",
    "experiment_mde_power_analysis",
    "finance_fx_triangulation_audit",
    "ops_erlang_b_blocking",
    "audit_tv_distance_drift",
    "trend_mann_kendall_monthly",
    "events_markov_homogeneity",
    "ml_negative_sampling_audit",
    "sql_full_outer_rewrite_equivalence",
    "ml_leakage_detector_audit",
    "search_autocomplete_prefix_topk",
    "finance_rounding_mode_battery",
    "ml_gain_chart_deciles",
    "alert_hysteresis_daily",
    "dq_luhn_check_digit_audit",
    "inventory_dead_stock_audit",
    "text_hapax_ratio_by_lang",
    "audience_overlap_matrix",
    "lakehouse_snapshot_diff_audit",
    "timeseries_sax_motifs",
    "ops_cron_schedule_expansion",
    "election_kemeny_rank_4",
    "ops_incident_cooccurrence_lift",
    "forecast_backtest_naive_vs_seasonal",
    "quality_shewhart_control_chart",
    "timeseries_rolling_correlation",
    "events_weekday_hour_heatmap",
    "stat_runs_test_daily",
    "ops_backoff_conformance_audit",
    "ops_sla_credit_calculation",
    "regression_ols_exact",
    "scd_aswas_vs_asis_revenue",
    "dq_freshness_staleness_audit",
    "timeseries_best_split_changepoint",
    "fairness_selection_rate_audit",
    "risk_block_maxima_return_level",
    "stats_effective_sample_size",
    "ml_kfold_cv_accuracy",
    "survival_km_hazard_table",
    "sql_decorrelation_equivalence",
    "ml_annotator_agreement_kappa",
    "experiment_srm_guardrail",
    "orders_cum_distinct_customers",
    "privacy_generalization_ladder",
    "events_autocorrelation_daily",
    "time_fiscal_445_calendar",
    "search_phrase_positional_index",
    "text_stopword_discovery",
    "pipeline_filter_attrition_funnel",
    "privacy_randomized_response_estimate",
    "serving_decayed_leaderboard",
    "sampling_neyman_allocation",
    "ml_calibration_reliability_bins",
    "audit_price_round_number_bias",
    "sql_pivot_quarterly_revenue",
    "slo_error_budget_burn",
    "events_poisson_dispersion_test",
    "optimizer_predicate_order_cost",
    "slo_multiwindow_burn_alerts",
    "storage_delta_of_delta_gorilla",
    "sql_range_vs_rows_frames",
    "text_good_turing_mass",
    "agg_mode_deterministic",
    "sql_nulls_ordering_battery",
    "sql_null_ordering_battery",
    "fairness_equalized_odds_audit",
    "dedup_shard_strategy_audit",
    "time_iso_week_battery",
    "privacy_fpe_mask_audit",
    "ml_mcnemar_paired_classifiers",
    "emb_triangle_inequality_audit",
    "sql_window_frame_default_trap",
    "sql_explode_outer_battery",
    "time_add_months_eom_battery",
    "time_t2_settlement_battery",
    "text_encoding_byte_audit",
    "dq_ingestion_gap_detector",
    "sql_null_semantics_battery",
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
