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
# of queries() each round. Rounds 1-10 verified 496 distinct queries
# green (CORRECTNESS_r01-r10; zero failures ever left unfixed), leaving
# a 172-query never-driver-checked backlog at round-11 open. Round 11
# front-loads that backlog by measured sf0.1 bench cost desc (the
# round-10 verdict's rotation directive); any new wave-215 queries are
# inserted in <=10 leading slots so a full tranche of old backlog still
# retires. Past slot ~50: the REST of the never-checked backlog, cost
# desc (so any wider window still hits fresh rows first); previously-
# green entries trail via _ordered_names (still covered by the sf0.001
# pytest parity gate and the full sf0.01 driver_sim certification each
# round).
_VERIFICATION_PRIORITY = [
    # --- round-12 verification window: the next 50-query tranche of the
    # never-driver-checked backlog (142 remaining at r12 open), kept in
    # the r11 cost-desc order. The 50 entries verified in round 11
    # (waves 215/216 + 30 backlog) rotate to the TAIL below, so
    # CORRECTNESS_r12 keys are disjoint from r01-r11 (standing
    # directive). ---
    "routing_tsp_nn_2opt",
    "corpus_drift_idf_shift",
    "sales_quarter_hockey_stick",
    "layout_compaction_coalesce_plan",
    "supply_bullwhip_ratio",
    "cdc_log_compaction",
    "regression_ransac_deterministic",
    "alloc_apportionment_methods",
    "sim_ndcg_retrieval_eval",
    "anomaly_hbos_bincount_topk",
    "layout_zonemap_skipping_audit",
    "join_hot_cold_split_equivalence",
    "multimodal_frame_dedup",
    "audit_tv_distance_drift",
    "lakehouse_snapshot_diff_audit",
    "ops_incident_cooccurrence_lift",
    "optimizer_independence_qerror",
    "election_kemeny_rank_4",
    "sched_wfq_virtual_finish",
    "changepoint_two_segment_sse",
    "hash_truncation_collision_audit",
    "ops_incident_mttr_stats",
    "ops_backoff_conformance_audit",
    "trend_theil_sen_slope",
    "alert_hysteresis_daily",
    "finance_rounding_mode_battery",
    "sql_integer_division_semantics_battery",
    "forecast_conformal_interval_audit",
    "events_cusum_changepoint",
    "rank_wilson_lower_bound",
    "privacy_dp_geometric_counts",
    "sched_edf_feasibility_audit",
    "election_banzhaf_power_index",
    "pipeline_dataset_shard_manifest",
    "experiment_sprt_daily_replay",
    "dist_rendezvous_hash_rebalance",
    "inventory_dead_stock_audit",
    "sketch_bloom_fpr_audit",
    "ml_evalset_sizing_curve",
    "privacy_k_anonymity_audit",
    "approx_hll_register_audit",
    "privacy_t_closeness_emd",
    "privacy_l_diversity_audit",
    "scd_aswas_vs_asis_revenue",
    "sql_full_outer_rewrite_equivalence",
    "join_bloom_prefilter_equivalence",
    "orders_cum_distinct_customers",
    "stat_wilcoxon_signed_rank",
    "survival_logrank_test",
    "trend_mann_kendall_monthly",
    "ml_negative_sampling_audit",
    "time_fiscal_445_calendar",
    "sql_grouping_id_rollup_decode",
    "timeseries_kadane_extremes",
    "format_csv_malformed_modes",
    "linkage_fellegi_sunter_scores",
    "finance_fx_triangulation_audit",
    "ml_leakage_detector_audit",
    "sql_not_in_null_trap_battery",
    "ml_auc_feature_screen",
    "layout_prefix_compression_audit",
    "auction_uniform_price_clearing",
    "queueing_littles_law_audit",
    "text_boilerplate_line_removal",
    "storage_delta_of_delta_gorilla",
    "format_csv_dialect_battery",
    "ops_sla_credit_calculation",
    "text_good_turing_mass",
    "ml_gain_chart_deciles",
    "search_phrase_positional_index",
    "risk_block_maxima_return_level",
    "privacy_generalization_ladder",
    "stats_effective_sample_size",
    "timeseries_sax_motifs",
    "time_fiscal_calendar_rollup",
    "optimizer_predicate_order_cost",
    "stat_exact_permutation_pvalue",
    "privacy_fpe_mask_audit",
    "layout_delta_varint_economics",
    "ml_gini_stump_induction",
    "sql_decorrelation_equivalence",
    "events_sliding_window_rate_limit",
    "forecast_backtest_naive_vs_seasonal",
    "regression_ols_exact",
    "sql_pivot_quarterly_revenue",
    "search_autocomplete_prefix_topk",
    "forecast_pinball_loss_eval",
    "sql_null_ordering_battery",
    "sql_range_vs_rows_frames",
    "dq_luhn_check_digit_audit",
    "ops_erlang_b_blocking",
    "finance_day_count_conventions",
    "finance_progressive_tax_brackets",
    "events_autocorrelation_daily",
    "ml_permutation_feature_importance",
    "fairness_equalized_odds_audit",
    "pipeline_filter_attrition_funnel",
    "timeseries_rolling_correlation",
    "audit_price_round_number_bias",
    "sampling_neyman_allocation",
    "agg_mode_deterministic",
    "emb_triangle_inequality_audit",
    "layout_lsm_writeamp_economics",
    "approx_cms_count_estimates",
    "text_hapax_ratio_by_lang",
    "window_ntile_remainder_semantics",
    "inventory_eoq_batch_sizing",
    "survival_km_hazard_table",
    "dedup_shard_strategy_audit",
    "slo_multiwindow_burn_alerts",
    "finance_amortization_schedule",
    "time_add_months_eom_battery",
    "web_url_canonical_dedup",
    "stats_jackknife_ratio_variance",
    "ml_kfold_cv_accuracy",
    "events_weekday_hour_heatmap",
    "pipeline_curriculum_stage_budgets",
    "sql_null_semantics_battery",
    "ops_cron_schedule_expansion",
    "fairness_selection_rate_audit",
    "quality_shewhart_control_chart",
    "sql_window_frame_default_trap",
    "time_iso_week_battery",
    "ml_calibration_reliability_bins",
    "geo_point_in_polygon_winding",
    "slo_error_budget_burn",
    "audience_overlap_matrix",
    "dq_ingestion_gap_detector",
    "ml_annotator_agreement_kappa",
    "timeseries_best_split_changepoint",
    "pipeline_temperature_sampling_weights",
    "experiment_srm_guardrail",
    "text_stopword_discovery",
    "dq_freshness_staleness_audit",
    "time_t2_settlement_battery",
    "sql_explode_outer_battery",
    "ml_mcnemar_paired_classifiers",
    "text_encoding_byte_audit",
    "stat_runs_test_daily",
    "serving_decayed_leaderboard",
    "privacy_randomized_response_estimate",
    "events_poisson_dispersion_test",
    # --- verified green in round 11 (waves 215/216 + backlog tranche),
    # rotated behind the never-checked backlog ---
    "stat_durbin_watson_autocorr",
    "regr_leverage_hat_audit",
    "privacy_shamir_secret_sharing",
    "ops_aimd_cwnd_replay",
    "queue_lindley_waiting_replay",
    "election_schulze_widest_path",
    "election_irv_exhaustive_runoff",
    "eval_bradley_terry_rounds",
    "graph_scc_kosaraju_labels",
    "sched_bankers_algorithm_safety",
    "sched_lpt_makespan_bound",
    "stat_page_trend_test",
    "stat_cochran_q_test",
    "alloc_talmud_bankruptcy",
    "graph_harmonic_centrality",
    "stat_jonckheere_terpstra",
    "graph_bridge_edges",
    "time_easter_computus",
    "events_allan_variance",
    "dq_hamming74_ecc_audit",
    "events_repeat_rate_7d",
    "compression_rle_economics",
    "audit_merkle_month_digests",
    "ml_target_encoding_loo",
    "opt_knapsack_density_gap",
    "quality_expectation_suite",
    "finance_vwap_divergence",
    "sec_impossible_travel_audit",
    "text_zipf_bigram_buckets",
    "finance_price_volume_mix",
    "stat_quantile_mapping_transfer",
    "attribution_position_based",
    "stats_simpsons_paradox_scan",
    "events_watermark_lateness_profile",
    "anomaly_hampel_filter_daily",
    "stats_grain_fallacy_audit",
    "orders_priority_mix_shift",
    "dq_missingness_pattern_mining",
    "stats_median_of_means",
    "causal_diff_in_differences",
    "finance_price_volume_bridge",
    "layout_dictionary_encoding_economics",
    "isotonic_regression_exact",
    "sql_relational_division",
    "causal_rdd_quantity_cutoff",
    "emb_int8_quantization_error",
    "alloc_airport_game_shapley",
    "causal_coarsened_exact_matching",
    "text_hashing_trick_collisions",
    "multimodal_video_scene_cuts",
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
