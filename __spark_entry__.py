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
# of queries() each round; rounds 1+2 verified 96 distinct queries green
# (CORRECTNESS_r01/r02). Round 3 rotates those to the back and front-loads
# 50 queries that have NEVER had a driver correctness row, in the judge's
# priority order (VERDICT r2 "Next round" #1): capstones, PQ ANN, the
# SQL-text front end, the shaped TPC-H wave, streaming SCD2 / stream-
# stream join, the format matrix, and this round's four scale-fix
# queries (rfm / curriculum / drift / fuzzy — fixed plans MUST face the
# hard signal). Remaining never-checked queries follow immediately after
# slot 50 so a wider window picks them up; previously-green entries
# trail at the end (still covered by the sf0.001 pytest parity gate).
_VERIFICATION_PRIORITY = [
    # --- front 50: never driver-checked, highest value first ---
    "pipeline_training_export_e2e",
    "multimodal_chunk_dedup",
    "sim_pq_adc_topk",
    "sql_lateral_view_tokens",
    "sql_named_window_shares",
    "sql_pivot_syntax",
    "sql_inline_values_join",
    "q2_shaped_cheapest_supplier",
    "q9_shaped_profit_by_nation_year",
    "q11_shaped_high_value_parts",
    "q16_shaped_supplier_diversity",
    "q18_large_volume_customers",
    "q20_shaped_dominant_supplier",
    "q21_sole_late_supplier",
    "q22_shaped_dormant_high_balance",
    "streaming_sliding_counts",
    "streaming_dedup_replay",
    "streaming_stream_stream_join",
    "streaming_scd2_upsert",
    "streaming_static_enrich",
    "format_roundtrip_matrix",
    "format_schema_evolution",
    "format_text_lines_roundtrip",
    "format_xml_extract",
    "format_dynamic_partition_overwrite",
    "format_jsonl_corrupt_records",
    "format_csv_multiline_quoted",
    "rfm_customer_segments",
    "pipeline_curriculum_interleave",
    "audit_distribution_drift",
    "fuzzy_name_matches",
    "graph_triangle_count",
    "pipeline_ffd_packing",
    "text_tfidf_top_terms",
    "json_variant_extract",
    "sampling_stratified_fixed_n",
    "emb_pca_projection",
    "skew_salted_event_totals",
    "events_cohort_retention",
    "text_pmi_bigrams",
    "quality_decile_buckets",
    "graph_pagerank_nations",
    "money_allocation_largest_remainder",
    "exact_median_selection",
    "agg_bitmap_distinct",
    "approx_theta_set_algebra",
    "pipeline_token_budget_selection",
    "top_event_paths",
    "anomaly_rolling_zscore",
    "customer_purchase_streaks",
    # --- never checked, continue past slot 50 (bonus if window wider) ---
    "regr_price_trend_by_brand",
    "outliers_mad_orders",
    "profile_orders_audit",
    "events_markov_transitions",
    "events_rolling_wau",
    "orders_incremental_rollup",
    "time_hierarchy_rollup",
    "basket_part_pairs",
    "price_histogram",
    "chisq_segment_priority",
    "sampling_pps_orders",
    "inverted_index_top_terms",
    "share_of_parent_revenue",
    "timeseries_gapfill_ffill",
    "gini_customer_spend",
    "welch_ttest_price_segments",
    "referential_integrity_audit",
    "table_diff_changelog",
    "token_diversity_by_lang",
    "weighted_median_price_per_flag",
    "revenue_mom_yoy",
    "pareto_frontier_parts",
    "skew_profile_supplier_keys",
    "winsorized_price_stats",
    "sampling_group_disjoint_split",
    "dedup_canonical_selection",
    "pareto_80_20_customers",
    "reconcile_order_totals",
    "funnel_conversion_lag_stats",
    "degree_distribution_suppliers",
    "map_function_battery",
    "posexplode_reconstruction",
    "orderkey_gap_islands",
    "asof_tolerance_attribution",
    "text_pii_redaction",
    "gapfill_linear_interp",
    "pattern_event_sequences",
    "layout_zorder_box_query",
    "sampling_weighted_reservoir",
    "pipeline_document_chunking",
    "events_time_weighted_value",
    "rolling_median_weekly",
    "hierarchy_transitive_closure",
    "maintenance_compact_files",
    "approx_hll_mergeable",
    "audit_benford_first_digit",
    "concurrency_sweepline_daily",
    "text_readability_scores",
    "feature_quantile_normalization",
    "window_rank_battery",
    "scalar_try_functions_battery",
    "maintenance_gdpr_erasure",
    "privacy_pseudonymize_stable_ids",
    "events_sliding_distinct_users",
    "interval_join_campaign_orders",
    "text_gopher_filters",
    "approx_frequent_tokens",
    "text_bigram_continuation_counts",
    "timeseries_seasonal_decompose",
    "events_growth_accounting",
    "basket_association_rules",
    "setop_all_variants",
    "join_hint_shuffle_hash",
    "generator_outer_edge_battery",
    "join_null_safe_equality",
    "agg_listagg_ordered",
    "agg_bitwise_battery",
    # --- wave 28 (round 3): new, never checked ---
    "search_bm25_topk",
    "pipeline_source_mixing_weights",
    "events_ewma_daily_value",
    "pipeline_length_bucket_padding",
    # --- waves 29-31 (round 3): new, never checked ---
    "sim_sq_int8_topk",
    "orders_running_total_distributed",
    "dedup_method_agreement",
    "sql_recursive_month_spine",
    "sql_lateral_topn_per_nation",
    "pipeline_incremental_dedup",
    "graph_kcore_rounds",
    "format_fixed_width_ingest",
    "pipeline_corpus_card",
    "token_simpson_diversity_by_lang",
    "emb_knn_label_accuracy",
    "streaming_daily_distinct_users",
    "orders_cohort_ltv_triangle",
    "supplier_hhi_by_part_type",
    "events_interarrival_stats",
    "text_vocab_growth_curve",
    "events_burstiness_index",
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
