"""Named-query registry — the engine's oracle-checkable surface.

Each query is registered with:
- a builder ``(spark, sf_dir) -> DataFrame`` (pure DataFrame API, lazy), and
- optionally a DuckDB-compatible ANSI-SQL oracle string over the same
  parquet tables (registered as views ``region nation customer supplier
  part orders lineitem events documents embeddings``).

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value-hash, so every computed column must carry the
SAME alias in the Spark builder and the SQL, and float outputs are
rounded/cast identically on both sides (SURVEY.md §7 "hard parts").

Since r9 EVERY registered query carries an oracle — genuinely
non-SQL-expressible ops use certificate oracles (tolerance-certified
sketches, md5-replayable LSH twins, exact-integer trace anchors)
instead of falling back to rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_MODULES = (
    "relational",
    "reference_ops",
    "text_analysis",
    "dedup",
    "similarity",
    "sessions",
    "multimodal",
    "extended",
    "functions_suite",
    "subqueries",
    "windows_extra",
    "training_pipeline",
    "reshape",
    "corpus_cleanup",
    "analytics",
    "data_quality",
    "jsonl_source",
    "substring",
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder (and its oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


_loaded = False

# The driver's CORRECTNESS sweep covers the FIRST ~50 queries in
# ``queries()`` iteration order. Round-10 rotation (VERDICT r09 #1:
# the 20 r06-latest queries are 3 driver-rounds stale and MUST clear
# this window; standing rule: queries whose values, oracles, or
# plans changed this round re-earn a driver row first). Composition:
# (a) the 17 new-or-changed-this-round queries (_CHANGED_THIS_ROUND
#     below — six NEW faces, cusum threshold pinning, BM25
#     broadcast/lifecycle restructure, the index faces' fingerprint
#     lifecycle, the closure-plan consumers, the IVF centroid cache);
# (b) all 20 r06-latest queries (the at-the-limit cohort);
# (c) 16 of the 46 r07-latest queries (alphabetical) inside seat 50.
# Seats 51+: the remaining 27 r07-latest queries — they ride a wider
# sweep or LEAD the r11 window (tests/test_rotation_guard.py now
# enforces stalest-first mechanically: no query outside the window
# may be staler than a non-changed query inside it).

# queries whose values/oracles/plans changed — or that are NEW — in
# the CURRENT round: they head _PRIORITY regardless of staleness (the
# driver row is the proof the change preserved values; a new query has
# no row at all) and the rotation guard exempts them from the
# stalest-first ordering check. REWRITE EACH ROUND.
_CHANGED_THIS_ROUND = [
    # new this round (never driver-checked)
    "dq_encoding_anomalies",
    "train_padding_waste",
    "dedup_exact_index_delta",
    "events_daily_jsd_drift",
    "mm_binary_dedup_groups",
    "train_dedup_impact_by_source",
    "events_cusum_changepoints",
    "text_bm25_topk",
    "text_bm25_index_topk",
    "dedup_minhash_index_delta_pairs",
    "dedup_embedding_index_delta_pairs",
    "dedup_substring_index_delta_spans",
    "train_corpus_build_funnel",
    "dedup_minhash_clusters",
    "dedup_minhash_apply_keepers",
    "dedup_semantic_apply_keepers",
    "sim_ivf_topk",
]

_PRIORITY = _CHANGED_THIS_ROUND + [
    # (b) r06-latest (alphabetical)
    "reshape_explode_outer_shingles",
    "reshape_month_spine_gap_fill",
    "reshape_unpivot_part_metrics",
    "rollup_acctbal_by_region_nation",
    "scalar_string_date_math",
    "sess_debounce_10s",
    "sess_range_self_join_5m",
    "sim_label_centroids",
    "subq_correlated_scalar_max_item",
    "subq_exists_high_value_customers",
    "subq_not_in_inactive_parts",
    "subq_scalar_above_avg_orders",
    "text_rolling_fingerprints",
    "top10_orders_by_price",
    "window_first_last_value",
    "window_range_frame_value_band",
    "window_rank_family",
    "window_running_revenue",
    "window_sliding_3row_avg",
    "window_top3_orders_per_customer",
    # (c) r07-latest fill to seat 50 (alphabetical)
    "agg_boolean_family",
    "agg_filtered_conditional",
    "agg_histogram_quantity",
    "agg_min_by_max_by",
    "agg_mode_by_group",
    "agg_string_concat_ordered",
    "clean_quality_rules",
    "clean_repetition_ratio",
    "clean_scrub_pii",
    "clean_sentence_dedup",
    "clean_sentence_split",
    "cube_orders_status_priority",
    "dedup_embedding_near_pairs",
    "dedup_exact_stats",
    "dedup_keep_first_by_prefix",
    "dedup_ngram_jaccard_pairs",
    "distinct_order_priorities",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    # seats 51+: remaining r07-latest (alphabetical) — r11 leads
    "mm_decode_features",
    "mm_frame_sample_hashes",
    "ref_a3_duration_format",
    "ref_a4_run_metrics",
    "ref_dt1_epoch_roundtrip",
    "ref_e1_token_intersection",
    "ref_f1_timestamp_folders",
    "ref_f2_any_timestamp",
    "ref_f3_marker_rows",
    "ref_f4_f5_f6_job_filters",
    "ref_f7_ingest_file_set",
    "ref_f8_temporal_filter",
    "ref_folder_lifecycle_summary",
    "ref_manifest_integrity_join",
    "ref_o1_oldest_ingest",
    "ref_p1_p2_path_segments",
    "ref_p6_json_props",
    "ref_p7_array_struct_probe",
    "ref_s2_manifest_gate",
    "sess_asof_last_signup",
    "sess_session_window_30m",
    "set_except_inactive_custkeys",
    "set_intersect_active_custkeys",
    "set_union_all_keys",
    "sim_embedding_norms",
    "window_lag_order_gap_days",
    "window_trailing_1h_count",
]


def load_all() -> None:
    """Import every query module exactly once, populating the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(f"poormans_kube_etl_spark.queries.{mod}")
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    _loaded = True


# Queries with a fully-green driver row (rows+schema+hash, or
# deterministic rows-only) from CORRECTNESS_r01/r02. If the driver's
# sweep extends past the priority window, never-checked queries should
# be reached BEFORE re-checking these.
_R01_GREEN = frozenset(
    {
        "join_semi_customers_with_orders",
        "join_anti_customers_without_orders",
        "window_lag_order_gap_days",
        "cube_orders_status_priority",
        "set_intersect_active_custkeys",
        "set_except_inactive_custkeys",
        "set_union_all_keys",
        "distinct_order_priorities",
        "ref_p1_p2_path_segments",
        "ref_f1_timestamp_folders",
        "ref_f2_any_timestamp",
        "ref_f3_marker_rows",
        "ref_o1_oldest_ingest",
        "ref_f7_ingest_file_set",
        "ref_s2_manifest_gate",
        "ref_f4_f5_f6_job_filters",
        "ref_e1_token_intersection",
        "ref_a3_duration_format",
        "ref_a4_run_metrics",
        "ref_p6_json_props",
        "ref_p7_array_struct_probe",
        "ref_f8_temporal_filter",
        "ref_dt1_epoch_roundtrip",
        "ref_manifest_integrity_join",
        "ref_folder_lifecycle_summary",
        "text_token_stats",
        "text_term_frequencies",
        "text_lang_stats",
        "text_quality_scores",
        "text_langid_heuristic",
        "text_fingerprints",
        "text_langid_confusion",
        "dedup_exact_stats",
        "dedup_keep_first_by_prefix",
        "dedup_ngram_jaccard_pairs",
        "dedup_minhash_lsh_pairs",
        "dedup_minhash_clusters",
        "dedup_simhash_pairs",
        "dedup_embedding_near_pairs",
        "sim_topk_bruteforce",
        "sim_embedding_norms",
    }
)

# CORRECTNESS_r02 green rows (48 of 50 checked; the 2 then-errors were
# re-swept green in r04).
_R02_GREEN = frozenset(
    {
        "q1_pricing_summary",
        "join_revenue_by_nation",
        "join_lineitem_part_supplier",
        "top10_orders_by_price",
        "window_top3_orders_per_customer",
        "window_running_revenue",
        "rollup_acctbal_by_region_nation",
        "scalar_string_date_math",
        "sim_label_centroids",
        "sess_tumbling_hourly",
        "sess_session_window_30m",
        "sess_asof_last_signup",
        "sess_range_self_join_5m",
        "sess_hopping_2h_1h",
        "sess_debounce_10s",
        "mm_binary_stats",
        "mm_props_typed",
        "mm_frame_sample_plan",
        "join_left_customer_order_stats",
        "join_full_outer_nation_balance",
        "groupingsets_order_revenue",
        "pivot_status_revenue_by_priority",
        "agg_filtered_conditional",
        "agg_min_by_max_by",
        "percentile_quantity_by_flag",
        "stats_price_quantity_corr",
        "agg_mode_by_group",
        "agg_histogram_quantity",
        "stats_regression_by_type",
        "fn_null_semantics",
        "join_relational_division",
        "events_hourly_seasonality",
        "fn_json_construct_extract",
        "fn_string_suite",
        "fn_datetime_suite",
        "agg_boolean_family",
        "subq_scalar_above_avg_orders",
        "subq_correlated_scalar_max_item",
        "subq_exists_high_value_customers",
        "window_sliding_3row_avg",
        "window_rank_family",
        "window_first_last_value",
        "agg_string_concat_ordered",
        "train_bpe_ish_token_counts",
        "train_split_by_hash",
        "clean_scrub_pii",
        "orders_pareto_revenue_share",
        "dq_null_and_blank_rates",
    }
)

# CORRECTNESS_r03 green rows (hash-green; the 12 no_oracle rows-only
# queries keep their class and are not listed here).
_R03_GREEN = frozenset(
    {
        "array_agg_statuses_per_priority",
        "fn_array_suite",
        "dedup_winnowing_pairs",
        "mm_resize_dims",
        "fn_scalar_suite",
        "fn_variant_props",
        "fn_map_entries",
        "fn_conditional_suite",
        "fn_array_set_ops",
        "subq_not_in_inactive_parts",
        "window_range_frame_value_band",
        "window_trailing_1h_count",
        "train_chunk_documents",
        "train_stratified_sample",
        "train_deterministic_shuffle",
        "train_decontaminate_ngram",
        "train_pack_shards",
        "reshape_unpivot_part_metrics",
        "reshape_month_spine_gap_fill",
        "reshape_explode_outer_shingles",
        "clean_sentence_split",
        "clean_sentence_dedup",
        "clean_quantize_embeddings",
        "clean_repetition_ratio",
        "clean_quality_rules",
        "text_rolling_fingerprints",
        "text_tfidf_top_terms",
        "text_bigram_pmi",
        "events_zscore_outliers",
        "events_funnel_conversion",
        "events_transition_matrix",
        "events_cohort_retention",
        "dq_referential_integrity",
        "dq_value_range_violations",
        "sim_topk_bruteforce",
        "join_lineitem_part_supplier",
        "join_relational_division",
        "sess_range_self_join_5m",
    }
)

# CORRECTNESS_r04 sweep (50 rows: 45 hash-green + the 5 by-design
# rows-only queries). For ordering, "has a current row" is what counts;
# the class (hash vs rows-only) is the driver's concern.
_R04_SWEPT = frozenset(
    {
        "cube_orders_status_priority",
        "dedup_embedding_lsh_pairs",
        "dedup_embedding_near_pairs",
        "dedup_exact_stats",
        "dedup_keep_first_by_prefix",
        "dedup_minhash_clusters",
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard_pairs",
        "dedup_simhash_pairs",
        "distinct_order_priorities",
        "join_anti_customers_without_orders",
        "join_semi_customers_with_orders",
        "mm_decode_features",
        "mm_frame_sample_hashes",
        "ref_a3_duration_format",
        "ref_a4_run_metrics",
        "ref_dt1_epoch_roundtrip",
        "ref_e1_token_intersection",
        "ref_f1_timestamp_folders",
        "ref_f2_any_timestamp",
        "ref_f3_marker_rows",
        "ref_f4_f5_f6_job_filters",
        "ref_f7_ingest_file_set",
        "ref_f8_temporal_filter",
        "ref_folder_lifecycle_summary",
        "ref_manifest_integrity_join",
        "ref_o1_oldest_ingest",
        "ref_p1_p2_path_segments",
        "ref_p6_json_props",
        "ref_p7_array_struct_probe",
        "ref_s2_manifest_gate",
        "sess_asof_last_signup",
        "sess_session_window_30m",
        "set_except_inactive_custkeys",
        "set_intersect_active_custkeys",
        "set_union_all_keys",
        "sim_embedding_norms",
        "sim_ivf_topk",
        "sim_kmeans_clusters",
        "sim_label_spectral_stats",
        "sim_lsh_topk",
        "sim_topk_bruteforce",
        "text_fingerprints",
        "text_lang_stats",
        "text_langid_confusion",
        "text_langid_heuristic",
        "text_quality_scores",
        "text_term_frequencies",
        "text_token_stats",
        "window_lag_order_gap_days",
    }
)

# CORRECTNESS_r05 sweep (50 rows: 47 hash-green + the 3 by-design
# rows-only queries — zero errors).
_R05_SWEPT = frozenset(
    {
        "agg_boolean_family",
        "agg_filtered_conditional",
        "agg_histogram_quantity",
        "agg_min_by_max_by",
        "agg_mode_by_group",
        "agg_string_concat_ordered",
        "clean_quality_rules",
        "clean_repetition_ratio",
        "clean_scrub_pii",
        "clean_sentence_dedup",
        "clean_sentence_split",
        "dedup_embedding_lsh_pairs",
        "dedup_embedding_near_pairs",
        "dedup_minhash_clusters",
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard_pairs",
        "dedup_simhash_pairs",
        "dedup_winnowing_pairs",
        "dq_null_and_blank_rates",
        "events_hourly_seasonality",
        "fn_datetime_suite",
        "fn_json_construct_extract",
        "groupingsets_order_revenue",
        "join_left_customer_order_stats",
        "join_lineitem_part_supplier",
        "join_revenue_by_nation",
        "q1_pricing_summary",
        "sess_hopping_2h_1h",
        "sess_tumbling_hourly",
        "sim_ivf_topk",
        "sim_kmeans_clusters",
        "sim_lsh_topk",
        "sim_topk_bruteforce",
        "text_bigram_pmi",
        "text_lang_stats",
        "text_langid_confusion",
        "text_langid_heuristic",
        "text_quality_scores",
        "text_rolling_fingerprints",
        "text_term_frequencies",
        "text_tfidf_top_terms",
        "text_token_stats",
        "train_bpe_ish_token_counts",
        "train_chunk_documents",
        "train_decontaminate_ngram",
        "train_deterministic_shuffle",
        "train_pack_shards",
        "train_split_by_hash",
        "train_stratified_sample",
        # text_fingerprints was also r05-green; folded into
        # text_rolling_fingerprints in r6 (registry swap) — omitted here
        # because _LATEST_ROW only orders REGISTERED names
    }
)

# CORRECTNESS_r06: all 50 swept rows (48 hash-green + the 2 sketch
# rows-only entries).
_R06_SWEPT = frozenset(
    {
        "approx_distinct_users_by_type",
        "approx_percentile_quantity",
        "array_agg_statuses_per_priority",
        "clean_quantize_embeddings",
        "dq_referential_integrity",
        "dq_value_range_violations",
        "events_cohort_retention",
        "events_funnel_conversion",
        "events_transition_matrix",
        "events_zscore_outliers",
        "fn_array_set_ops",
        "fn_array_suite",
        "fn_conditional_suite",
        "fn_map_entries",
        "fn_null_semantics",
        "fn_scalar_suite",
        "fn_string_suite",
        "fn_variant_props",
        "join_full_outer_nation_balance",
        "join_relational_division",
        "jsonl_quarantine_stats",
        "mm_binary_stats",
        "mm_frame_sample_plan",
        "mm_props_typed",
        "mm_resize_dims",
        "orders_pareto_revenue_share",
        "percentile_quantity_by_flag",
        "pivot_status_revenue_by_priority",
        "reshape_explode_outer_shingles",
        "reshape_month_spine_gap_fill",
        "reshape_unpivot_part_metrics",
        "rollup_acctbal_by_region_nation",
        "scalar_string_date_math",
        "sess_debounce_10s",
        "sess_range_self_join_5m",
        "sim_label_centroids",
        "stats_price_quantity_corr",
        "stats_regression_by_type",
        "subq_correlated_scalar_max_item",
        "subq_exists_high_value_customers",
        "subq_not_in_inactive_parts",
        "subq_scalar_above_avg_orders",
        "text_rolling_fingerprints",
        "top10_orders_by_price",
        "window_first_last_value",
        "window_range_frame_value_band",
        "window_rank_family",
        "window_running_revenue",
        "window_sliding_3row_avg",
        "window_top3_orders_per_customer",
    }
)

# CORRECTNESS_r07 swept rows (46 hash-green + 4 rows-only, 0 errors).
_R07_SWEPT = frozenset(
    {
        "agg_boolean_family",
        "agg_filtered_conditional",
        "agg_histogram_quantity",
        "agg_min_by_max_by",
        "agg_mode_by_group",
        "agg_string_concat_ordered",
        "clean_quality_rules",
        "clean_repetition_ratio",
        "clean_scrub_pii",
        "clean_sentence_dedup",
        "clean_sentence_split",
        "cube_orders_status_priority",
        "dedup_embedding_lsh_pairs",
        "dedup_embedding_near_pairs",
        "dedup_exact_stats",
        "dedup_keep_first_by_prefix",
        "dedup_minhash_clusters",
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard_pairs",
        "distinct_order_priorities",
        "join_anti_customers_without_orders",
        "join_semi_customers_with_orders",
        "mm_decode_features",
        "mm_frame_sample_hashes",
        "ref_a3_duration_format",
        "ref_a4_run_metrics",
        "ref_dt1_epoch_roundtrip",
        "ref_e1_token_intersection",
        "ref_f1_timestamp_folders",
        "ref_f2_any_timestamp",
        "ref_f3_marker_rows",
        "ref_f4_f5_f6_job_filters",
        "ref_f7_ingest_file_set",
        "ref_f8_temporal_filter",
        "ref_folder_lifecycle_summary",
        "ref_manifest_integrity_join",
        "ref_o1_oldest_ingest",
        "ref_p1_p2_path_segments",
        "ref_p6_json_props",
        "ref_p7_array_struct_probe",
        "ref_s2_manifest_gate",
        "sess_asof_last_signup",
        "sess_session_window_30m",
        "set_except_inactive_custkeys",
        "set_intersect_active_custkeys",
        "set_union_all_keys",
        "sim_embedding_norms",
        "sim_label_spectral_stats",
        "window_lag_order_gap_days",
        "window_trailing_1h_count",
    }
)

# name -> round of its LATEST driver row (later sets win); unknown
# names (newly added queries) default to 0 = never checked.
# CORRECTNESS_r08: all 50 swept rows (48 hash-green + the 2 sketch
# rows-only entries, since upgraded to certificates in r9).
_R08_SWEPT = frozenset(
    {
        "approx_distinct_users_by_type",
        "approx_percentile_quantity",
        "array_agg_statuses_per_priority",
        "clean_quantize_embeddings",
        "dedup_minhash_apply_keepers",
        "dedup_minhash_clusters",
        "dedup_minhash_incremental_pairs",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash_pairs",
        "dedup_winnowing_pairs",
        "dq_null_and_blank_rates",
        "dq_referential_integrity",
        "dq_value_range_violations",
        "events_cohort_retention",
        "events_funnel_conversion",
        "events_hourly_seasonality",
        "events_transition_matrix",
        "events_zscore_outliers",
        "fn_array_set_ops",
        "fn_datetime_suite",
        "fn_json_construct_extract",
        "groupingsets_order_revenue",
        "join_left_customer_order_stats",
        "join_lineitem_part_supplier",
        "join_revenue_by_nation",
        "q1_pricing_summary",
        "sess_hopping_2h_1h",
        "sess_tumbling_hourly",
        "sim_ivf_topk",
        "sim_kmeans_clusters",
        "sim_lsh_topk",
        "sim_topk_bruteforce",
        "text_bigram_pmi",
        "text_lang_stats",
        "text_langid_confusion",
        "text_langid_heuristic",
        "text_quality_scores",
        "text_term_frequencies",
        "text_tfidf_top_terms",
        "text_token_stats",
        "text_unigram_logprob_scores",
        "train_bpe_ish_token_counts",
        "train_cdc_chunk_documents",
        "train_chunk_documents",
        "train_corpus_build_funnel",
        "train_decontaminate_ngram",
        "train_deterministic_shuffle",
        "train_pack_shards",
        "train_split_by_hash",
        "train_stratified_sample",
    }
)


_R09_SWEPT = frozenset(
    {
        "approx_distinct_users_by_type",
        "approx_percentile_quantity",
        "clean_winsorize_lengths",
        "dedup_containment_pairs",
        "dedup_embedding_index_delta_pairs",
        "dedup_embedding_lsh_pairs",
        "dedup_lsh_recall_report",
        "dedup_minhash_incremental_pairs",
        "dedup_minhash_index_delta_pairs",
        "dedup_semantic_apply_keepers",
        "dedup_semantic_kmeans_pairs",
        "dedup_substring_incremental_spans",
        "dedup_substring_index_delta_spans",
        "dedup_substring_spans",
        "dq_mad_doc_length_outliers",
        "events_cusum_changepoints",
        "events_markov_stationary",
        "fn_array_suite",
        "fn_conditional_suite",
        "fn_map_entries",
        "fn_null_semantics",
        "fn_scalar_suite",
        "fn_string_suite",
        "fn_variant_props",
        "join_full_outer_nation_balance",
        "join_relational_division",
        "jsonl_quarantine_stats",
        "mm_binary_stats",
        "mm_frame_sample_plan",
        "mm_props_typed",
        "mm_resize_dims",
        "orders_pareto_revenue_share",
        "percentile_quantity_by_flag",
        "pivot_status_revenue_by_priority",
        "sim_ivf_topk",
        "sim_label_spectral_stats",
        "stats_price_quantity_corr",
        "stats_regression_by_type",
        "text_bigram_pmi",
        "text_bm25_index_topk",
        "text_bm25_topk",
        "text_kwic_snippets",
        "text_ngram_novelty",
        "text_oov_rate_topk_vocab",
        "text_source_overlap_matrix",
        "text_zipf_slope",
        "train_corpus_build_funnel",
        "train_domain_mixture_sample",
        "train_scrub_duplicate_spans",
        "window_gaps_islands_user_streaks",
    }
)


_LATEST_ROW: dict[str, int] = {}
for _rnd, _names in enumerate(
    (_R01_GREEN, _R02_GREEN, _R03_GREEN, _R04_SWEPT, _R05_SWEPT, _R06_SWEPT, _R07_SWEPT, _R08_SWEPT, _R09_SWEPT),
    start=1,
):
    for _n in _names:
        _LATEST_ROW[_n] = _rnd


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    rest = [n for n in mapping if n not in head]
    # stalest-first: never-driver-checked, then oldest latest-row round;
    # registration order breaks ties (sorted() is stable)
    tail = sorted(rest, key=lambda n: _LATEST_ROW.get(n, 0))
    return {**head, **{n: mapping[n] for n in tail}}


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)
