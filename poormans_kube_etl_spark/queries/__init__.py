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


# Tail staleness ordering is derived from the RECORDED driver sweeps
# (CORRECTNESS_r*.json at the repo root) — r10 retired nine rounds of
# hand-maintained per-round frozensets: the files are the ground truth
# the rotation guard (tests/test_rotation_guard.py) already reads, and
# a new round's results order the next session automatically with no
# registry edit. A green row is ``err is null and rows_match``
# (hash_match may be absent for historical rows-only checks).


def _latest_green_rows() -> dict[str, int]:
    import glob
    import json
    import os
    import re as _re

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                rows = json.load(fh)
        except Exception:
            continue  # a torn/partial file must not break query listing
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("err") is None and row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


_LATEST_ROW: dict[str, int] = _latest_green_rows()


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
