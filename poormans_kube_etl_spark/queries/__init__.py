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
# ``queries()`` iteration order, so the head of that order IS the
# re-verification policy. Since r11 the ENTIRE order is sweep-derived
# (VERDICT r10 #1 — nine rounds of hand-kept head lists kept going
# stale the moment a sweep landed): _CHANGED_THIS_ROUND pins lead
# (changed plans/oracles re-earn a driver row regardless of
# staleness, and brand-new queries have no row at all), then EVERY
# other query follows stalest-first by its latest green driver row in
# CORRECTNESS_r*.json. The rotation guard
# (tests/test_rotation_guard.py) enforces exactly this invariant, so
# it now holds by construction the moment a new sweep file lands —
# no registry edit between rounds.

# queries whose values/oracles/plans changed — or that are NEW — in
# the CURRENT round. REWRITE EACH ROUND; everything else is derived.
_CHANGED_THIS_ROUND = [
    # new in r13 (never driver-checked): the shard-balance audit over
    # the packing plan and the embedding-space pair-sample histogram
    "train_shard_balance_report",
    "sim_pairwise_distance_histogram",
    # r13 (VERDICT r12 #3): raw-text distinct re-expressed over
    # sha2(text,256) — plan AND oracle changed in lockstep
    "dedup_exact_stats",
    # r13 optimization pass: faces whose PHYSICAL PLANS were
    # restructured (values identical, locally hash-verified at
    # sf0.001 AND sf0.01) — conditional single-generator bucket
    # expansion, checkpointed signature/fixture frames, heavy-tier
    # scan spreading. They were driver-checked in r12, so
    # stalest-first alone would leave the restructured plans outside
    # the window; they re-earn a driver row instead. Kept to the
    # deepest-changed eight so the stale tail still holds the full
    # r09 cohort (head 11 + tail 39 ≥ 37).
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_lsh_pairs",
    "dedup_minhash_index_delta_pairs",
    "dedup_embedding_index_delta_pairs",
    "train_corpus_build_funnel",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
]


def load_all() -> None:
    """Import every query module exactly once, populating the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(f"poormans_kube_etl_spark.queries.{mod}")
    missing = [n for n in _CHANGED_THIS_ROUND if n not in QUERIES]
    if missing:
        raise ValueError(f"_CHANGED_THIS_ROUND names not registered: {missing}")
    _loaded = True


# Staleness ordering is derived from the RECORDED driver sweeps
# (CORRECTNESS_r*.json at the repo root) — the files are the ground
# truth the rotation guard (tests/test_rotation_guard.py) already
# reads, and a new round's results order the next session
# automatically with no registry edit. A green row is ``err is null
# and rows_match`` (hash_match may be absent for historical rows-only
# checks). An installed (site-packages) copy has no sweep records —
# ``PKE_SWEEP_RECORD_DIR`` points elsewhere, and finding ZERO files
# warns instead of silently degrading the rotation (r10 ADVICE).


def _latest_green_rows() -> dict[str, int]:
    import glob
    import json
    import os
    import re as _re
    import warnings

    record_dir = os.environ.get("PKE_SWEEP_RECORD_DIR") or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(record_dir, "CORRECTNESS_r*.json")))
    if not files:
        warnings.warn(
            f"no CORRECTNESS_r*.json under {record_dir!r} — every query "
            "reads as never-checked and the sweep rotation degrades to "
            "registration order; set PKE_SWEEP_RECORD_DIR to the sweep-"
            "record directory",
            stacklevel=2,
        )
    for f in files:
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
    head = {n: mapping[n] for n in _CHANGED_THIS_ROUND if n in mapping}
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
