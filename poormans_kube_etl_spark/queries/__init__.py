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

Queries without an oracle (LSH, streaming, iterative) get a rows-only
check; keep those to genuinely non-SQL-expressible ops.
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


def load_all() -> None:
    """Import every query module exactly once, populating the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(f"poormans_kube_etl_spark.queries.{mod}")
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
