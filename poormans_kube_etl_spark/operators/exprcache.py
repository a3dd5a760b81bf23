"""Session-scoped parse-once cache for SQL expression strings.

Extracted from operators/similarity (r5) once a second operator family
(simhash) needed it: wide generated expressions — 64-term dot chains,
64-column bit aggregates — cost a measurable ANTLR parse AND hundreds
of py4j round trips when built Column-by-Column; one parsed string per
distinct SQL is both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EXPR_CACHE: dict[str, Column] = {}
_EXPR_CACHE_CTX = None  # STRONG reference to the owning SparkContext


def cached_expr(sql: str) -> Column:
    """Parse-once cache for generated SQL strings, scoped to the
    ACTIVE SparkContext (ADVICE r03): a plain ``lru_cache`` would keep
    serving Column wrappers whose py4j expression handles die with the
    gateway, so a session restart in a long-lived process turned every
    later query build into an obscure Py4JError. The cache empties
    itself whenever the active context changes; within one context a
    single ANTLR parse still serves every build (the repeat parse was
    measurable in min-of-2 bench loops).

    The owning context is held STRONGLY and compared with ``is`` — an
    ``id()`` key without a reference lets CPython hand a new context
    the dead one's address, which would serve stale handles on exactly
    the restart path this cache exists to survive (same discipline as
    ``sources/tables._TABLE_CACHE``)."""
    global _EXPR_CACHE_CTX
    from pyspark import SparkContext

    sc = getattr(SparkContext, "_active_spark_context", None)
    if sc is not _EXPR_CACHE_CTX:
        _EXPR_CACHE.clear()
        _EXPR_CACHE_CTX = sc
    col = _EXPR_CACHE.get(sql)
    if col is None:
        col = _EXPR_CACHE[sql] = F.expr(sql)
    return col
