"""Physical-plan inspection helpers — the scale-readiness test surface.

Correctness says a query returns the right rows at sf0.01; these
helpers let tests assert the PLAN is the one that survives 100 TB:
filters pushed into the parquet scan, dimension joins broadcast, column
pruning reaching the reader, expressions inside whole-stage codegen.
Plan regressions (a broadcast silently demoting to sort-merge, a filter
stuck above the scan) then fail CI instead of surfacing as a 10× slowdown
on the cluster.

All helpers parse ``df.explain("formatted")`` output text — stable
across Spark 3.x/4.x for the node names used here.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def scan_nodes(plan: str) -> list[dict[str, str]]:
    """Per parquet scan: the table path fragment, PushedFilters and
    ReadSchema as raw strings."""
    scans = []
    # ``[^\n]*`` after 'Scan parquet' (r7 review): catalog-table scans
    # format as 'Scan parquet spark_catalog.default.<table>' — the
    # newline-anchored form never matched them, so read_columns returned
    # an empty set and pruning assertions over bucketed/saveAsTable
    # reads passed VACUOUSLY (the silent-regression class this module
    # exists to catch)
    for m in re.finditer(
        r"\(\d+\) Scan parquet([^\n]*)\n(.*?)(?=\n\(\d+\)|\Z)", plan, re.S
    ):
        body = m.group(2)
        def grab(field: str) -> str:
            fm = re.search(rf"{field}: \[?(.*?)\]?\n", body)
            return fm.group(1).strip() if fm else ""
        scans.append(
            {
                # the catalog identifier from the header line (empty for
                # path reads) — lets callers match bucketed/saveAsTable
                # scans by table name, not just path fragment
                "table": m.group(1).strip(),
                "location": grab("Location"),
                "pushed_filters": grab("PushedFilters"),
                "read_schema": grab("ReadSchema"),
            }
        )
    return scans


def has_pushed_filter(df: DataFrame, table: str, fragment: str) -> bool:
    """True if the scan of ``table`` carries ``fragment`` in PushedFilters."""
    for scan in scan_nodes(formatted_plan(df)):
        if (table in scan["location"] or table in scan["table"]) and (
            fragment in scan["pushed_filters"]
        ):
            return True
    return False


def read_columns(df: DataFrame, table: str) -> set[str]:
    """Columns the parquet reader actually materializes for ``table`` —
    the column-pruning check."""
    for scan in scan_nodes(formatted_plan(df)):
        if table in scan["location"] or table in scan["table"]:
            return set(re.findall(r"(\w+):", scan["read_schema"]))
    return set()


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", formatted_plan(df)))


def broadcast_hint_count(df: DataFrame) -> int:
    """FORCED broadcasts (F.broadcast hints) in the analyzed logical
    plan — distinct from broadcasts AQE chooses at runtime. A hint on an
    unbounded-cardinality side is an OOM at scale even when the measured
    side happens to fit at test SF. Counts BROADCAST hints only (r7
    review): a bare 'ResolvedHint' count also matched merge/
    shuffle_hash/shuffle_replicate_nl hints, so a removed broadcast
    plus an added merge hint kept the guard green."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) boundaries in the physical plan.

    Counts EVERY Exchange flavor (self-review r4): the original
    hash/range-only pattern was blind to ``Exchange SinglePartition``
    and ``Exchange RoundRobinPartitioning`` — a regression from the
    two-pass global-order operator back to a bare
    ``Window.orderBy(...)`` (the one-task 100 TB sort this test surface
    exists to catch) reported shuffle_count == 0 and sailed through the
    budgets. Broadcast exchanges are NOT shuffles and stay excluded."""
    plan = simple_plan(df)
    # \bExchange does not match inside the single token BroadcastExchange
    return len(re.findall(r"\bExchange \w+", plan)) - len(
        re.findall(r"\bExchange SinglePartition, EXECUTOR_BROADCAST", plan)
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans; fewer = wider fused pipelines.

    Simple explain marks fused operators ``*(N) HashAggregate``. Under
    AQE the codegen spans exist only in the FINAL plan, so this executes
    THIS DataFrame's plan (collect — count() would build a different
    plan and leave this one unfinalized) before reading it back. Use on
    small/aggregated results only."""
    df.collect()
    ids = set(re.findall(r"\*\((\d+)\)", simple_plan(df)))
    return len(ids)


def has_python_row_udf(df: DataFrame) -> bool:
    """True if the plan contains a row-at-a-time Python UDF eval node
    (BatchEvalPython). Arrow-batched pandas evals (ArrowEvalPython,
    MapInPandas) are the sanctioned slow path and not flagged here."""
    return "BatchEvalPython" in formatted_plan(df)
