"""Local DuckDB-oracle harness mirroring the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB (tables pre-registered as views), then compares row-count +
schema + order-insensitive value-hash. This module reproduces that
comparison locally (strictly: exact values after canonicalization) so
every query is validated at sf0.001/sf0.01 before the driver ever sees it.
"""

from __future__ import annotations

import atexit
import datetime
import decimal
import math
import os
from collections import OrderedDict
from dataclasses import dataclass, field

import pandas as pd

from poormans_kube_etl_spark import TABLES


def _present_tables(sf_dir: str) -> tuple[str, ...]:
    return tuple(
        t for t in TABLES if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    )


def duckdb_connection(sf_dir: str):
    """Connection with one view per table parquet PRESENT in sf_dir.

    DuckDB binds CREATE VIEW eagerly (it resolves the parquet at
    creation, not first query), so registering all 10 names against a
    partial sf_dir — e.g. a fixture dir holding only ``documents`` —
    raises at connect time. Registering only what exists keeps partial
    dirs usable; the cache key below makes a later-created table visible.
    """
    import duckdb

    con = duckdb.connect()
    for t in _present_tables(sf_dir):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# per-sf_dir connection cache (r7 review): the parametrized oracle suite
# paid a fresh connection + 10 CREATE VIEWs per query for identical
# state. Views re-read the parquet at query time, so a rewritten table
# is never served stale through a cached connection. Keyed on
# (sf_dir, tables-present) so a table parquet created AFTER the first
# run_oracle call (replica generation mid-process) gets a fresh
# connection instead of a missing-view error (ADVICE r7); evicted LRU,
# one connection at a time, and all closed at interpreter exit.
_CON_CACHE: OrderedDict[tuple, object] = OrderedDict()
_CON_CACHE_MAX = 8


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    key = (sf_dir, _present_tables(sf_dir))
    con = _CON_CACHE.get(key)
    if con is None:
        while len(_CON_CACHE) >= _CON_CACHE_MAX:
            _, old = _CON_CACHE.popitem(last=False)
            old.close()
        con = _CON_CACHE[key] = duckdb_connection(sf_dir)
    else:
        _CON_CACHE.move_to_end(key)
    return con.execute(sql).fetch_df()


@atexit.register
def _close_cached_connections() -> None:
    for c in _CON_CACHE.values():
        c.close()
    _CON_CACHE.clear()


def _canon_value(v) -> str:
    """Canonicalize one cell to a comparable string.

    Strictness mirrors the driver's value hash (VERDICT r01 "what's
    wrong" #3): a ``Decimal('138014.00')`` must NOT compare equal to
    float64 ``138014.0`` — Spark decimal columns vs DuckDB decimals
    fetched through pandas differ exactly this way, so queries must
    emit representation-stable types (DOUBLE/BIGINT finals; see
    functions.hash_safe). Floats canonicalize via repr (bit-exact);
    Decimals keep their scale (trailing zeros significant).

    Signed zeros are DISTINGUISHED (repr(-0.0) != repr(0.0)) on
    purpose: Spark's BigDecimal-backed round() returns +0.0 where
    DuckDB's round() preserves -0.0, so any rounded output whose series
    crosses zero must add +0.0 after rounding on BOTH sides (IEEE
    -0.0 + 0.0 = +0.0; see events_cusum_changepoints) — masking the
    sign here would hide a divergence the driver's hash may well see.

    Every canonical form carries a coarse TYPE TAG (r7 review): the
    untyped forms let str '3' collide with int 3, 'True' with bool
    True, and 'NULL' with SQL NULL — so a CAST-to-string drift between
    the Spark query and its oracle passed the gate it exists to fail.
    Tags are coarse (one int family, one float family) so the benign
    int32-vs-int64 pandas dtype difference stays invisible. NaT
    canonicalizes as NULL like None (it used to take the Timestamp
    branch and read 'NaT').
    """
    if v is None or v is pd.NaT:
        return "NULL"
    # bool BEFORE int: Python bool subclasses int
    if isinstance(v, bool):
        return "b:" + str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return "t:" + ts.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, bytes):
        return "y:" + v.hex()
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        # The DRIVER's canonicalizer dies on these (pandas sort_values →
        # "unhashable type: 'numpy.ndarray'", CORRECTNESS_r02). Failing
        # here keeps the local gate exactly as strict: oracle-checked
        # finals must be serialized (array_join / array_to_string).
        raise TypeError(
            "array/map-typed final cell is not driver-hashable; "
            "serialize it (array_join on Spark, array_to_string on DuckDB)"
        )
    if isinstance(v, int):
        return "i:" + str(v)
    # numpy scalars
    item = getattr(v, "item", None)
    if item is not None:
        return _canon_value(v.item())
    return "s:" + str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell canonicalized, rows sorted.

    Canonicalization is PER COLUMN (self-review r4): ``iterrows`` builds
    a per-row Series whose dtype is the common upcast of the row — an
    all-numeric frame with mixed int64/float64 columns upcast every int
    cell to float64, so an int-vs-double schema drift between Spark and
    the oracle canonicalized identically and the driver-strict type
    distinction this module exists for was silently lost (confirmed by
    repro). ``Series.tolist()`` per column preserves each column's own
    cell types."""
    if len(set(df.columns)) != len(df.columns):
        # df[c] on a duplicated name returns a DataFrame (no .tolist())
        # — fail with the actual problem, not an AttributeError (r7)
        dups = sorted({c for c in df.columns if list(df.columns).count(c) > 1})
        raise ValueError(f"duplicate result column name(s): {dups}")
    cols = sorted(df.columns)
    col_values = [df[c].tolist() for c in cols]
    out = [
        tuple(_canon_value(col_values[j][i]) for j in range(len(cols)))
        for i in range(len(df))
    ]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count: tuple[int, int]
    columns_spark: list[str] = field(default_factory=list)
    columns_oracle: list[str] = field(default_factory=list)
    mismatches: list[str] = field(default_factory=list)

    def message(self) -> str:
        if self.ok:
            return f"{self.name}: OK rows={self.row_count[0]}"
        lines = [
            f"{self.name}: MISMATCH spark_rows={self.row_count[0]} oracle_rows={self.row_count[1]}",
            f"  spark cols:  {self.columns_spark}",
            f"  oracle cols: {self.columns_oracle}",
        ]
        lines.extend(f"  {m}" for m in self.mismatches[:12])
        return "\n".join(lines)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(
        name=name,
        ok=True,
        row_count=(len(spark_pdf), len(oracle_pdf)),
        columns_spark=sorted(spark_pdf.columns),
        columns_oracle=sorted(oracle_pdf.columns),
    )
    if res.columns_spark != res.columns_oracle:
        res.ok = False
        res.mismatches.append("column names differ")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.mismatches.append("row counts differ")
    s_rows = canon_rows(spark_pdf)
    o_rows = canon_rows(oracle_pdf)
    if s_rows != o_rows:
        res.ok = False
        shown = 0
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                res.mismatches.append(f"row {i}: spark={a} oracle={b}")
                shown += 1
                if shown >= 8:
                    break
        if len(s_rows) != len(o_rows):
            res.mismatches.append(f"extra rows: spark={len(s_rows)} oracle={len(o_rows)}")
    return res


def check_query(spark, name: str, sf_dir: str) -> CompareResult:
    """Run one registered query against its oracle and compare."""
    from poormans_kube_etl_spark.queries import all_oracles, all_queries

    q = all_queries()[name]
    sql = all_oracles().get(name)
    sdf = q(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        # rows-only check, like the driver's weak path — but a ZERO-row
        # result is a tripwire, not a pass (r7 review): every rows-only
        # query is non-empty on the test corpora, so an inverted filter
        # regressing the output to empty used to stay green here
        ok = len(spark_pdf) > 0
        res = CompareResult(name=name, ok=ok, row_count=(len(spark_pdf), -1))
        if not ok:
            res.mismatches.append("rows-only query returned ZERO rows")
        return res
    oracle_pdf = run_oracle(sql, sf_dir)
    return compare_frames(name, spark_pdf, oracle_pdf)
