"""Scalar helpers shared by queries and operators.

Everything here stays JVM-side (pyspark.sql.functions compositions) so
expressions fold into whole-stage codegen; no Python row UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to DECIMAL(p,s) for order-independent exact aggregation.

    Double sums are non-deterministic under different partition orders
    (and differ between Spark and DuckDB); decimals make SUMs exact and
    hash-stable on both engines.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def money(c: Column | str) -> Column:
    return dec(c, 18, 2)


def money_units(c: Column | str, scale: int = 2) -> Column:
    """Money as INTEGER 10^-scale units (cents for scale=2), bigint.

    Value-identical to ``money()``'s decimal view — the decimal cast
    happens first, so the units are the exact decimal's digits, not a
    ``round(x*100)`` over double arithmetic (which disagrees with the
    decimal cast on ~1-per-million boundary rows; measured at sf1).
    Products of unit columns stay exact in int64: unit magnitudes are
    bounded per ROW by the domain (price < 1e7 cents, rate factors
    ~1e2), so even a three-factor product is < 1e12 — per-row overflow
    is impossible at ANY corpus scale, unlike accumulator overflow.
    """
    return (dec(c, 18, scale) * F.lit(10**scale)).cast("bigint")


def exact_long_sum(u: Column, unit_scale: int) -> Column:
    """Exact, order-independent SUM of integer-unit money — the
    100 TB-safe fast path for the decimal-sum discipline.

    Why not SUM(decimal): Spark's decimal(38,_) aggregation runs on the
    128-bit path — measured 4.8 s vs 0.7 s for the same double sums on
    sf1 q1 (6 M rows, 32 threads); the decimal tax was ~two-thirds of
    the whole query. Why not SUM(bigint): a 1e-6-unit charge column
    sums past int64 around 1e8 rows × 1e11 units — ANSI fails loudly,
    but failing at scale is still failing.

    The split-sum trick: u == (u >> 20)·2^20 + (u & 0xFFFFF) exactly
    (arithmetic shift + two's-complement low bits, valid for negatives
    too), so SUM(u) == SUM(hi)·2^20 + SUM(lo) with BOTH accumulators
    far inside int64 at 100 TB: SUM(lo) ≤ N·2^20 (6e11 rows → 6e17),
    SUM(hi) ≤ N·max_units/2^20 (6e11 × 1e12/2^20 ≈ 6e17). Recombined
    in decimal(32,0) (exact), scaled by an exact decimal tick
    (multiplication, never division — engines disagree on decimal
    division result types), and emitted as DOUBLE: bit-identical to
    ``hash_safe(F.sum(money(c)))`` by construction (same exact integer
    → one nearest-rounding to double).

    DuckDB oracle twin (its SUM(bigint) is HUGEINT — already exact, no
    split needed):
    ``CAST(CAST(SUM(u) AS DECIMAL(32,0)) * CAST(0.01 AS DECIMAL(2,2))
    AS DOUBLE)`` with the tick literal matching ``unit_scale``.
    """
    hi = F.sum(F.shiftright(u, 20))
    lo = F.sum(u.bitwiseAND(F.lit((1 << 20) - 1)))
    combined = hi.cast("decimal(32,0)") * F.lit(1 << 20) + lo.cast("decimal(32,0)")
    tick = F.lit("0." + "0" * (unit_scale - 1) + "1").cast(
        f"decimal({unit_scale},{unit_scale})"
    )
    return (combined * tick).cast("double")


def oracle_money_units(col: str, scale: int = 2) -> str:
    """DuckDB twin of ``money_units``: exact integer units of a money
    column, decimal-cast first (NOT round(x*100) over doubles)."""
    return f"CAST(CAST({col} AS DECIMAL(18,{scale}))*{10**scale} AS BIGINT)"


def oracle_exact_long_sum(u_sql: str, unit_scale: int) -> str:
    """The DuckDB-side twin of ``exact_long_sum`` for oracle strings."""
    tick = "0." + "0" * (unit_scale - 1) + "1"
    return (
        f"CAST(CAST(SUM({u_sql}) AS DECIMAL(32,0)) * "
        f"CAST({tick} AS DECIMAL({unit_scale},{unit_scale})) AS DOUBLE)"
    )


def hash_safe(c: Column | str, scale: int = 2) -> Column:
    """Representation-stable final projection for decimal aggregates.

    Keep SUMs in DECIMAL while aggregating (exact, order-independent),
    but emit the FINAL column as DOUBLE: Spark returns ``Decimal('x.00')``
    for decimal columns while DuckDB fetched through pandas yields
    float64 ``x.0`` — bit-identical values, different canonical form, so
    the driver's value hash fails (CORRECTNESS_r01: 8 queries). Routing
    both sides through DECIMAL(38,scale) → DOUBLE makes the conversion
    identical: the decimal value is exact and equal on both engines, and
    decimal→double is deterministic nearest-rounding on both.

    Oracle side must mirror this as
    ``CAST(CAST(x AS DECIMAL(38,scale)) AS DOUBLE)``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(38,{scale})").cast("double")


def duration_hmm(seconds: Column) -> Column:
    """Format a duration in seconds as the reference's ``"Xh:YYmins"``.

    Parity with getJobDuration (reference src/helpers.js:65-73) including
    its mod-24 hour wrap quirk: floor(s/3600)%24 hours, floor(s/60)%60
    zero-padded minutes.
    """
    s = seconds.cast("long")
    return F.format_string(
        "%dh:%02dmins",
        (F.floor(s / 3600) % 24).cast("int"),
        (F.floor(s / 60) % 60).cast("int"),
    )


def path_segments(key: Column | str) -> Column:
    """Split an object key into path segments (reference src/helpers.js:18)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.split(col, "/")
