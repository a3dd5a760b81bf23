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
