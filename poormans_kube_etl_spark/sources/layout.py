"""Z-order (Morton-curve) data layout for multi-column pruning.

A plain ``sortWithinPartitions(a)`` write gives parquet min/max pruning
on ``a`` only; filters on ``b`` still read every file. Interleaving the
bits of several columns into one sort key clusters rows so EVERY keyed
column has narrow per-file min/max ranges — the same layout trick
Delta/Iceberg expose as OPTIMIZE ZORDER, here as a plain column
expression + range-partitioned write (pure Spark, no table format).

All JVM-side: per-column min/max from one aggregate (a 1-row collect —
model state, same class as k-means centroids), linear scale to
``bits``-bit ints, literal-shift bit interleave inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map numeric col linearly into [0, 2^bits)."""
    top = (1 << bits) - 1
    if hi <= lo:  # constant column → everything in bucket 0
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.greatest((frac * top).cast("long"), F.lit(0)), F.lit(top)
    )


def zorder_key(scaled_cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` bits of each already-scaled column (Morton
    code). ncols × bits must fit a 63-bit long."""
    n = len(scaled_cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled_cols):
            key = key.bitwiseOR(F.shiftleft(F.getbit(c, F.lit(b)).cast("long"), b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int = 8,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write parquet clustered on the Morton key of ``zorder_cols``.

    Range-partition + sort on the key → consecutive files hold
    rectangular regions of the column space, so min/max row-group
    pruning works for filters on ANY of the keyed columns, not just a
    lexicographic prefix.

    Degenerate inputs (r7 review): an empty frame or an all-NULL /
    constant key column has no usable (min, max) span — a scheduled
    layout job over an empty upstream partition used to die on
    ``float(None)`` after paying the stats aggregate. Empty output is
    written as-is; a span-less COLUMN contributes a constant 0 to the
    Morton key (no pruning power on that column, every other column
    keeps its bits).
    """
    if "__zkey" in df.columns:
        # withColumn would silently REPLACE and then drop a real user
        # column of this name — refuse, like the JSONL reader does for
        # its internals
        raise ValueError("write_zordered: input already has a __zkey column")
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"hi_{c}") for c in zorder_cols],
    ).collect()[0]

    def _scaled_or_const(c: str) -> Column:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi is None:  # empty frame or all-NULL column
            return F.lit(0).cast("long")
        return _scaled(F.col(c), float(lo), float(hi), bits)

    scaled = [_scaled_or_const(c) for c in zorder_cols]
    key = zorder_key(scaled, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
