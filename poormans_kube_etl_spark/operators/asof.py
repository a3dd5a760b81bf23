"""As-of (time-travel) join — Spark-native, shuffle-once.

Spark has no built-in as-of join. The scalable pattern (used by every
production timeseries stack on Spark) is union + windowed
last-non-null: tag both inputs, union them, sort within each key
partition by (ts, side) and carry the right side's payload forward with
``last(..., ignorenulls)``. One shuffle on the join keys, no range
explosion, no broadcast requirement — survives 100 TB where a naive
non-equi join (O(n·m) nested loop) does not.

Known skew limit: the window partitions by the join keys, so one
degenerate key (a bot user with 10^8 events) serializes into one task.
The standard mitigation — process per (key, time-bucket) with a
boundary carry-over of each bucket's last right-row — composes from
this same operator; salting does NOT work here because the fill needs
the key's full time order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def _payload_struct_type(right: DataFrame, payload: list[str]):
    from pyspark.sql.types import StructField, StructType

    return StructType([StructField(c, right.schema[c].dataType, True) for c in payload])


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    descending: bool,
) -> DataFrame:
    """Shared union + windowed last-non-null construction; the two
    public directions differ ONLY in the window's time sort (self-review
    r4: they were near-verbatim twins, so a fix to the shared logic had
    to be applied twice or the directions diverged).

    The payload rides as ONE struct column through a single
    ``last(ignorenulls)`` — per-column fills would (a) resurrect an older
    row's value where the as-of row legitimately carries NULL, and (b)
    mix values from different right rows across payload columns (ADVICE
    r01). The struct itself is non-null whenever a right row exists, so
    member NULLs survive intact. Right rows sort before left rows at
    equal ts (either direction) → inclusive semantics.

    NULL timestamps follow SQL comparison semantics (r7 review): a
    NULL-ts right row can satisfy neither ``<=`` nor ``>=``, so it is
    dropped before the union (it used to sort NULLS-FIRST in the
    backward direction and act as a −infinity universal match); a
    NULL-ts left row matches nothing — both sorts place NULLs first,
    ahead of every right row, so its fill sees an empty frame and
    yields NULL payload. Tied right rows at identical (keys, ts) pick
    deterministically — the window tiebreaks on a hash of the payload
    struct, so reruns and repartitionings agree (which of the tied
    rows wins is arbitrary but stable). Map-typed payload fields are
    excluded from the hash (Spark's hash expressions reject MapType);
    a payload that is ONLY maps keeps the pre-r7 partition-order pick.
    """
    keys = list(keys)
    payload = list(payload)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]

    def _hashable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    hashable_payload = [c for c in payload if _hashable(right.schema[c].dataType)]

    l = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(_payload_struct_type(right, payload)).alias(_PAYLOAD),
    )
    r = right.where(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD),
    )
    ts_order = (
        F.col(_TS).desc_nulls_first() if descending else F.col(_TS).asc_nulls_first()
    )
    order_cols = [ts_order, F.col(_SIDE).asc()]
    if hashable_payload:
        order_cols.append(
            F.xxhash64(F.struct(*[F.col(f"{_PAYLOAD}.{c}") for c in hashable_payload])).asc()
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *keys,
        _TS,
        _SIDE,
        *lcols,
        F.last(_PAYLOAD, ignorenulls=True).over(w).alias(_PAYLOAD),
    )
    return filled.where(F.col(_SIDE) == 1).select(
        *keys,
        F.col(_TS).alias(left_ts),
        *lcols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row with
    right.ts <= left.ts on the same keys (backward as-of, inclusive).
    Returns the left rows + ``payload`` columns (null when no prior
    right row exists); payload names must not collide with left's."""
    return _asof_join(left, right, keys, left_ts, right_ts, payload, descending=False)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the payload of the EARLIEST right row
    with right.ts >= left.ts (forward as-of, inclusive) — the same
    construction with the time sort mirrored."""
    return _asof_join(left, right, keys, left_ts, right_ts, payload, descending=True)
