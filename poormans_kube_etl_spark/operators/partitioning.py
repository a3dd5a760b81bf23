"""Partitioning strategies for scale: salted joins for skew, bucketed
tables for co-located (exchange-free) joins.

These are the two knobs SURVEY.md §4's physical-execution notes call
for beyond AQE's automatics: AQE's skew-join splitting handles skewed
SORT-MERGE partitions at runtime, but a hand-salted join also covers
broadcast-ineligible skewed aggregations and gives deterministic
layout; bucketing removes the per-query shuffle entirely for join keys
that are stable across a workload (the 100 TB fact⋈fact case where
every query pays the same exchange otherwise).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Measured regime bounds (SCALING.md "Measured skew crossover", r6):
# below ~tens of MB of hot partition the straggler is cheaper than the
# dim-replication tax (sf0.1: plain 0.66 s vs salted 0.74 s), so the
# planner declines. Within the salting band, size chunks so the split
# hot partition lands near ordinary-partition weight.
_SALT_MIN_HOT_BYTES = 32 << 20
_SALT_CHUNK_BYTES = 32 << 20
_SALT_MAX = 64
_AQE_SKEW_THRESHOLD_DEFAULT = 256 << 20
# Optimizer sizeInBytes (parquet-stats-derived, column-pruned) runs a
# consistent ~12.5x BELOW the WHOLE-SIDE shuffle-row bytes the regime
# thresholds are measured in (unsafe-row overhead vs encoded columnar
# estimate, linear in rows so stable across SF). Calibration from the
# r6 skew stage (SCALING.md table; 40%-hot key): left-side stats
# 1.4 / 12.7 / 127 MB at sf0.1/1/10 against HOT-partition shuffle
# sizes ~7 / ~70 / ~700 MB — hot = stats x 12.5 x 0.4 at every SF.
# The factor converts stats to whole-side shuffle bytes; the caller's
# hot_share then takes its fraction ONCE (r7 review: a 5x "stats to
# hot" factor multiplied by hot_share again double-counted the share,
# declining in the measured sf1 win band and salting in sf10's AQE
# regime). Caller-supplied hot_bytes are taken verbatim.
_SHUFFLE_PER_STATS_BYTE = 12.5


def plan_salt(
    hot_bytes: int,
    aqe_skew_threshold: int | None,
    parallelism: int,
) -> int | None:
    """Pure three-regime salt planner (SCALING.md's measured crossover,
    encoded per VERDICT r06 #4 — the same corpus-size-aware treatment
    ``plan_blocking``/``srp_banding`` got).

    ``hot_bytes`` is the estimated size of the hottest join partition;
    ``aqe_skew_threshold`` is AQE's
    ``skewedPartitionThresholdInBytes`` when skew-join handling is
    enabled, None when it is off. Returns the salt fan-out, or None for
    "don't salt":

    - hot partition below ``_SALT_MIN_HOT_BYTES``: the straggler is
      cheaper than replicating the dim — None.
    - hot partition above the AQE skew threshold (and AQE skew-join
      on): the runtime split fixes the sort-merge straggler for free
      (sf10: 10.07 s → 4.73 s plain, salting adds nothing) — None.
      Callers AQE never covers (skewed aggregations, pre-AQE shuffle
      plans) pass ``aqe_skew_threshold=None`` to keep the salt band
      open upward.
    - the gap between them (big enough to straggle, too small for
      AQE's trigger — sf1 measured 1.6× win): salt, fan-out sized so
      each chunk is ~``_SALT_CHUNK_BYTES``, clamped to
      [2, max(parallelism, _SALT_MAX)].
    """
    if hot_bytes < _SALT_MIN_HOT_BYTES:
        return None
    if aqe_skew_threshold is not None and hot_bytes > aqe_skew_threshold:
        return None
    n = math.ceil(hot_bytes / _SALT_CHUNK_BYTES)
    return max(2, min(n, max(parallelism, _SALT_MAX)))


def _auto_salt(left: DataFrame, hot_share: float, hot_bytes: int | None) -> int | None:
    """Derive the salt decision for ``salted_join(n_salt='auto')``.

    Hot-partition size comes from a caller estimate (``hot_bytes``) or
    optimizer size statistics × ``hot_share`` — plan analysis only
    (~8 ms), the same source ``spread_small_scan`` reads; a physical
    probe (``rdd.getNumPartitions``) costs ~0.9 s per build. Stats
    unavailable → None (plain join — declining to salt is always
    semantically safe)."""
    if hot_bytes is None:
        try:
            size = int(
                str(left._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
        except Exception:
            return None
        hot_bytes = _hot_bytes_from_stats(size, hot_share)
    spark = left.sparkSession
    threshold: int | None = _AQE_SKEW_THRESHOLD_DEFAULT
    try:
        # case-insensitive: Spark accepts "True"/"TRUE" for boolean confs
        if str(
            spark.conf.get("spark.sql.adaptive.enabled", "true")
        ).lower() != "true" or (
            str(
                spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
            ).lower()
            != "true"
        ):
            threshold = None
        else:
            raw = spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                None,
            )
            if raw is not None:
                threshold = _parse_bytes(raw)
    except Exception:
        pass
    return plan_salt(
        hot_bytes, threshold, spark.sparkContext.defaultParallelism
    )


def _hot_bytes_from_stats(stats_bytes: int, hot_share: float) -> int:
    """Estimated hot-partition shuffle bytes from optimizer stats."""
    return int(stats_bytes * _SHUFFLE_PER_STATS_BYTE * hot_share)


def _parse_bytes(v: str) -> int:
    """Spark byte-conf strings, both suffix spellings Spark accepts:
    '268435456', '256m', '256mb', '1g', '1gb', '512k', '64b'."""
    v = v.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
    if len(v) >= 3 and v.endswith("b") and v[-2] in units:
        return int(float(v[:-2]) * units[v[-2]])
    if v and v[-1] in units:
        return int(float(v[:-1]) * units[v[-1]])
    if v.endswith("b"):
        return int(float(v[:-1]))
    return int(v)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int | str = "auto",
    how: str = "inner",
    hot_share: float = 1.0,
    hot_bytes: int | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salt``
    shuffle partitions.

    ``n_salt='auto'`` (default since r7, VERDICT r06 #4) makes the call
    planner-driven: the measured three-regime crossover decides salt vs
    plain from the hot-partition estimate (optimizer stats ×
    ``hot_share``, or a caller-supplied ``hot_bytes``), so a small-SF
    caller can't pay the replication tax where plain wins and an
    AQE-covered caller doesn't duplicate the runtime skew split. An
    explicit integer ``n_salt`` forces salting unconditionally (the
    pre-r7 behavior).

    Left rows get a deterministic salt (xxhash64 of the whole row, mod
    n_salt) so a key carrying 30% of the table fans out across n_salt
    reducers instead of one straggler; the right side is replicated
    n_salt× (explode of a literal sequence — cheap when the right side
    is the smaller input). Result is exactly the plain join's output —
    which only holds for join types that never EMIT unmatched right
    rows: under right/full outer, each of the n_salt replicas of an
    unmatched right row would surface, multiplying it n_salt times
    (ADVICE r01). Those types are rejected; salt the other side instead.
    """
    safe = {"inner", "left", "left_outer", "left_semi", "left_anti", "cross"}
    if how.lower().replace("_", "") not in {s.replace("_", "") for s in safe}:
        raise ValueError(
            f"salted_join(how={how!r}): right-side replication breaks "
            "right/full outer semantics (unmatched right rows emitted "
            f"n_salt times); use one of {sorted(safe)} or salt the other side"
        )
    for side, frame in (("left", left), ("right", right)):
        if "_salt" in frame.columns:
            # withColumn would silently OVERWRITE it and the join would
            # equate user data with replication indices — wrong rows,
            # no error (r8 review)
            raise ValueError(
                f"salted_join: {side} side already has a '_salt' column; "
                "rename it before salting"
            )
    if n_salt == "auto":
        planned = _auto_salt(left, hot_share, hot_bytes)
        if planned is None:
            return left.join(right, on, how)
        n_salt = planned
    elif not isinstance(n_salt, int):
        raise ValueError(f"n_salt must be an int or 'auto', got {n_salt!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt)
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) external parquet table.

    Two tables bucketed by the same key into the same bucket count join
    with NO exchange (and no sort, if sortBy matches the join key) —
    the shuffle is paid once at write time and amortized over every
    downstream join/aggregation on that key."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables — plans exchange-free."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
