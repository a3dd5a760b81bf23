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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salt``
    shuffle partitions.

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
