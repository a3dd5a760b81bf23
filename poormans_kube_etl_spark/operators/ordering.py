"""Scalable global ordering: rank / running-sum over a TOTAL order
without the single-partition window funnel.

``row_number().over(Window.orderBy(...))`` — no partitionBy — plans as
``Exchange SinglePartition``: every row of the input flows through ONE
task. Fine at test SF, fatal at 100 TB (a 1.5B-row global rank is a
one-task sort). The scalable shape is the classic two-pass prefix sum:

1. ``repartitionByRange`` on the order columns — Spark samples the key
   space and builds balanced ranges (a parallel range-partitioned sort,
   the same machinery as a distributed ORDER BY);
2. rank/cumsum WITHIN each range partition (window keyed by
   ``spark_partition_id()`` — parallelism = #partitions);
3. per-partition row counts / value sums — #partitions rows, driver-
   tiny — get prefix offsets via a window over that tiny frame, and
   broadcast-join the offsets back: global = offset + local.

Total-order requirement: ``order_by`` must be a KEY (no ties), both for
rank determinism and because range partitioning may split equal keys
across partition boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ord_pid"
_LOCAL = "__ord_local"


def with_global_order(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "pos",
    cumsum: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a global 1-based ``rank_col`` (and optional exact running
    sums ``{value_col: cumsum_col}``) under the total order ``order_by``.

    Equivalent to ``row_number()/sum().over(Window.orderBy(*order_by))``
    but with no single-partition exchange; the only serial step is a
    window over one row per partition.
    """
    cumsum = dict(cumsum or {})
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # Both consumers below (the local window and the per-partition
    # stats) must observe IDENTICAL range-partition boundaries. Relying
    # on exchange reuse for that is fragile: RangePartitioner samples
    # with an rdd.id-derived seed, so if the two plan branches fail to
    # canonicalize to one exchange (or reuse is disabled), each branch
    # could sample different bounds and the prefix offsets would be
    # silently wrong. A lazy localCheckpoint pins ONE materialization —
    # both branches read the same cached RDD, partition ids frozen.
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "*",
        F.row_number().over(w_local).alias(f"{_LOCAL}_rn"),
        *[
            F.sum(vcol).over(w_local).alias(f"{_LOCAL}_{vcol}")
            for vcol in cumsum
        ],
    )
    # per-partition totals → prefix offsets (tiny frame: n rows).
    # Per value column the NON-NULL count rides along (r7 review): SQL
    # running sums are NULL only until the first non-null value — the
    # bare offset+local form returned NULL for any row whose LOCAL
    # prefix was all-NULL even when prior partitions had values,
    # diverging from the naive Window.orderBy equivalence the docstring
    # promises.
    stats = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(vcol).alias(f"__sum_{vcol}") for vcol in cumsum],
        *[F.count(vcol).alias(f"__nn_{vcol}") for vcol in cumsum],
    )
    w_prefix = (
        Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = stats.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_prefix), F.lit(0)).alias("__cnt_off"),
        *[
            F.coalesce(F.sum(f"__sum_{vcol}").over(w_prefix), F.lit(0)).alias(
                f"__off_{vcol}"
            )
            for vcol in cumsum
        ],
        *[
            F.coalesce(F.sum(f"__nn_{vcol}").over(w_prefix), F.lit(0)).alias(
                f"__nnoff_{vcol}"
            )
            for vcol in cumsum
        ],
    )
    out = local.join(F.broadcast(offsets), _PID)
    out = out.withColumn(
        rank_col, (F.col("__cnt_off") + F.col(f"{_LOCAL}_rn")).cast("bigint")
    )
    for vcol, ccol in cumsum.items():
        local_sum = F.col(f"{_LOCAL}_{vcol}")
        # NULL iff no non-null value exists anywhere before this row —
        # exactly the naive running sum's three-valued behavior
        out = out.withColumn(
            ccol,
            F.when(
                local_sum.isNull() & (F.col(f"__nnoff_{vcol}") == 0),
                F.lit(None),
            ).otherwise(
                F.coalesce(local_sum, F.lit(0)) + F.col(f"__off_{vcol}")
            ),
        )
    drop = [_PID, "__cnt_off", f"{_LOCAL}_rn"]
    drop += [f"__off_{v}" for v in cumsum] + [f"{_LOCAL}_{v}" for v in cumsum]
    drop += [f"__nnoff_{v}" for v in cumsum]
    return out.drop(*drop)
