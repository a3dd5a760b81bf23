"""Key-based MERGE (upsert) into a parquet target — the incremental
('delta') ingest write pattern without a transactional table format.

Semantics of ``merge_into``: rows whose key exists in both sides take
the UPDATE side's values; update-only keys are inserted; target-only
keys are kept (i.e. MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT). Implementation is one full-outer join on the key + a
staging-path swap, so readers never observe a half-written target.

At 100 TB you narrow the join to the touched partitions first
(``partition_pruning`` predicate) and swap only those directories —
rewriting the whole target for a 0.1% delta is the classic smell this
helper's predicate argument exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_pruning: Column | None = None,
) -> None:
    """Upsert ``updates`` into the parquet at ``target_path`` by key."""
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs, path_exists

    if not path_exists(spark, target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    if partition_pruning is not None:
        untouched = target.where(~partition_pruning)
        target = target.where(partition_pruning)
    else:
        untouched = None

    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    # presence marker, NOT a key-null probe: the join is eqNullSafe, so
    # NULL key values are legitimate and u.key IS NOT NULL would
    # misclassify those matched rows as target-only
    u = updates.withColumn("__u_present", F.lit(1)).alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    present = F.col("u.__u_present").isNotNull()
    merged = t.join(u, cond, "full_outer").select(
        *[
            F.when(present, F.col(f"u.{k}")).otherwise(F.col(f"t.{k}")).alias(k)
            for k in keys
        ],
        *[
            # matched or insert → update side; target-only → keep
            F.when(present, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    )
    if untouched is not None:
        merged = merged.unionByName(untouched)

    # crash-safe swap (same discipline as sources.sinks.compact): the
    # original moves ASIDE first, so `target_path` always holds either
    # the old or the new dataset; rename results are checked.
    staging = target_path.rstrip("/") + "__merging"
    old = target_path.rstrip("/") + "__old"
    merged.write.mode("overwrite").parquet(staging)
    delete_path(spark, old)
    fs, dst = hadoop_fs(spark, target_path)
    _, aside = hadoop_fs(spark, old)
    _, src = hadoop_fs(spark, staging)
    # rename of a missing source returns False, so re-probe the target
    # right before the swap: if it vanished since the read (or this is a
    # bootstrap that raced past the early return), skip the aside step
    # and promote staging directly — and never leave staging behind on
    # a failed swap.
    if fs.exists(dst) and not fs.rename(dst, aside):
        delete_path(spark, staging)
        raise IOError(f"merge_into: failed to move {target_path} aside")
    if not fs.rename(src, dst):
        if fs.exists(aside):
            fs.rename(aside, dst)
        delete_path(spark, staging)
        raise IOError(f"merge_into: failed to move staging into {target_path}")
    delete_path(spark, old)
