"""Key-based MERGE (upsert) into a parquet target — the incremental
('delta') ingest write pattern without a transactional table format.

Semantics of ``merge_into``: rows whose key exists in both sides take
the UPDATE side's values; update-only keys are inserted; target-only
keys are kept (i.e. MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT). Implementation is one full-outer join on the key + a
staging-path swap, so readers never observe a half-written target.

At 100 TB you never rewrite the whole table for a 0.1% delta. Two
narrowing levers, strongest first:

- ``partition_cols`` (hive-partitioned targets): the merge reads ONLY
  the partitions the delta touches (real ``PartitionFilters`` pruning,
  driven by the delta's own distinct partition values) and swaps ONLY
  those partition directories — untouched partitions' files are never
  read, rewritten, or moved (byte-identical across the merge).
  Restriction: a key's partition value must be stable between target
  and delta (the standard contract for partition-scoped merges; a key
  that moves partitions would leave its old row behind).
- ``partition_pruning`` (unpartitioned layouts): a predicate that
  narrows the join to the touched key-range; the swap still replaces
  the whole directory, but the join work scales with the delta.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _merge_frames(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MATCHED-update / NOT-MATCHED-insert / target-only-keep via one
    full-outer join on the key."""
    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    # presence marker, NOT a key-null probe: the join is eqNullSafe, so
    # NULL key values are legitimate and u.key IS NOT NULL would
    # misclassify those matched rows as target-only
    u = updates.withColumn("__u_present", F.lit(1)).alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    present = F.col("u.__u_present").isNotNull()
    return t.join(u, cond, "full_outer").select(
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


def _swap_dir(spark: SparkSession, fs, src, dst, aside) -> None:
    """Promote ``src`` into ``dst`` with the move-ASIDE-first discipline:
    ``dst`` always holds either the old or the new data, and a failed
    promote rolls the old data back."""
    # rename of a missing source returns False, so re-probe the target
    # right before the swap: if it is absent (bootstrap / new partition),
    # skip the aside step and promote directly — and never leave staging
    # behind on a failed swap.
    if fs.exists(dst) and not fs.rename(dst, aside):
        raise IOError(f"merge_into: failed to move {dst} aside")
    if not fs.rename(src, dst):
        if fs.exists(aside):
            fs.rename(aside, dst)
        raise IOError(f"merge_into: failed to move staging into {dst}")
    if fs.exists(aside):
        fs.delete(aside, True)


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_pruning: Column | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """Upsert ``updates`` into the parquet at ``target_path`` by key."""
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs, path_exists

    if partition_cols:
        _merge_into_partitioned(spark, target_path, updates, keys, partition_cols)
        return

    if not path_exists(spark, target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    if partition_pruning is not None:
        untouched = target.where(~partition_pruning)
        target = target.where(partition_pruning)
    else:
        untouched = None

    merged = _merge_frames(target, updates, keys)
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
    try:
        _swap_dir(spark, fs, src, dst, aside)
    except IOError:
        delete_path(spark, staging)
        raise


def _merge_into_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
) -> None:
    """Partition-scoped merge for a hive-partitioned parquet target.

    1. The delta's DISTINCT partition values (driver-tiny: a delta
       touches few partitions by definition) become an ``isin`` filter —
       the target scan plans real ``PartitionFilters``, reading only the
       touched directories.
    2. The merge output is written to staging partitioned the same way.
    3. ONLY the touched partition directories are swapped (aside-first,
       per directory); untouched directories are never read or moved,
       so their files stay byte-identical.
    """
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs, path_exists

    if not path_exists(spark, target_path):
        updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(target_path)
        return

    touched = [tuple(r) for r in updates.select(*partition_cols).distinct().collect()]
    if not touched:
        return

    target = spark.read.parquet(target_path)
    pred = None
    for combo in touched:
        combo_pred = None
        for c, v in zip(partition_cols, combo):
            term = F.col(c).eqNullSafe(F.lit(v))
            combo_pred = term if combo_pred is None else combo_pred & term
        pred = combo_pred if pred is None else pred | combo_pred
    merged = _merge_frames(target.where(pred), updates, keys)

    staging = target_path.rstrip("/") + "__merging"
    merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)

    fs, _root = hadoop_fs(spark, target_path)
    for combo in touched:
        # hive dir encoding: NULL partition values write as
        # __HIVE_DEFAULT_PARTITION__ — a str(None) dir name would miss
        # the staging dir and silently drop that partition's delta
        rel = "/".join(
            f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
            for c, v in zip(partition_cols, combo)
        )
        _, src = hadoop_fs(spark, f"{staging.rstrip('/')}/{rel}")
        _, dst = hadoop_fs(spark, f"{target_path.rstrip('/')}/{rel}")
        _, aside = hadoop_fs(spark, f"{target_path.rstrip('/')}/{rel}__old")
        if not fs.exists(src):
            # Every touched combo has >= 1 update row, so merged always
            # writes this directory — absence means the dir-name encoding
            # above disagrees with Spark's hive escaping (e.g. special
            # characters in a string partition value). Silent skip would
            # drop the partition's delta; fail loudly instead.
            delete_path(spark, staging)
            raise ValueError(
                f"merge_into: staging dir for partition {rel!r} missing — "
                "partition value needs hive escaping this helper doesn't "
                "implement; use plain ascii partition values"
            )
        fs.mkdirs(dst.getParent())  # nested new combos need the parent dir
        try:
            _swap_dir(spark, fs, src, dst, aside)
        except IOError:
            delete_path(spark, staging)
            raise
    delete_path(spark, staging)
