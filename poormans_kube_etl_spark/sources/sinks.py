"""Output sinks with file-size discipline.

At 100 TB the writer is as much of a design surface as the reader:
partition columns drive downstream partition PRUNING, and file counts
drive both metadata pressure (too many small files) and parallelism
(too few giant files). These helpers make both knobs explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet: one directory per partition-col
    value, files capped at ``max_records_per_file`` rows so a hot
    partition splits instead of producing one unsplittable giant file.
    Readers filtering on the partition columns prune directories before
    any I/O (PartitionFilters in the scan)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Small-file compaction: read back, coalesce to ``target_partitions``
    output tasks, overwrite in place via a staging path swap (a straight
    overwrite would read and clobber the same directory).

    Swap order is crash-safe (ADVICE r01): the original is renamed ASIDE
    first, then staging renamed into place, then the old copy deleted —
    so at every instant either the old or the new dataset exists at
    ``path`` (the previous delete-then-rename order had a window with
    NO data at ``path``). A crash between the two renames leaves the
    data only at the hidden aside; the next compact HEALS that state
    before reading (r7 review — same ``_heal_aside`` discipline as
    ``merge_into``, which recovered this automatically while compact
    left the dataset offline for a human). Each rename's boolean result
    is checked — HDFS-style FileSystem.rename reports failure by
    returning false, not by raising — including the failure-path
    restore, whose error names where the data actually is.

    Staging/aside names use the same reserved dot-prefixed sibling
    namespace as ``operators/upsert.py`` (``/w/t`` → ``/w/.t.tag``):
    dot-hidden from Hadoop/Spark listings, and impossible to collide
    with a user dataset whose name merely ends in a suffix like
    ``__old`` — the old naming would have DELETED such a sibling as
    presumed debris."""
    from poormans_kube_etl_spark.operators.upsert import _heal_aside, _hidden_sibling
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs

    staging = _hidden_sibling(path, ".__compact_staging")
    old = _hidden_sibling(path, ".__compact_aside")
    fs, cur = hadoop_fs(spark, path)
    _, aside = hadoop_fs(spark, old)
    # heal a prior compact's crash window BEFORE the read: aside present
    # with `path` missing means the dataset lives only at the hidden
    # aside — the read would fail and every rerun stayed wedged; aside
    # present WITH `path` is stale debris and is cleared
    _heal_aside(fs, cur, aside)
    df = spark.read.parquet(path).coalesce(target_partitions)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    _, stg = hadoop_fs(spark, staging)
    if not fs.rename(cur, aside):
        raise IOError(f"compact: failed to move {path} aside to {old}")
    if not fs.rename(stg, cur):
        # checked restore: if this ALSO fails, the error must point the
        # operator at the aside holding the data, not at the staging move
        if not fs.rename(aside, cur):
            raise IOError(
                "compact: promote AND restore failed — the dataset is at "
                f"{old}, not {path}; the next compact will heal it if the "
                "cause was transient"
            )
        raise IOError(f"compact: failed to move staging {staging} into {path}")
    delete_path(spark, old)
