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
    overwrite would read and clobber the same directory)."""
    from poormans_kube_etl_spark.sources.ingest import delete_path, hadoop_fs

    staging = path.rstrip("/") + "__compacting"
    df = spark.read.parquet(path).coalesce(target_partitions)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    delete_path(spark, path)
    fs, src = hadoop_fs(spark, staging)
    _, dst = hadoop_fs(spark, path)
    fs.rename(src, dst)
