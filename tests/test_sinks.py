"""Partitioned-writer tests: directory layout, file-size caps,
partition pruning on read-back, and compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from poormans_kube_etl_spark.plans.inspect import formatted_plan
from poormans_kube_etl_spark.sources.sinks import compact, write_partitioned


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(0, 1000).select(
        (F.col("id") % 4).alias("bucket"), F.col("id").alias("v")
    )
    write_partitioned(df, out, ["bucket"], max_records_per_file=100)
    # hive-style dirs
    assert sorted(os.path.basename(p) for p in glob.glob(f"{out}/bucket=*")) == [
        "bucket=0",
        "bucket=1",
        "bucket=2",
        "bucket=3",
    ]
    # file cap: 250 rows per partition / 100 → ≥3 files each
    for b in range(4):
        files = glob.glob(f"{out}/bucket={b}/*.parquet")
        assert len(files) >= 3
    # partition pruning visible in the scan
    back = spark.read.parquet(out).where(F.col("bucket") == 2)
    assert back.count() == 250
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_compaction_reduces_files(spark, tmp_path):
    out = str(tmp_path / "c")
    df = spark.range(0, 400).select((F.col("id") % 2).alias("p"), F.col("id").alias("v"))
    write_partitioned(df, out, ["p"], max_records_per_file=20)
    before = len(glob.glob(f"{out}/p=*/*.parquet"))
    assert before >= 10
    compact(spark, out, target_partitions=1, partition_cols=["p"])
    after = len(glob.glob(f"{out}/p=*/*.parquet"))
    assert after == 2  # one file per partition dir
    assert spark.read.parquet(out).count() == 400
