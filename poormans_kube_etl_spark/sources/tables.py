"""Parquet table loaders for the driver-provided star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet per table under
``{sf_dir}/{name}.parquet``.

Scans stay fully declarative so Catalyst keeps predicate pushdown,
column pruning, and partition pruning; never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from poormans_kube_etl_spark import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can use them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
