"""Synthetic S3-inventory / K8s-job listings derived from ``events``.

The reference engine's primary "table" is an S3 object listing with keys
``pending/<unix_ts>/<entity>/<file>.csv.gz`` plus marker files
(``bulk.txt`` / ``incremental.txt``), ``manifest.json`` sidecars, and
noise keys (reference fixtures: src/__mocks__/s3-client.js:3-93). To
make the reference operators (SURVEY.md §2a P*/F*/O1/E*/A*) DuckDB-
oracle-checkable, we synthesize that listing DETERMINISTICALLY from the
driver's ``events`` table — the same derivation expressed twice, once
as a DataFrame builder and once as a SQL CTE, so Spark and the oracle
see byte-identical inputs.

Derivation (seeded by events.user_id / event_id / event_type):
- folder_ts  = 1538050000 + (user_id % 20) * 1000   → ~20 folders
- data file  = pending/<folder_ts>/<event_type>/part_<event_id>.csv.gz
- marker     = bulk.txt when folder_ts % 2000 == 0 else incremental.txt
- manifest   = present iff folder_ts % 4000 != 0 (some folders not ready)
- noise      = pending/.DS_Store, pending/manifest.json,
               pending/not-a-ts/file.csv.gz (the reference's bad_folders)

Job-name listing mirrors the reference's K8s jobs (neo4j/elastic ×
bulk/delta × folder, plus non-store noise jobs — helpers.spec.js:18-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from poormans_kube_etl_spark.sources import load_table

MARKER_FILES = ("bulk.txt", "incremental.txt")
STORES = ("neo4j", "elastic")

# --- SQL (oracle) side: CTE bodies reused by every reference-op oracle ---

FOLDERS_CTE = """
folders AS (
  SELECT DISTINCT CAST(1538050000 + (user_id % 20) * 1000 AS BIGINT) AS folder_ts
  FROM events
)
"""

INVENTORY_CTE = (
    FOLDERS_CTE
    + """,
inventory AS (
  SELECT 'pending/' || CAST(CAST(1538050000 + (user_id % 20) * 1000 AS BIGINT) AS VARCHAR)
         || '/' || event_type || '/part_' || CAST(event_id AS VARCHAR) || '.csv.gz' AS key
  FROM events
  UNION ALL
  SELECT 'pending/' || CAST(folder_ts AS VARCHAR) || '/'
         || CASE WHEN folder_ts % 2000 = 0 THEN 'bulk.txt' ELSE 'incremental.txt' END AS key
  FROM folders
  UNION ALL
  SELECT 'pending/' || CAST(folder_ts AS VARCHAR) || '/manifest.json' AS key
  FROM folders WHERE folder_ts % 4000 <> 0
  UNION ALL
  SELECT key FROM (VALUES ('pending/.DS_Store'),
                          ('pending/manifest.json'),
                          ('pending/not-a-ts/file.csv.gz')) noise(key)
)
"""
)

JOBS_CTE = (
    FOLDERS_CTE
    + """,
jobs AS (
  SELECT s.store || '-' || CASE WHEN f.folder_ts % 2000 = 0 THEN 'bulk' ELSE 'delta' END
         || '-' || CAST(f.folder_ts AS VARCHAR) AS name
  FROM folders f CROSS JOIN (VALUES ('neo4j'), ('elastic')) s(store)
  UNION ALL
  SELECT name FROM (VALUES ('some-other-important-job'), ('download-job')) noise(name)
)
"""
)


# --- DataFrame side ---


def _folder_ts() -> F.Column:
    return (F.lit(1538050000) + (F.col("user_id") % 20) * 1000).cast("bigint")


def folders_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(_folder_ts().alias("folder_ts")).distinct()


def inventory_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[key: string] — the synthetic S3 listing (data model D1)."""
    ev = load_table(spark, sf_dir, "events")
    files = ev.select(
        F.concat(
            F.lit("pending/"),
            _folder_ts().cast("string"),
            F.lit("/"),
            F.col("event_type"),
            F.lit("/part_"),
            F.col("event_id").cast("string"),
            F.lit(".csv.gz"),
        ).alias("key")
    )
    folders = folders_df(spark, sf_dir)
    markers = folders.select(
        F.concat(
            F.lit("pending/"),
            F.col("folder_ts").cast("string"),
            F.lit("/"),
            F.when(F.col("folder_ts") % 2000 == 0, F.lit("bulk.txt")).otherwise(
                F.lit("incremental.txt")
            ),
        ).alias("key")
    )
    manifests = folders.where(F.col("folder_ts") % 4000 != 0).select(
        F.concat(
            F.lit("pending/"), F.col("folder_ts").cast("string"), F.lit("/manifest.json")
        ).alias("key")
    )
    noise = spark.createDataFrame(
        [("pending/.DS_Store",), ("pending/manifest.json",), ("pending/not-a-ts/file.csv.gz",)],
        "key string",
    )
    return files.unionByName(markers).unionByName(manifests).unionByName(noise)


def jobs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[name: string] — the synthetic K8s job-name listing (D3)."""
    folders = folders_df(spark, sf_dir)
    stores = spark.createDataFrame([(s,) for s in STORES], "store string")
    store_jobs = folders.crossJoin(F.broadcast(stores)).select(
        F.concat(
            F.col("store"),
            F.lit("-"),
            F.when(F.col("folder_ts") % 2000 == 0, F.lit("bulk")).otherwise(F.lit("delta")),
            F.lit("-"),
            F.col("folder_ts").cast("string"),
        ).alias("name")
    )
    noise = spark.createDataFrame(
        [("some-other-important-job",), ("download-job",)], "name string"
    )
    return store_jobs.unionByName(noise)
