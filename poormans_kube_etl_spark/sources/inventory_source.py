"""Custom Python DataSource: the landing-dir inventory as a registered
Spark source (Spark 4 Python DataSource API).

``spark.read.format("pending_inventory").option("path", landing).load()``
returns DataFrame[key, size, mtime] — the reference's S3 listObjectsV2
scan (data model D1) as a first-class source instead of a driver-side
helper, so inventory queries compose with the full DataFrame API and
the folder-selection operators run directly over it.

Partitioning: one input partition per top-level ingest folder, so a
listing of N folders scans with N-way parallelism — the layout that
matters when ``pending/`` holds thousands of folders of thousands of
keys. Executors list only their own folder (os.scandir walk; the
path is any locally-visible mount — for object stores the Hadoop-FS
listing in sources.ingest remains the production path, this source is
the pluggable-API demonstration over the same model).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

PENDING = "pending"
SCHEMA = "key string, size bigint, mtime double"


@dataclass
class FolderPartition(InputPartition):
    root: str  # absolute path of one direct child of pending/ (or a file)


class PendingInventoryReader(DataSourceReader):
    def __init__(self, options):
        self.base = options.get("path")
        if not self.base:
            raise ValueError("pending_inventory requires option 'path'")

    def partitions(self):
        # a typo'd landing path must ERROR, not read as "no pending
        # work" (r7 review): the reference's listObjectsV2 against a bad
        # bucket errors too. An existing base WITHOUT pending/ remains
        # the legitimate empty-landing case.
        if not os.path.isdir(self.base):
            raise FileNotFoundError(
                f"pending_inventory: landing path {self.base!r} does not exist"
            )
        pending = os.path.join(self.base, PENDING)
        if not os.path.isdir(pending):
            return [FolderPartition(pending)]
        return [
            FolderPartition(os.path.join(pending, name))
            for name in sorted(os.listdir(pending))
        ] or [FolderPartition(pending)]

    def read(self, partition: FolderPartition):
        root = partition.root
        if not os.path.exists(root):
            return
        base_len = len(self.base.rstrip("/")) + 1
        # the landing dir is LIVE (the orchestrator deletes folders after
        # commit), so entries can vanish between listing and stat — skip
        # them like an object-store LIST tolerates concurrent deletes
        # instead of failing the task (r7 review)
        if os.path.isfile(root):
            try:
                st = os.stat(root)
            except OSError:
                return
            yield (root[base_len:], st.st_size, st.st_mtime)
            return
        for dirpath, _dirs, files in os.walk(root):
            for name in sorted(files):
                full = os.path.join(dirpath, name)
                try:
                    st = os.stat(full)
                except OSError:
                    continue
                yield (full[base_len:], st.st_size, st.st_mtime)


class PendingInventoryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pending_inventory"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return PendingInventoryReader(self.options)


def register_inventory_source(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(PendingInventoryDataSource)
