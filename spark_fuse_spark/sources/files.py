"""``fuse-files``: a file-manifest Python Data Source.

Lists a directory tree as a DataFrame — one row per file with path,
name, extension, size, and mtime — the manifest that drives ingest
orchestration (what arrived since the last run), small-files audits
(feed ``operators/layout.py`` compaction decisions), and quarantine
sweeps, without a driver-side ``os.walk`` materializing millions of
paths in one process.

Scale shape: each IMMEDIATE SUBDIRECTORY of the root becomes one input
partition (files sitting directly in the root get one extra partition),
so executors walk subtrees in parallel and the listing of a
hive-partitioned lake (``dt=2024-01-01/…``) fans out naturally.  The
same pattern extends to object stores by swapping the walker for a
prefix-delimited LIST call.

Options:

* ``root`` (required) — directory to list;
* ``suffix`` — keep only files ending with this suffix (e.g. ``.parquet``);
* ``recursive`` — walk subtrees (default true; false lists one level).

Usage::

    from spark_fuse_spark.sources.files import register
    register(spark)
    manifest = spark.read.format("fuse-files").option("root", "/data/lake").load()
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["FilesDataSource", "register", "FORMAT_NAME"]

FORMAT_NAME = "fuse-files"

_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("name", StringType()),
        StructField("ext", StringType()),
        StructField("size", LongType()),
        StructField("mtime", TimestampType()),
        StructField("depth", IntegerType()),
    ]
)


def register(spark: SparkSession) -> None:
    """Idempotently register the ``fuse-files`` format on this session."""
    spark.dataSource.register(FilesDataSource)


@dataclass
class _SubtreePartition(InputPartition):
    base: str
    recursive: bool


def _row(root: str, path: str):
    st = os.stat(path)
    name = os.path.basename(path)
    _, dot, ext = name.rpartition(".")
    depth = os.path.relpath(path, root).count(os.sep)
    return (
        path,
        name,
        ext.lower() if dot else "",
        int(st.st_size),
        datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None),
        int(depth),
    )


class _FilesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("root")
        if not self.root:
            raise ValueError("fuse-files requires the 'root' option")
        self.root = os.path.abspath(self.root)
        if not os.path.isdir(self.root):
            raise ValueError(f"fuse-files root is not a directory: {self.root!r}")
        self.suffix = options.get("suffix") or ""
        self.recursive = str(options.get("recursive", "true")).lower() != "false"

    def partitions(self) -> "list[_SubtreePartition]":
        # one partition per immediate subdirectory + one for root-level files;
        # the driver lists ONE level only — subtree walks happen on executors
        parts = [_SubtreePartition(self.root, False)]
        if self.recursive:
            for entry in sorted(os.scandir(self.root), key=lambda e: e.name):
                if entry.is_dir(follow_symlinks=False):
                    parts.append(_SubtreePartition(entry.path, True))
        return parts

    def read(self, partition: _SubtreePartition) -> Iterator[tuple]:
        if partition.recursive:
            for dirpath, _dirnames, filenames in os.walk(partition.base):
                for fn in sorted(filenames):
                    if self.suffix and not fn.endswith(self.suffix):
                        continue
                    yield _row(self.root, os.path.join(dirpath, fn))
        else:
            for entry in sorted(os.scandir(partition.base), key=lambda e: e.name):
                if entry.is_file(follow_symlinks=False):
                    if self.suffix and not entry.name.endswith(self.suffix):
                        continue
                    yield _row(self.root, entry.path)


class FilesDataSource(DataSource):
    """File-manifest source: ``spark.read.format("fuse-files")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FilesReader(dict(self.options))
