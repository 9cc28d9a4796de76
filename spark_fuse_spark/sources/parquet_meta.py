"""``fuse-parquet-meta``: a parquet-footer statistics Python Data Source.

Surfaces the row-group / column-chunk metadata that scan planning runs
on — num_values, null counts, min/max stats, compressed/uncompressed
sizes, codec — WITHOUT reading any data pages.  This is the audit tool
behind every layout decision in ``operators/layout.py`` and
``operators/bucketing.py``: whether a filter CAN prune row groups
(are min/max ranges disjoint under the intended sort?), whether files
are balanced, what compression actually achieves per column.

Scale shape: one input partition per FILE; each task opens only the
footer (a few KB at the file tail) via pyarrow, so auditing a
million-file lake costs a million footer reads fanned out across the
cluster — no data-page I/O, no driver-side loop.

Differential contract: the output aligns column-for-column with
DuckDB's ``parquet_metadata()`` table function; the parity test
compares both engines' view of the identical footers.

Usage::

    from spark_fuse_spark.sources.parquet_meta import register
    register(spark)
    meta = (spark.read.format("fuse-parquet-meta")
            .option("path", "/data/lake/table").load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["ParquetMetaDataSource", "register", "FORMAT_NAME"]

FORMAT_NAME = "fuse-parquet-meta"

_SCHEMA = StructType(
    [
        StructField("file_name", StringType()),
        StructField("row_group_id", IntegerType()),
        StructField("row_group_num_rows", LongType()),
        StructField("path_in_schema", StringType()),
        StructField("num_values", LongType()),
        StructField("null_count", LongType()),
        StructField("min_value", StringType()),
        StructField("max_value", StringType()),
        StructField("compressed_bytes", LongType()),
        StructField("uncompressed_bytes", LongType()),
        StructField("codec", StringType()),
    ]
)


def register(spark: SparkSession) -> None:
    """Idempotently register the ``fuse-parquet-meta`` format."""
    spark.dataSource.register(ParquetMetaDataSource)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _stat_str(v) -> "str | None":
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class _MetaReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("fuse-parquet-meta requires option 'path'")
        self.path = path
        self.suffix = options.get("suffix", ".parquet")

    def partitions(self) -> "list[InputPartition]":
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(self.suffix)
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no {self.suffix} files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(partition.path).metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                stats = col.statistics
                has_mm = stats is not None and stats.has_min_max
                yield (
                    partition.path,
                    rg,
                    group.num_rows,
                    col.path_in_schema,
                    col.num_values,
                    (
                        stats.null_count
                        if stats is not None and stats.has_null_count
                        else None
                    ),
                    _stat_str(stats.min) if has_mm else None,
                    _stat_str(stats.max) if has_mm else None,
                    col.total_compressed_size,
                    col.total_uncompressed_size,
                    col.compression,
                )


class ParquetMetaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> _MetaReader:
        return _MetaReader(dict(self.options))
