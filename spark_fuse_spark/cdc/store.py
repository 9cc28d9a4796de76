"""Storage seam for change tracking: Delta when available, parquet otherwise.

The reference writes exclusively through Delta
(``/root/reference/src/spark_fuse/utils/change_tracking.py:223-245`` read/
append, ``:230-234`` ``DeltaTable.forPath/forName``).  This container has no
delta-spark, so the portable backend is parquet with a staged-swap full
rewrite.  Semantics are identical; the difference is purely physical:

* Delta ``MERGE`` rewrites only files containing matched keys (data
  skipping); the parquet backend rewrites the whole table.  At 100 TB you
  deploy the Delta backend (`DeltaStore` activates automatically when
  ``import delta`` succeeds); the parquet backend is the correctness
  fallback and the local test target.
* Appends are real appends in both backends (no rewrite).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableStore", "ParquetStore", "DeltaStore", "get_store"]


def _has_delta() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class TableStore:
    """Minimal table contract the SCD protocols need."""

    def exists(self, spark: SparkSession, target: str) -> bool:
        raise NotImplementedError

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame, target: str, merge_schema: bool = False) -> None:
        raise NotImplementedError

    def overwrite(self, df: DataFrame, target: str) -> None:
        raise NotImplementedError


class ParquetStore(TableStore):
    """Path-addressed parquet tables with atomic staged-swap overwrite.

    Spark cannot overwrite a path that feeds the plan being written, so
    ``overwrite`` materializes to a sibling staging dir then swaps via
    rename — readers never observe a half-written table.
    """

    def exists(self, spark: SparkSession, target: str) -> bool:
        return os.path.isdir(target) and any(
            name.endswith(".parquet") or name == "_SUCCESS" for name in os.listdir(target)
        )

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.parquet(target)

    def append(self, df: DataFrame, target: str, merge_schema: bool = False) -> None:
        df.write.mode("append").parquet(target)

    def overwrite(self, df: DataFrame, target: str) -> None:
        staged = f"{target}__staged_{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(staged)
        if os.path.isdir(target):
            retired = f"{target}__retired_{uuid.uuid4().hex[:12]}"
            os.rename(target, retired)
            os.rename(staged, target)
            shutil.rmtree(retired, ignore_errors=True)
        else:
            os.rename(staged, target)


class DeltaStore(TableStore):
    """Delta-backed tables (path or catalog name, reference heuristic:
    identifier containing ``/`` or ``:/`` is a path,
    ``change_tracking.py:218-227``)."""

    @staticmethod
    def _is_path(target: str) -> bool:
        return "/" in target or ":/" in target

    def exists(self, spark: SparkSession, target: str) -> bool:
        from delta.tables import DeltaTable

        if self._is_path(target):
            return DeltaTable.isDeltaTable(spark, target)
        return spark.catalog.tableExists(target)

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        if self._is_path(target):
            return spark.read.format("delta").load(target)
        return spark.table(target)

    def append(self, df: DataFrame, target: str, merge_schema: bool = False) -> None:
        writer = df.write.format("delta").mode("append")
        if merge_schema:
            writer = writer.option("mergeSchema", "true")
        if self._is_path(target):
            writer.save(target)
        else:
            writer.saveAsTable(target)

    def overwrite(self, df: DataFrame, target: str) -> None:
        writer = df.write.format("delta").mode("overwrite").option("overwriteSchema", "true")
        if self._is_path(target):
            writer.save(target)
        else:
            writer.saveAsTable(target)


def get_store(backend: str = "auto") -> TableStore:
    """Resolve the storage backend: ``auto`` prefers Delta when importable.

    ``versioned`` selects :class:`~spark_fuse_spark.cdc.versioned.
    VersionedParquetStore` — parquet with manifest-pointer commits, time
    travel, rollback and vacuum (the no-delta table format).
    """
    if backend == "delta" or (backend == "auto" and _has_delta()):
        return DeltaStore()
    if backend == "versioned":
        from .versioned import VersionedParquetStore

        return VersionedParquetStore()
    if backend in ("auto", "parquet"):
        return ParquetStore()
    raise ValueError(f"unknown change-tracking backend {backend!r}")
