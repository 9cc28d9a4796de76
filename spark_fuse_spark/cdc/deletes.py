"""Deletion vectors: merge-on-read key deletes for parquet targets.

The public lakehouse MOR pattern (Delta Lake deletion vectors, Iceberg
equality-delete files): a DELETE appends a small keys-only sidecar
instead of rewriting data files, readers subtract the union of delete
keys with an anti-join, and a later COMPACT folds the deletes into one
rewrite.  This makes deletes O(deleted keys) instead of O(table) — the
difference between a GDPR erasure request costing seconds and costing a
100 TB rewrite.  The reference's change tracking only upserts
(`/root/reference/src/spark_fuse/utils/change_tracking.py` has no delete
path); this module extends the CDC family with the delete half of the
lifecycle on the same portable parquet substrate (`cdc/store.py`).

Layout under ``target/``::

    data/                 base parquet segments (append-only between compactions)
    _deletes/d-<uuid>/    one keys-only parquet dir per delete batch

Scale shape: ``mor_read`` is base LEFT ANTI JOIN (union of delete keys).
Delete sidecars are tiny next to the base, so Spark broadcasts them and
the anti-join costs one base scan with zero base shuffle; if an
accumulation of deletes ever outgrows the broadcast threshold that is
exactly the signal to ``mor_compact``.  Compaction reuses the
staged-swap rename so readers never observe a half-written base.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "mor_write",
    "mor_delete",
    "mor_read",
    "mor_compact",
    "mor_stats",
]

_DATA = "data"
_DELETES = "_deletes"


def _data_path(target: str) -> str:
    return os.path.join(target, _DATA)


def _delete_dirs(target: str) -> "list[str]":
    root = os.path.join(target, _DELETES)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("d-")
    )


def mor_write(df: DataFrame, target: str) -> None:
    """Create/overwrite the base table (clears any delete sidecars)."""
    df.write.mode("overwrite").parquet(_data_path(target))
    root = os.path.join(target, _DELETES)
    if os.path.isdir(root):
        shutil.rmtree(root)


def mor_delete(keys: DataFrame, target: str, key_cols: "list[str]") -> str:
    """Append one keys-only delete sidecar; returns its path.

    O(|keys|): nothing in ``data/`` is touched.  Re-deleting keys that are
    already deleted (or never existed) is harmless — the anti-join is
    idempotent on the key set.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    path = os.path.join(target, _DELETES, f"d-{uuid.uuid4().hex[:12]}")
    keys.select(*key_cols).distinct().write.mode("errorifexists").parquet(path)
    return path


def mor_read(spark: SparkSession, target: str, key_cols: "list[str]") -> DataFrame:
    """The live view: base minus the union of all delete-key sidecars."""
    base = spark.read.parquet(_data_path(target))
    dirs = _delete_dirs(target)
    if not dirs:
        return base
    dels = spark.read.parquet(*dirs).select(*key_cols).distinct()
    # sidecars are small by construction; broadcast makes the MOR view a
    # single base scan with no base shuffle
    return base.join(F.broadcast(dels), key_cols, "left_anti")


def mor_compact(spark: SparkSession, target: str, key_cols: "list[str]") -> int:
    """Fold delete sidecars into one base rewrite (staged swap); returns
    the number of sidecars folded.  Readers switch atomically at the
    rename — same protocol as ``cdc/store.ParquetStore.overwrite``."""
    dirs = _delete_dirs(target)
    if not dirs:
        return 0
    data = _data_path(target)
    staged = f"{data}__staged_{uuid.uuid4().hex[:12]}"
    mor_read(spark, target, key_cols).write.mode("overwrite").parquet(staged)
    retired = f"{data}__retired_{uuid.uuid4().hex[:12]}"
    os.rename(data, retired)
    os.rename(staged, data)
    shutil.rmtree(retired)
    shutil.rmtree(os.path.join(target, _DELETES))
    return len(dirs)


def mor_stats(spark: SparkSession, target: str, key_cols: "list[str]") -> dict:
    """Audit panel: base rows, distinct delete keys, live rows, sidecars."""
    base = spark.read.parquet(_data_path(target)).count()
    dirs = _delete_dirs(target)
    deleted = (
        spark.read.parquet(*dirs).select(*key_cols).distinct().count() if dirs else 0
    )
    live = mor_read(spark, target, key_cols).count()
    return {
        "base_rows": base,
        "delete_keys": deleted,
        "live_rows": live,
        "delete_files": len(dirs),
    }
