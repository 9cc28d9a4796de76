"""Change tracking (SCD Type 1 / Type 2) write protocols.

Re-expresses the reference's Delta-backed change tracking
(``/root/reference/src/spark_fuse/utils/change_tracking.py``) Spark-first:

* the hash recipe, null-safe key matching, dedup-keep-latest, and
  intra-batch sequencing semantics are preserved exactly;
* storage goes through a small :class:`~spark_fuse_spark.cdc.store.TableStore`
  seam — Delta ``MERGE`` when delta-spark is importable, otherwise a
  parquet staged-swap rewrite (correct, atomic-per-table; on a real
  cluster you run the Delta backend and the merge becomes a file-pruned
  ``MERGE INTO``);
* the fluent accessor is explicit (``change_tracking_writer(df)``), not
  monkey-patched onto DataFrame at import time (reference
  ``change_tracking.py:165-191`` patches classes as an import side effect).
"""

from spark_fuse_spark.cdc.deletes import (
    mor_append,
    mor_compact,
    mor_delete,
    mor_migrate_legacy_deletes,
    mor_read,
    mor_stats,
    mor_upsert,
    mor_write,
)
from spark_fuse_spark.cdc.diff import (
    apply_changelog,
    incremental_agg_merge,
    incremental_join_merge,
    snapshot_diff,
)
from spark_fuse_spark.cdc.scd import (
    ChangeTrackingMode,
    apply_change_tracking,
    change_tracking_writer,
    current_only_upsert,
    track_history_upsert,
)
from spark_fuse_spark.cdc.store import ParquetStore, TableStore, get_store
from spark_fuse_spark.cdc.versioned import VersionedParquetStore

__all__ = [
    "mor_append",
    "mor_compact",
    "mor_delete",
    "mor_migrate_legacy_deletes",
    "mor_read",
    "mor_stats",
    "mor_upsert",
    "mor_write",
    "ChangeTrackingMode",
    "snapshot_diff",
    "incremental_agg_merge",
    "incremental_join_merge",
    "VersionedParquetStore",
    "apply_changelog",
    "apply_change_tracking",
    "change_tracking_writer",
    "current_only_upsert",
    "track_history_upsert",
    "TableStore",
    "ParquetStore",
    "get_store",
]
