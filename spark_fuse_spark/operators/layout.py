"""File-layout control: size-aware compaction for writes.

The small-files problem is the quiet killer of 100 TB pipelines: a
1000-task stage writing a lightly-filtered table emits 1000 shards, and
every downstream scan then pays per-file open/footer/listing costs that
dwarf the data read.  The fix is sizing the write's partition count from
the DATA VOLUME, not the task count — which needs a size estimate before
the write happens.

:func:`estimated_size_bytes` reads Catalyst's optimized-plan statistics
(`sizeInBytes`), which accounts for column pruning and filter selectivity
the same way the broadcast-join planner does — no job runs to get it.
:func:`write_compacted` turns that into ``ceil(size / target)`` output
files.  Estimates inherit Catalyst's limitations (filter selectivity is
heuristic without CBO stats); for exact control pass ``num_files``.

The reference has no layout surface; its Delta appends inherit whatever
task count produced the DataFrame (``utils/change_tracking.py:237-245``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

__all__ = ["estimated_size_bytes", "write_compacted"]

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for the DataFrame (bytes).

    Plan-time only — nothing executes.  Reflects column pruning and
    pushed filters, exactly like the auto-broadcast decision does.
    """
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    num_files: "int | None" = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> int:
    """Write ``df`` in ``ceil(estimated_size / target_file_bytes)`` files.

    Returns the file count used.  Uses ``repartition`` (round-robin, a
    shuffle) rather than ``coalesce`` so output files are evenly sized —
    ``coalesce`` would glue whole upstream partitions together and
    preserve their skew; one extra shuffle at write time is the price of
    never paying the small-files tax again on the read side.
    """
    if num_files is None:
        if target_file_bytes <= 0:
            raise ValueError("target_file_bytes must be positive")
        num_files = max(1, math.ceil(estimated_size_bytes(df) / target_file_bytes))
    if num_files <= 0:
        raise ValueError("num_files must be positive")
    df.repartition(num_files).write.format(format).mode(mode).save(path)
    return num_files
