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

__all__ = ["estimated_size_bytes", "write_compacted", "zorder_value", "write_zordered"]

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


def zorder_value(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    bounds: "dict[str, tuple[float, float]] | None" = None,
):
    """Z-order (Morton) key column for multi-column data skipping.

    Each column is min/max-scaled into a ``bits``-bit integer (one tiny
    stats aggregate, broadcast as literals), then the per-column bits are
    interleaved into a single long — rows close in Z-value are close in
    EVERY clustered column, so sorting files by Z-value gives narrow
    per-file min/max ranges on all of them at once (the Delta/Iceberg
    ``OPTIMIZE ZORDER`` layout, expressed as a plain Catalyst column).

    Returns ``(df_with_stats_applied, zcol)`` where ``zcol`` is the
    Column expression; NULLs scale to bucket 0.  ``len(cols) * bits``
    must fit in 63 bits.

    ``bounds`` ({col: (min, max)}) skips the stats pass — pass it when
    the ranges are already known (catalog/table stats, fixed domains)
    so no job runs before the write; otherwise one single-row min/max
    aggregate executes here (same cost class as the broadcast planner's
    size estimate).
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("cols must be non-empty")
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit in a long (<= 63)")
    if bounds is not None:
        missing = set(cols) - set(bounds)
        if missing:
            raise ValueError(
                f"bounds missing clustered columns {sorted(missing)} — "
                "supply every column or omit bounds to compute stats"
            )
        stats = {f"__mn_{c}": float(bounds[c][0]) for c in cols}
        stats.update({f"__mx_{c}": float(bounds[c][1]) for c in cols})
    else:
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
        ).first()
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        scaled = F.floor(
            (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
            / F.lit(span)
            * top
        )
        buckets.append(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)))
    # interleave: output bit (bit*len + i) takes bit `bit` of column i
    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b.cast("long"), bit).bitwiseAND(F.lit(1)),
                bit * n + i,
            )
    return df, z.alias("__zvalue")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    num_files: int,
    bits: int = 16,
    bounds: "dict[str, tuple[float, float]] | None" = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` clustered by Z-value over ``cols``: range-partition on
    the interleaved key, sort within partitions, drop the helper column.
    ``bounds`` is forwarded to :func:`zorder_value` so known column
    ranges skip the pre-write stats job.

    Effect on the read side: parquet row-group/file min-max stats become
    selective for EVERY column in ``cols`` (a plain sort helps only its
    leading column), so predicate-pushdown skips files for any of them.
    """
    from pyspark.sql import functions as F

    df2, z = zorder_value(df, cols, bits=bits, bounds=bounds)
    (
        df2.withColumn("__zvalue", z)
        .repartitionByRange(num_files, F.col("__zvalue"))
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue")
        .write.format(format)
        .mode(mode)
        .save(path)
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    shard_col: str = "shard_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic training-shard assignment: ``portable_hash64(id) %
    num_shards``.

    Hash-sharding is the global shuffle a training pipeline needs before
    writing example shards: it decorrelates neighboring source rows
    (crawl order, domain runs) without a corpus-wide sort, is stable
    across re-runs/partitionings/engines (re-producible shard
    membership), and composes with ``df.write.partitionBy(shard_col)``
    or ``repartition(num_shards, shard_col)`` for the physical write.
    ``salt`` re-deals the assignment for a new epoch without touching
    the id space.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import portable_hash64

    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    h = portable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return df.withColumn(shard_col, (h % num_shards).cast("int"))


def shard_manifest(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    weight_col: "str | None" = None,
    salt: str = "",
) -> DataFrame:
    """Pre-write shard balance audit: per-shard row/weight totals plus
    each shard's share of the total load and its skew vs the ideal
    ``1/num_shards``.

    One hash-partial aggregate over one scan; the share/skew pass runs
    over the ``num_shards``-row manifest (driver-scale), so checking
    balance costs one job regardless of corpus size.  A skew ratio near
    1.0 certifies the id space hashes evenly — the go/no-go before
    committing a multi-hour sharded write.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    assigned = assign_shards(df, id_col, num_shards, salt=salt)
    weight = F.col(weight_col) if weight_col else F.lit(1)
    per = assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(weight.cast("long")).alias("total_weight"),
    )
    w = Window.partitionBy()
    return per.select(
        "shard_id",
        "n_rows",
        "total_weight",
        F.round(F.col("total_weight") / F.sum("total_weight").over(w), 6).alias(
            "load_share"
        ),
        F.round(
            F.col("total_weight") * num_shards / F.sum("total_weight").over(w), 4
        ).alias("skew_ratio"),
    ).orderBy("shard_id")


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    salt: str = "",
    format: str = "parquet",
) -> None:
    """Materialize the :func:`assign_shards` layout: one directory per
    shard (``shard_id=N/``), one file per shard.

    ``repartition(num_shards, shard_col)`` aligns task boundaries with
    shard boundaries BEFORE the write, so ``partitionBy`` emits exactly
    one file per shard instead of (tasks × shards) small files — the
    difference between 16 files and 16 × 1000 files on a wide cluster.
    Readers then consume whole shards (`.../shard_id=3/`) with
    partition pruning, and the deterministic hash membership means a
    re-run reproduces byte-identical shard contents.
    """
    from pyspark.sql import functions as F

    assigned = assign_shards(df, id_col, num_shards, salt=salt)
    (
        assigned.repartition(num_shards, F.col("shard_id"))
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(format)
        .save(path)
    )
