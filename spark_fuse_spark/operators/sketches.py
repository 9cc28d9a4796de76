"""Portable Count-Min sketch builders (batch + streaming shared core).

The Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth`` hash rows
x ``width`` counters; every key increments one counter per row, a key's
estimate is the MIN of its ``depth`` counters — always >= the true count
(one-sided error), with overcount bounded by ~2N/width at 1-e^-depth
confidence.  Cells are plain sums, so per-shard / per-day / per-batch
partials merge by cell-wise addition: the sketch is a fixed
``depth*width``-integer rollup whatever the key cardinality, which is
what replaces exact per-key counting for heavy-hitter and skew
monitoring at 100 TB.

Hashing rides :func:`~spark_fuse_spark.functions.hashing.portable_hash64`
(md5-derived), so any engine — and the DuckDB oracle — reproduces the
registers bit-for-bit.  The same expressions work on batch and streaming
DataFrames; ``streaming/ops.windowed_heavy_hitter_cms`` wraps
:func:`count_min_cells` with a watermarked event-time window, bounding
stream state at ``depth*width`` counters per open window.

Used by the ``x_count_min_sketch`` catalog query (reference-free
extension; the sketch family sibling of the portable HLL in
``catalog/graph_queries.py``) and its streaming twin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

__all__ = ["cms_bucket", "count_min_cells", "count_min_probe"]


def cms_bucket(j: Column, key: Column, width: int) -> Column:
    """Row-``j`` counter index for ``key``: portable md5 hash of
    ``"<key>#cms<j>"`` mod ``width`` (DuckDB twin:
    ``portable_hash64_sql("CAST(k AS VARCHAR) || '#cms' || j") % width`` —
    the salt convention the ``x_count_min_sketch`` oracle already pins)."""
    return F.pmod(
        portable_hash64(F.concat(key, F.lit("#cms"), j.cast("string"))),
        F.lit(width),
    )


def count_min_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    extra_group_cols: Sequence[str] = (),
) -> DataFrame:
    """(extra..., j, b, c) sketch cells — one map-side-combined groupBy
    over a ``depth``-fold row explode; output bounded at
    ``depth * width`` cells per extra-group (e.g. per event-time window).
    Works identically on batch and streaming frames (on a stream the
    groupBy becomes the stateful aggregation)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    extras = list(extra_group_cols)
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    hashed = df.select(*extras, F.col(key_col).cast("string").alias("__k"), j)
    buckets = hashed.select(
        *extras, "j", cms_bucket(F.col("j"), F.col("__k"), width).alias("b")
    )
    return buckets.groupBy(*extras, "j", "b").agg(
        F.count("*").cast("long").alias("c")
    )


def count_min_probe(
    cells: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each candidate key's count from the sketch: min over the
    ``depth`` hashed cells.  ``candidates`` rows (all columns) are
    preserved; the estimate lands in ``cms_est``.  The probe side is
    |candidates| * depth rows against the bounded cell table."""
    keep = list(candidates.columns)
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probes = candidates.select(*keep, j).withColumn(
        "b", cms_bucket(F.col("j"), F.col(key_col).cast("string"), width)
    )
    # LEFT join + coalesce(0): a never-inserted key hits empty cells and
    # must estimate 0, not silently vanish from the output
    return (
        probes.join(F.broadcast(cells.select("j", "b", "c")), ["j", "b"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )
