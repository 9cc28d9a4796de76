"""Bucketed-table utilities: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (``lineitem ⋈ orders``)
is the exchange of BOTH sides on the join key.  Hash-bucketing each table
ONCE at write time (``bucketBy(n, key)``) makes every later equi-join on
that key shuffle-free: Spark matches bucket ids pairwise, so the plan is
scan → sort-within-bucket → merge-join, with zero Exchange nodes.  One
write-time shuffle is amortized over every subsequent join/aggregation on
the key — the classic warehouse layout decision this module packages.

Rules the helpers enforce (violations silently disable co-location
otherwise):

* both sides bucketed by the SAME columns and the SAME bucket count
  (or an integer multiple, which Spark can coalesce when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on);
* bucketed tables must be saved as catalog tables (``saveAsTable``) —
  plain ``parquet(path)`` drops bucket metadata;
* grouped aggregation on a prefix of the bucket columns also skips its
  exchange.

The reference has no bucketing surface (its Delta tables rely on file
skipping only, ``utils/change_tracking.py``); this implements the
"bucketing for co-located joins" line of the scale brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "is_bucketed_like", "bucket_spec", "write_date_partitioned"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    num_buckets: int,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Save ``df`` as a bucketed (and optionally sort-ordered) catalog table.

    Sorting within buckets by the join key lets the merge-join skip its
    per-task sort as well (plan becomes scan → merge-join directly).
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    missing = [c for c in bucket_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bucket columns not in DataFrame: {missing}")
    writer = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "month",
    mode: str = "overwrite",
    format: str = "parquet",
) -> str:
    """Write ``df`` hive-partitioned by a derived date bucket of ``ts_col``.

    Adds a ``p_<granularity>`` string column (``year`` → ``"1997"``,
    ``month`` → ``"1997-03"``, ``day`` → ``"1997-03-15"``) and writes
    ``partitionBy`` on it, so time-range scans prune whole directories —
    the dominant access pattern for event/fact data at 100 TB.  Returns
    the partition column name; filter on it (or let Catalyst derive the
    filter from ``ts_col`` predicates you re-apply) to get
    ``PartitionFilters`` in the scan.
    """
    from pyspark.sql import functions as F

    fmt = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd"}.get(granularity)
    if fmt is None:
        raise ValueError("granularity must be year|month|day")
    pcol = f"p_{granularity}"
    (
        df.withColumn(pcol, F.date_format(F.col(ts_col), fmt))
        .write.format(format)
        .mode(mode)
        .partitionBy(pcol)
        .save(path)
    )
    return pcol


def bucket_spec(spark: SparkSession, table: str) -> "tuple[list[str], int] | None":
    """(bucket columns, bucket count) of a catalog table, or None."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            n = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = [c.strip(" `") for c in r.data_type.strip("[]").split(",")]
    if cols is None or n is None:
        return None
    return cols, n


def is_bucketed_like(
    spark: SparkSession,
    left: str,
    right: str,
    on: "list[tuple[str, str]] | None" = None,
) -> bool:
    """True when an equi-join of the two tables on ``on`` (pairs of
    ``(left_col, right_col)``; defaults to positional bucket columns) can
    run shuffle-free: each side is bucketed exactly by its join columns,
    with equal bucket counts or a clean multiple when bucket coalescing
    is enabled."""
    a, b = bucket_spec(spark, left), bucket_spec(spark, right)
    if a is None or b is None:
        return False
    (acols, na), (bcols, nb) = a, b
    if on is not None:
        if [p[0] for p in on] != acols or [p[1] for p in on] != bcols:
            return False
    elif len(acols) != len(bcols):
        return False
    if na == nb:
        return True
    coalesce_on = (
        spark.conf.get("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
        == "true"
    )
    return coalesce_on and (max(na, nb) % min(na, nb) == 0)
