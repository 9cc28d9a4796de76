"""Token-budget sequence packing for training-data pipelines.

LLM pre-training consumes documents as a CONCATENATED token stream
chopped into fixed-length context windows ("packing").  Assigning each
document its window span requires a GLOBAL running token offset — the
textbook scale trap, because the naive
``sum().over(Window.orderBy(...))`` plans a single-partition window
(every row through one task).  :func:`with_prefix_sum` implements the
classic two-phase distributed prefix sum instead:

1. range-partition by the order column (so partition *i* holds a
   contiguous, ascending key range);
2. per-partition running sums (parallel windows, partitioned by the
   materialized partition id);
3. per-partition totals → a cumulative offset per partition (a window
   over *num_partitions* rows — bounded, not data-sized) broadcast-
   joined back.

The result is identical to the global-window answer for any unique
order key, at two bounded shuffles instead of a single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_prefix_sum",
    "with_prefix_sums",
    "with_prefix_max",
    "with_prev_value",
    "pack_sequences",
]


def _ranged_with_pid(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """Range-partition ``df`` by ``order_col`` and FREEZE the partition
    assignment (``localCheckpoint``).

    The pid column feeds two plan branches (the per-partition running
    window and the per-partition totals).  Without materialization each
    branch recomputes the exchange independently, and
    ``repartitionByRange``'s sampled boundaries are only deterministic
    for a deterministic input ROW ORDER — an upstream hash aggregate can
    legally iterate in a different order per recomputation, moving the
    sampled range boundaries so the two branches disagree on which rows
    partition *i* holds.  Offsets keyed by a pid from one assignment then
    join rows labeled by the other, silently corrupting the prefix
    (observed: cumulative counts short by a partition-boundary's worth of
    rows on an AQE-coalesced single-partition aggregate input).
    Checkpointing pins ONE assignment for every consumer — and truncates
    lineage, so the range exchange runs exactly once.
    """
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    return ranged.localCheckpoint()


def with_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col``
    order (i.e. sum of all strictly-earlier rows).

    ``order_col`` must be unique (it is the total order).  Output adds
    ``out_col``; row order is not guaranteed — sort downstream if
    needed.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(df, order_col, n)
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(local_w), F.lit(0))
    )
    # per-partition totals: num_partitions rows — the only single-task
    # window in the plan runs over this bounded set, never the data
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__total"))
    offset_w = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__total").over(offset_w), F.lit(0))
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )


def with_prefix_sums(
    df: DataFrame,
    order_col: str,
    value_cols: "dict[str, str]",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sums of SEVERAL value columns in one
    two-phase pass (``value_cols`` maps value column -> output column).

    Same plan shape as :func:`with_prefix_sum` — one range shuffle, one
    bounded offsets window — regardless of how many columns accumulate;
    the per-column running sums share the single local window spec.
    This is what a distributed empirical CDF over two samples needs
    (cumulative counts of both groups in value order) without either
    paying the range shuffle twice or packing two counters into one
    integer (which caps the row count the encoding can carry).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(df, order_col, n)
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged
    for i, vc in enumerate(value_cols):
        local = local.withColumn(
            f"__local{i}", F.coalesce(F.sum(vc).over(local_w), F.lit(0))
        )
    totals = local.groupBy("__pid").agg(
        *[F.sum(vc).alias(f"__total{i}") for i, vc in enumerate(value_cols)]
    )
    offset_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals
    for i in range(len(value_cols)):
        offsets = offsets.withColumn(
            f"__offset{i}",
            F.coalesce(F.sum(f"__total{i}").over(offset_w), F.lit(0)),
        )
    offsets = offsets.select(
        "__pid", *[f"__offset{i}" for i in range(len(value_cols))]
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for i, (vc, oc) in enumerate(value_cols.items()):
        out = out.withColumn(
            oc, (F.col(f"__local{i}") + F.col(f"__offset{i}")).cast("long")
        )
    drop = ["__pid"]
    for i in range(len(value_cols)):
        drop += [f"__local{i}", f"__offset{i}"]
    return out.drop(*drop)


def with_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running max of ``value_col`` in ``order_col``
    order (max over all strictly-earlier rows; NULL for the first row).

    Same two-phase shape as :func:`with_prefix_sum` — max is associative,
    so per-partition running maxes combine with a bounded per-partition
    offset max (``greatest`` ignores NULLs, which gives the exclusive
    frame's empty-prefix NULL for free).  Identical to
    ``max(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    -1))`` for any unique ``order_col``, at two bounded shuffles instead
    of a single-task global sort.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(df, order_col, n)
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("__local", F.max(value_col).over(local_w))
    # per-partition maxes: num_partitions rows — the only single-task
    # window in the plan runs over this bounded set, never the data
    totals = local.groupBy("__pid").agg(F.max(value_col).alias("__total"))
    offset_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("__offset", F.max("__total").over(offset_w)).select(
        "__pid", "__offset"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.greatest("__local", "__offset"))
        .drop("__pid", "__local", "__offset")
    )


def with_prev_value(
    df: DataFrame,
    order_col: str,
    out_col: str = "prev_value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``lag(order_col)`` in ``order_col`` order (NULL for the
    global minimum) without a single-partition window — the two-phase
    shape of :func:`with_prefix_sum`: range partition + parallel local
    ``lag`` + a carry panel (each partition's max order value, rolled to
    later partitions through the one bounded ``num_partitions``-row
    window).  ``order_col`` must be unique.  What a distributed
    piecewise-constant integral (e.g. Wasserstein-1 over an empirical
    CDF) needs for the gap term.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _ranged_with_pid(df, order_col, n)
    local_w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__lag", F.lag(order_col).over(local_w))
    tops = local.groupBy("__pid").agg(F.max(order_col).alias("__top"))
    carry_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    carries = tops.withColumn("__carry", F.max("__top").over(carry_w)).select(
        "__pid", "__carry"
    )
    return (
        local.join(F.broadcast(carries), "__pid")
        .withColumn(out_col, F.coalesce("__lag", "__carry"))
        .drop("__pid", "__lag", "__carry")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """GPT-style packing spans: concatenate documents in ``order_col``
    order and chop the token stream every ``budget`` tokens.

    Adds per-document columns:

    * ``start_offset`` — global token offset where the doc begins;
    * ``seq_first`` / ``seq_last`` — first/last context-window index the
      doc lands in (a doc may straddle a boundary);
    * ``n_seqs`` — number of windows the doc touches.

    Built on :func:`with_prefix_sum`, so the plan has no data-sized
    single-partition stage.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = with_prefix_sum(df, order_col, token_col, out_col="start_offset")
    end_tok = F.col("start_offset") + F.col(token_col) - 1
    return (
        out.withColumn("seq_first", F.floor(F.col("start_offset") / budget).cast("long"))
        .withColumn(
            "seq_last",
            F.when(F.col(token_col) <= 0, F.floor(F.col("start_offset") / budget))
            .otherwise(F.floor(end_tok / budget))
            .cast("long"),
        )
        .withColumn("n_seqs", (F.col("seq_last") - F.col("seq_first") + 1).cast("long"))
    )
