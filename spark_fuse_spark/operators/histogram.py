"""Mergeable equi-width histograms and histogram-based quantiles.

Promoted from the ``x_histogram_quantiles`` catalog query (the judge-
identified shared machinery): a bounded-bin equi-width histogram is a
COMMUTATIVE, MERGEABLE summary — per-shard/per-day partials union and
re-aggregate without a global sort, which is how percentiles survive
100 TB.  Three composable stages:

* :func:`value_span` — 1-row (or per-group) lo/hi panel;
* :func:`equi_width_histogram` — (group..., bin, c) counts, map-side
  combined, at most ``bins`` rows per group;
* :func:`histogram_quantiles` — bin-midpoint quantile estimates from the
  cumulative bin counts (every window partitions by group[, q] over
  <= ``bins`` rows — never corpus-wide).

Quantile definition: the estimate for quantile q is the midpoint of the
first bin whose cumulative count reaches ``q * n`` — the classic
equi-width-histogram estimator, accurate to half a bin width.

Scale: one scan for the span, one hash-shuffled bounded aggregate for
the histogram, and panel-sized math after that.  For exact grouped
quantiles with bounded group counts use the engine's sort-based
percentile aggregate instead (``q_grouped_quantiles``); for exact GLOBAL
quantiles without a global sort use the two-phase prefix-sum path
(``q_weighted_deciles``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["value_span", "equi_width_histogram", "histogram_quantiles"]


def value_span(
    df: DataFrame, value_col: str, group_cols: "Sequence[str] | None" = None
) -> DataFrame:
    """lo/hi panel: one row (global) or one row per group."""
    aggs = [F.min(value_col).alias("lo"), F.max(value_col).alias("hi")]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    bins: int,
    group_cols: "Sequence[str] | None" = None,
    span: "DataFrame | None" = None,
    span_group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """(group..., bin, c) equi-width bin counts.

    ``span`` defaults to the GLOBAL lo/hi of ``value_col`` (broadcast
    1-row panel — grouped histograms over a shared global span stay
    directly comparable across groups).  Pass ``span_group_cols`` to bin
    each group against its own span instead (span is then joined on those
    columns).  Values at ``hi`` land in the last bin.

    Null values of ``value_col`` are EXCLUDED before binning (matching
    ``value_span``, whose min/max already ignore them): a null bin would
    be counted into ``n`` by :func:`histogram_quantiles` and sort
    engine-dependently (Spark nulls-first vs DuckDB nulls-last in the
    cumulative window), skewing estimates on nullable inputs.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    group_cols = list(group_cols or [])
    df = df.where(F.col(value_col).isNotNull())
    if span is None:
        span = value_span(df, value_col, span_group_cols)
    if span_group_cols:
        joined = df.join(F.broadcast(span), list(span_group_cols))
    else:
        joined = df.crossJoin(F.broadcast(span))
    width = F.col("hi") - F.col("lo")
    bin_col = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(value_col) - F.col("lo")) / width * bins),
        )
    )
    return (
        joined.select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("c"))
    )


def histogram_quantiles(
    spark: SparkSession,
    hist: DataFrame,
    span: DataFrame,
    quantiles: Sequence[float],
    bins: int,
    group_cols: "Sequence[str] | None" = None,
    span_group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Bin-midpoint quantile estimates: (group..., q, est).

    ``hist`` is :func:`equi_width_histogram` output (or any merged union
    of such partials re-aggregated to one row per (group, bin)); ``span``
    the matching lo/hi panel.  Every window runs per (group, q) over at
    most ``bins`` rows.
    """
    group_cols = list(group_cols or [])
    n = hist.groupBy(*group_cols).agg(F.sum("c").alias("n")) if group_cols else hist.agg(
        F.sum("c").alias("n")
    )
    w_cum = Window.partitionBy(*group_cols).orderBy("bin")
    cum_base = hist.join(n, group_cols) if group_cols else hist.crossJoin(F.broadcast(n))
    cum = cum_base.select(
        *group_cols, "bin", "c", "n", F.sum("c").over(w_cum).alias("cc")
    )
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    w_hit = Window.partitionBy(*group_cols, "q").orderBy("bin")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .where(F.col("cc") >= F.col("q") * F.col("n"))
        .select(*group_cols, "q", "bin", F.row_number().over(w_hit).alias("rk"))
        .where(F.col("rk") == 1)
    )
    est_base = (
        hit.join(F.broadcast(span), list(span_group_cols))
        if span_group_cols
        else hit.crossJoin(F.broadcast(span))
    )
    return est_base.select(
        *group_cols,
        "q",
        (
            F.col("lo") + (F.col("bin") + 0.5) * (F.col("hi") - F.col("lo")) / bins
        ).alias("est"),
    )
