"""Date/time dimension generators and tolerant multi-format parsing.

Re-expresses:
* calendar/time dimension generators — reference
  ``/root/reference/src/spark_fuse/utils/dataframe.py:79-153`` (built on
  ``spark.range`` so generation is distributed, no driver loop);
* ``split_by_date_formats`` — reference
  ``/root/reference/src/spark_fuse/utils/transformations.py:162-267``:
  per-format ``try_to_timestamp`` parse, first-match ``coalesce``,
  match-index ``when`` chain, and the three unmatched-row modes
  (``null`` / ``strict`` / ``default``).

All expressions are built-in Catalyst functions — the whole parse chain
stays inside WholeStageCodegen, no Python UDFs.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "calendar_dimension",
    "time_dimension",
    "split_by_date_formats",
    "UnmatchedDateError",
]


class UnmatchedDateError(ValueError):
    """Raised in strict mode when rows match no supplied date format."""


def calendar_dimension(
    spark: SparkSession, start: "str | _dt.date", end: "str | _dt.date"
) -> DataFrame:
    """Calendar dim over [start, end] (reference ``dataframe.py:79-97``).

    Columns: date, year, quarter, month, month_name, week_of_year,
    day_of_month, day_of_week, day_name.  Built on ``spark.range`` →
    distributed generation; at scale the row count is tiny (days) so
    this always broadcasts into joins.
    """
    start_d = _dt.date.fromisoformat(start) if isinstance(start, str) else start
    end_d = _dt.date.fromisoformat(end) if isinstance(end, str) else end
    if end_d < start_d:
        raise ValueError(f"calendar_dimension: end {end_d} before start {start_d}")
    days = (end_d - start_d).days + 1
    d = F.date_add(F.lit(start_d), F.col("id").cast("int"))
    return spark.range(0, days).select(
        d.alias("date"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.weekofyear(d).alias("week_of_year"),
        F.dayofmonth(d).alias("day_of_month"),
        F.dayofweek(d).alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
    )


def time_dimension(spark: SparkSession, grain_seconds: int = 1) -> DataFrame:
    """Seconds-of-day dim (reference ``dataframe.py:128-153``).

    Columns: second_of_day, hour, minute, second, hhmmss.
    """
    if grain_seconds < 1 or 86400 % grain_seconds != 0:
        raise ValueError("grain_seconds must divide 86400")
    sec = F.col("id").cast("int")
    hour = F.floor(sec / 3600).cast("int")
    minute = F.floor((sec % 3600) / 60).cast("int")
    second = (sec % 60).cast("int")
    return spark.range(0, 86400, grain_seconds).select(
        sec.alias("second_of_day"),
        hour.alias("hour"),
        minute.alias("minute"),
        second.alias("second"),
        F.format_string("%02d:%02d:%02d", hour, minute, second).alias("hhmmss"),
    )


def _parse_exprs(col, formats: Sequence[str]):
    return [F.to_date(F.try_to_timestamp(col, F.lit(fmt))) for fmt in formats]


def split_by_date_formats(
    df: DataFrame,
    column: str,
    formats: Iterable[str],
    output_column: str = "parsed_date",
    format_index_column: str | None = "format_index",
    mode: str = "null",
    default: "str | _dt.date | None" = None,
) -> DataFrame:
    """Tolerant multi-format date parsing (reference ``transformations.py:162-267``).

    Each format is tried with ``try_to_timestamp`` (returns null instead of
    raising); first match wins via ``coalesce``; the index of the matching
    format is derived with a ``when`` chain.  ``mode``:

    * ``"null"``    — unparseable rows keep null (and null format index);
    * ``"strict"``  — raise :class:`UnmatchedDateError` if any row fails;
    * ``"default"`` — fill unparseable rows with ``default``.
    """
    fmts = list(formats)
    if not fmts:
        raise ValueError("split_by_date_formats: at least one format required")
    if mode not in ("null", "strict", "default"):
        raise ValueError(f"split_by_date_formats: unknown mode {mode!r}")
    if mode == "default" and default is None:
        raise ValueError("split_by_date_formats: mode='default' requires default=")

    col = F.col(column)
    parsed = _parse_exprs(col, fmts)
    best = F.coalesce(*parsed)

    idx = None
    for i, p in enumerate(parsed):
        cond = p.isNotNull()
        idx = F.when(cond, F.lit(i)) if idx is None else idx.when(cond, F.lit(i))

    out = df.withColumn(output_column, best)
    if format_index_column:
        out = out.withColumn(format_index_column, idx)

    if mode == "strict":
        bad = out.filter(col.isNotNull() & F.col(output_column).isNull()).limit(1).collect()
        if bad:
            raise UnmatchedDateError(
                f"split_by_date_formats: unparseable value {bad[0][column]!r}"
            )
    elif mode == "default":
        default_d = _dt.date.fromisoformat(default) if isinstance(default, str) else default
        out = out.withColumn(
            output_column,
            F.when(F.col(output_column).isNull() & col.isNotNull(), F.lit(default_d)).otherwise(
                F.col(output_column)
            ),
        )
    return out
