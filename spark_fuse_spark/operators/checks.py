"""Declarative data-quality checks (deequ/dbt-test style) over DataFrames.

A check suite compiles to as few Spark jobs as the check types allow:

* all ROW-LEVEL checks (not-null, range, set membership, custom
  predicate) fold into ONE conditional aggregate over ONE scan —
  adding a check is free once the scan is paid for;
* each UNIQUENESS check is one map-side-combined groupBy (count of keys
  seen more than once);
* each REFERENTIAL check is one left-anti join against the (broadcast
  if hinted) parent keys.

Results come back as a DataFrame — one row per check with violation and
row counts — so the report itself composes with the rest of the engine
(write it to a table, alert on it, trend it).  At 100 TB the row-level
suite is a single pass over the fact table; that property is the whole
design.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "NotNull",
    "InRange",
    "InSet",
    "Predicate",
    "Unique",
    "RefIntegrity",
    "run_checks",
]


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null:{self.col}"

    def violation(self) -> Column:
        return F.col(self.col).isNull()


@dataclass(frozen=True)
class InRange:
    col: str
    lo: float
    hi: float

    @property
    def name(self) -> str:
        return f"in_range:{self.col}[{self.lo},{self.hi}]"

    def violation(self) -> Column:
        c = F.col(self.col)
        # NULL is not a range violation — pair with NotNull to forbid nulls
        return c.isNotNull() & ((c < F.lit(self.lo)) | (c > F.lit(self.hi)))


@dataclass(frozen=True)
class InSet:
    col: str
    values: tuple

    @property
    def name(self) -> str:
        return f"in_set:{self.col}"

    def violation(self) -> Column:
        c = F.col(self.col)
        return c.isNotNull() & ~c.isin(list(self.values))


@dataclass(frozen=True)
class Predicate:
    """Custom row predicate that must HOLD; rows where it is false or
    null count as violations."""

    label: str
    condition: Column = field(compare=False)

    @property
    def name(self) -> str:
        return f"predicate:{self.label}"

    def violation(self) -> Column:
        return ~F.coalesce(self.condition, F.lit(False))


@dataclass(frozen=True)
class Unique:
    cols: tuple

    @property
    def name(self) -> str:
        return f"unique:{','.join(self.cols)}"


@dataclass(frozen=True)
class RefIntegrity:
    """Every non-null ``col`` value must exist in ``parent[parent_col]``."""

    col: str
    parent: DataFrame = field(compare=False)
    parent_col: str = "id"
    broadcast_parent: bool = False

    @property
    def name(self) -> str:
        return f"ref_integrity:{self.col}->{self.parent_col}"


def run_checks(df: DataFrame, checks: Sequence) -> DataFrame:
    """Evaluate a check suite; returns (check_name, n_violations, n_rows,
    passed) — row-level checks share one aggregate/scan, uniqueness and
    referential checks add one bounded job each."""
    spark = df.sparkSession
    total = F.count(F.lit(1)).cast("long")
    row_checks = [c for c in checks if hasattr(c, "violation")]
    results: list[DataFrame] = []

    if row_checks:
        aggs = [total.alias("__n")] + [
            F.sum(F.when(c.violation(), 1).otherwise(0)).cast("long").alias(f"__v{i}")
            for i, c in enumerate(row_checks)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{c.name}', __v{i}" for i, c in enumerate(row_checks))
        results.append(
            wide.select(
                F.expr(
                    f"stack({len(row_checks)}, {stack}) AS (check_name, n_violations)"
                ),
                F.col("__n").alias("n_rows"),
            )
        )

    for c in checks:
        if isinstance(c, Unique):
            dupes = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .where(F.col("__cnt") > 1)
                .agg(
                    F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("n_violations")
                )
            )
            n = df.agg(total.alias("n_rows"))
            results.append(
                dupes.crossJoin(F.broadcast(n)).select(
                    F.lit(c.name).alias("check_name"), "n_violations", "n_rows"
                )
            )
        elif isinstance(c, RefIntegrity):
            parent_keys = c.parent.select(
                F.col(c.parent_col).alias("__pk")
            ).distinct()
            if c.broadcast_parent:
                parent_keys = F.broadcast(parent_keys)
            orphans = (
                df.where(F.col(c.col).isNotNull())
                .join(parent_keys, F.col(c.col) == F.col("__pk"), "left_anti")
                .agg(total.alias("n_violations"))
            )
            n = df.agg(total.alias("n_rows"))
            results.append(
                orphans.crossJoin(F.broadcast(n)).select(
                    F.lit(c.name).alias("check_name"), "n_violations", "n_rows"
                )
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")
