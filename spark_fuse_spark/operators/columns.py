"""Column-level relational utilities.

Re-implements the reference's transformation toolkit
(``/root/reference/src/spark_fuse/utils/transformations.py:33-113`` —
``rename_columns`` / ``with_constants`` / ``cast_columns`` — and
``utils/dataframe.py:18-33`` — ``ensure_columns`` / ``preview``) as thin
single-projection wrappers.

Every function emits exactly ONE ``select`` so Catalyst sees a single
projection node: chains of renames/casts/constants collapse into one
whole-stage-codegen'd project over the scan, and column pruning still
reaches the parquet reader.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

__all__ = [
    "rename_columns",
    "with_constants",
    "cast_columns",
    "ensure_columns",
    "preview",
    "select_expr_map",
]


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Order-preserving multi-rename (reference ``transformations.py:33-57``).

    Raises if a source column is missing or the rename would produce
    duplicate output names.
    """
    missing = [c for c in mapping if c not in df.columns]
    if missing:
        raise ValueError(f"rename_columns: missing source columns {missing}")
    out_names = [mapping.get(c, c) for c in df.columns]
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(f"rename_columns: duplicate output columns {dupes}")
    return df.select([F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def with_constants(df: DataFrame, constants: Mapping[str, Any], overwrite: bool = False) -> DataFrame:
    """Append literal columns (reference ``transformations.py:60-86``)."""
    collisions = [c for c in constants if c in df.columns]
    if collisions and not overwrite:
        raise ValueError(f"with_constants: columns already exist {collisions}")
    keep = [F.col(c) for c in df.columns if c not in constants]
    added = [F.lit(v).alias(name) for name, v in constants.items()]
    if overwrite:
        # preserve original column order for overwritten names
        out = []
        for c in df.columns:
            if c in constants:
                out.append(F.lit(constants[c]).alias(c))
            else:
                out.append(F.col(c))
        out.extend(F.lit(v).alias(n) for n, v in constants.items() if n not in df.columns)
        return df.select(out)
    return df.select([*keep, *added])


def cast_columns(df: DataFrame, casts: Mapping[str, "str | DataType"]) -> DataFrame:
    """Cast in place, preserving column order (reference ``transformations.py:92-113``)."""
    missing = [c for c in casts if c not in df.columns]
    if missing:
        raise ValueError(f"cast_columns: missing columns {missing}")
    return df.select(
        [F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c) for c in df.columns]
    )


def ensure_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Presence assertion (reference ``dataframe.py:25-33``); returns df unchanged."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"ensure_columns: missing columns {missing}")
    return df


def preview(df: DataFrame, n: int = 10) -> str:
    """Head-n + schema string (reference ``dataframe.py:18-22``).

    Driver-side convenience only — never in a distributed hot path.
    """
    rows = df.limit(n).collect()
    lines = [df.schema.simpleString()]
    lines.extend(str(r.asDict()) for r in rows)
    return "\n".join(lines)


def select_expr_map(df: DataFrame, exprs: Mapping[str, "Column | str"]) -> DataFrame:
    """One projection from a name->expression mapping (SQL-string or Column)."""
    cols = []
    for name, e in exprs.items():
        col = F.expr(e) if isinstance(e, str) else e
        cols.append(col.alias(name))
    return df.select(cols)
