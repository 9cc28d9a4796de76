"""Query catalog: every operator exposed as a named, oracle-checked query.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with an
equivalent ANSI-SQL string that DuckDB can execute over the same parquet
tables — the differential-correctness contract consumed by
``__spark_entry__.py`` (driver gate) and ``tests/test_oracle_parity.py``
(local gate).

Conventions keeping the two engines hash-identical:
* every computed column is aliased the SAME on both sides;
* doubles are ``round(x, n)`` on both sides;
* counts/length are cast to bigint on both sides;
* timestamps in outputs are formatted to second-precision strings;
* any LIMIT/top-k uses a TOTAL order (unique tie-break column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "load_all"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (idempotent) and return the registry."""
    from . import ai_cdc, relational, text_dedup, tpch_extra, vectors_events  # noqa: F401

    return REGISTRY
