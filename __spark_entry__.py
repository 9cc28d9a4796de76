"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``spark_fuse_spark.catalog`` — the query registry where
every implemented operator from SURVEY.md §2 is exposed as a named query
paired (where SQL-expressible) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_fuse_spark.catalog import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-flavor pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
