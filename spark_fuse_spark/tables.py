"""Star-schema table loaders for the driver's test data.

Tables (TPC-H-ish + ``events``/``documents``/``embeddings``) live as one
parquet file per table under an ``sf*`` directory (see ``TESTDATA.md``).

Scale notes: at 100 TB each "file" becomes a partitioned parquet/Delta
dataset; nothing here changes because ``spark.read.parquet`` takes a
directory just as happily, and all downstream operators express plans
declaratively so partition pruning / predicate pushdown still apply.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views", "default_sf_dir"]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small relative to the facts; joins against
# them should broadcast (the fact:dim ratio survives any scale-up because the
# TPC-H-ish dims grow sub-linearly or not at all).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); without this conf any session that
        # didn't come from create_session() fails the scan outright
        # (PARQUET_TYPE_ILLEGAL).  Runtime-settable, so set it here too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_timestamps(df)
    return df


def _normalize_event_timestamps(df: DataFrame) -> DataFrame:
    """``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads as a
    long (``spark.sql.legacy.parquet.nanosAsLong``).  Convert to micros
    TimestampType with exact integer division (``/`` would go through
    double and lose precision above 2^53 ns)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
