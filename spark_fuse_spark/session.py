"""SparkSession factory tuned for the engine.

Re-expresses the reference's session scaffolding
(``/root/reference/src/spark_fuse/spark.py:246-314`` — app name, local
master fallback, shuffle sizing, extra configs) Spark-first:

* AQE on (coalesce partitions, skew-join handling) instead of a fixed
  ``spark.sql.shuffle.partitions=8`` (reference ``spark.py:296``) — at
  100 TB the static number is always wrong; AQE right-sizes post-shuffle
  partitions from runtime statistics.
* Arrow enabled for every Python<->JVM exchange (pandas UDFs,
  ``mapInPandas``, ``toPandas``) so the Python path is vectorized.
* UTC session timezone so timestamp semantics are deterministic and
  engine-independent (matches the DuckDB differential oracle).
* Delta Lake wiring is applied only when delta-spark is importable
  (reference requires it unconditionally; this container has none).
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession

__all__ = ["create_session", "detect_environment", "stop_session"]


def detect_environment() -> str:
    """Best-effort runtime detection (reference ``spark.py:164-173``).

    Returns one of ``"databricks"``, ``"fabric"``, ``"local"``.
    """
    if "DATABRICKS_RUNTIME_VERSION" in os.environ:
        return "databricks"
    if os.environ.get("SPARK_ENV", "").lower() == "fabric" or "FABRIC_ENVIRONMENT" in os.environ:
        return "fabric"
    return "local"


def _delta_configs() -> dict[str, str]:
    try:
        import delta  # noqa: F401

        return {
            "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
            "spark.sql.catalog.spark_catalog": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        }
    except ImportError:
        return {}


def create_session(
    app_name: str = "spark-fuse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_configs: Mapping[str, str] | None = None,
    enable_delta: bool = True,
) -> SparkSession:
    """Create (or get) a SparkSession with scale-appropriate defaults.

    Defaults assume a real cluster; on ``local[N]`` masters the same
    settings remain correct because AQE coalesces shuffle partitions to
    the actual data volume.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif detect_environment() == "local" and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
        builder = builder.master(f"local[{cpus}]")

    configs: dict[str, str] = {
        # Adaptive execution: runtime partition coalescing + skew-join splitting.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for all Python-side exchange (pandas UDFs, mapInPandas, toPandas).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Deterministic timestamp semantics, engine-portable results.
        "spark.sql.session.timeZone": "UTC",
        # Read TIMESTAMP(NANOS) parquet (Spark has no native ns type) as raw
        # long nanos; tables.load_table converts to TimestampType.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Parquet pushdown/pruning is on by default; pin them explicitly so a
        # misconfigured cluster profile can't silently disable the fast path.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Allow Python Data Source readers to implement pushFilters()
        # (fuse-rest filter_param_map, fuse-qdrant predicate_pushdown);
        # Spark 4.1 hard-errors on a reader that defines the method while
        # this conf is false, so the engine session always permits it.
        "spark.sql.python.filterPushdown.enabled": "true",
        # local-mode friendliness (harmless on clusters with proper DNS)
        "spark.driver.bindAddress": os.environ.get("SPARK_DRIVER_BIND", "127.0.0.1"),
        "spark.ui.enabled": "false",
    }
    if shuffle_partitions is not None:
        configs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if enable_delta:
        configs.update(_delta_configs())
    if extra_configs:
        configs.update(extra_configs)
    for key, value in configs.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def stop_session(spark: SparkSession) -> None:
    """Stop the session, tolerating already-stopped contexts."""
    try:
        spark.stop()
    except Exception:
        pass


def enable_runtime_filters(
    spark: SparkSession, application_side_threshold: "str | None" = None
) -> None:
    """Turn on runtime bloom-filter semi-join reduction for selective
    shuffle joins.

    When a fact⋈filtered-dim join can't broadcast, Spark can still build
    a bloom filter from the (small) creation side at runtime and inject
    it as a pre-shuffle predicate on the fact side — the shuffled fact
    rows drop from |fact| to ≈|matching| before the exchange, which at
    100 TB is most of the join's cost.  The guard rails are size
    thresholds: the creation side must estimate under
    ``creationSideThreshold`` and the application-side scan over
    ``applicationSideScanSizeThreshold`` (default 10GB — meaning at
    production scale this fires on its own; pass e.g. ``"0"`` to
    demonstrate/test it at small SFs).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if application_side_threshold is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            application_side_threshold,
        )
