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

# Queries whose natural output order is tie-ambiguous (grouped/windowed/
# set-op results with no inherent total order).  Values hash-match DuckDB
# but ROW ORDER can vary with partitioning, so if the driver's comparison
# is order-sensitive they would flap.  Both sides get a total order over
# every output column: Spark `orderBy(all cols, nulls first)`, DuckDB
# `ORDER BY ALL NULLS FIRST` — column precedence is identical because the
# unsorted column lists match by catalog convention (verified in CI).
_FORCE_TOTAL_ORDER = frozenset(
    {
        # tie-ambiguous natural order observed at sf0.01 (grouped/windowed/
        # set-op results)
        "c_scd2_snapshot", "d_dedup_exact", "d_jaccard_prefix",
        "d_minhash_lsh", "d_ngram_jaccard",
        "d_simhash", "e_first_event_dedup", "e_session_window",
        "e_sliding_window", "e_tumbling_window", "q_asof_join",
        "q_count_distinct", "q_cube", "q_dedup_keep_latest", "q_except",
        "q_grouping_sets", "q_intersect", "q_left_join_nullfill",
        "q_percentiles", "q_pivot", "q_range_join", "q_rollup", "q_semi_join",
        "q_topk_per_group", "q_window_dense_rank", "q_window_rolling_avg",
        "q_window_running_total", "v_ann_bruteforce", "v_sq8_topk",
        # no top-level Sort in the logical plan — order was incidental
        "d_embedding_neardup", "e_json_props", "m_binary_metadata",
        "q06_forecast_revenue", "q14_promo_revenue", "q17_small_qty_revenue",
        "q_anti_join", "q_calendar_dim", "q_case_when_bands",
        "q_column_toolkit", "q_cross_join_small", "q_full_outer_join",
        "q_in_subquery", "q_multi_format_dates", "q_row_hash",
        "q_scalar_subquery", "q_time_dim", "q_union_by_name",
        "t_doc_fingerprint", "t_language_id", "t_normalize_tokens",
        "t_quality_score", "t_stopword_punct", "v_vector_norms",
    }
)


def _totally_ordered(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        df = fn(spark, sf_dir)
        return df.orderBy(*[F.col(c).asc_nulls_first() for c in df.columns])

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


# Runtime session tuning applied before every catalog query.  The catalog
# is the differential-test harness — it runs at sf0.01–sf0.1 on a single
# machine, where the 200-partition shuffle default means every groupBy
# costs 200 task launches for kilobytes of data (and cached subplans are
# exempt from AQE coalescing unless explicitly allowed).  Production
# deployments of the underlying operators size shuffle partitions by data
# volume / AQE; these settings describe THIS harness's scale.  All three
# are documented runtime-settable SQL confs; failures are ignored so a
# locked-down session still runs the query.
def _tune_for_harness(spark: SparkSession) -> None:
    settings = {
        "spark.sql.shuffle.partitions": str(spark.sparkContext.defaultParallelism),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    }
    for key, value in settings.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _tune_for_harness(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        spark_fn, oracle_sql = fn, oracle
        if name in _FORCE_TOTAL_ORDER:
            if oracle_sql is None:
                raise ValueError(f"{name}: total-order wrap requires an oracle")
            spark_fn = _totally_ordered(fn)
            oracle_sql = f"SELECT * FROM (\n{oracle_sql}\n) __t ORDER BY ALL NULLS FIRST"
        spark_fn = _tuned(spark_fn)
        REGISTRY[name] = QuerySpec(
            name=name, spark=spark_fn, oracle=oracle_sql, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (idempotent) and return the registry.

    Import order is deliberate: the driver's correctness gate walks the
    registry in insertion order under a budget, so modules whose queries
    lacked a driver row in round 1 (tpch_extra / tpch_more /
    vectors_events, plus text_dedup's tail) register FIRST.
    """
    from . import (  # noqa: F401
        tpch_extra,
        tpch_more,
        vectors_events,
        text_dedup,
        ai_cdc,
        relational,
        pipeline,
        curation,
    )

    return REGISTRY
