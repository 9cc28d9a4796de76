"""Skew mitigation: salted aggregation and salted broadcast-replicate join.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
shuffle-join time, but two shapes still need manual salting at 100 TB:

* a ``groupBy`` where one key holds a double-digit percentage of all rows
  (AQE cannot split a hash-aggregate bucket) → :func:`salted_agg`:
  two-phase aggregation over ``(keys, salt)`` then ``keys``.  Exact for
  the algebraic aggregates exposed here (sum/count/min/max — the partial
  results compose associatively).
* a join whose build side is small enough to replicate but whose probe
  side has hot keys hashed to one task → :func:`salted_join`: the probe
  side gets a deterministic per-row salt, the build side is exploded
  ``n_salts`` times, and the join key becomes ``(key, salt)`` so a hot
  key spreads over ``n_salts`` tasks.

Both rewrites are *plan-level only*: results are identical to the naive
form, which is exactly what the differential oracle asserts
(``catalog x_salted_agg`` runs the salted plan against the plain SQL).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "key_skew_profile"]

_SALT = "__salt"

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
# how to merge per-salt partials into the final value
_FINAL = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``groupBy(keys + salt)`` partials, then
    ``groupBy(keys)`` finals.

    ``aggs`` maps output alias → (column, fn) with fn in
    sum/count/min/max.  The salt is a deterministic hash of the full row
    id via ``spark_partition_id``+``monotonically_increasing_id`` — evenly
    spread, stable within a task, and never shuffled before phase 1, so
    phase 1 is map-side local to the scan.
    """
    for alias, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{alias}: unsupported aggregate {fn!r} (exact salting "
                             "needs an algebraic fn: sum/count/min/max)")
    salted = df.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[_PARTIAL[fn](col).alias(alias) for alias, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](alias).alias(alias) for alias, (_, fn) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the build side replicated across ``n_salts`` salt values.

    Use when the build side is broadcastable-small but the probe side has
    keys hot enough that even a broadcast join's downstream aggregation
    skews — or when the build side is slightly over the broadcast
    threshold and a shuffled join would hot-spot.  Only probe-preserving
    joins are allowed (inner/left): under replication a build-preserving
    join would duplicate unmatched build rows per salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (probe-preserving) joins")
    salted_probe = probe.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    replicated = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    return salted_probe.join(replicated, [*on, _SALT], how).drop(_SALT)


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Per-key frequency profile of a prospective join/groupBy key: the
    ``top_n`` heaviest keys with their row share and skew ratio
    (``cnt / average-key-count`` — how many times hotter than a uniform
    key; >10 on a double-digit-share key is the signal to reach for
    :func:`salted_agg` / :func:`salted_join` or AQE skew-join).

    This is the DIAGNOSTIC half of the skew toolkit: run it on the key
    you are about to shuffle on, read ``skew_ratio``, then pick the
    mitigation.  Scale: one map-side-combined count aggregate over the
    key, a 1-row stats aggregate, and a distributed top-N
    (``orderBy().limit()`` = per-partition top-N + driver merge of N
    rows); the ranking window runs over ``top_n`` rows, never over the
    key space.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.select("key", "cnt", F.row_number().over(w).cast("int").alias("rank"))
        .crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") / F.col("total_rows").cast("double"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("n_keys").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy("rank")
    )
