"""Snapshot differencing: derive an insert/update/delete changelog from
two table states.

The missing half of the CDC story (``cdc/scd.py`` APPLIES a changelog;
this PRODUCES one): given yesterday's and today's snapshot of a table
with a primary key, emit the minimal change set — the input an SCD
upsert, a downstream cache invalidation, or a reverse-ETL sync consumes.
Re-expresses the Delta Change Data Feed contract for plain tables
(reference ``utils/change_tracking.py`` tracks changes only at write
time; diffing two existing states is net-new surface).

Scale shape: ONE co-partitioned full-outer sort-merge join on the key
columns; attribute equality is decided by a sha256 row hash computed
map-side BEFORE the shuffle, so wide rows compare via one 64-char
column rather than N-column comparisons, and unchanged rows (the
overwhelming majority of a daily snapshot pair) are dropped immediately
after the join — output is O(changes), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import row_hash

__all__ = [
    "snapshot_diff",
    "apply_changelog",
    "incremental_agg_merge",
    "incremental_join_merge",
]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: "list[str] | None" = None,
    op_col: str = "op",
    include_before: bool = False,
) -> DataFrame:
    """Changelog between two snapshots keyed by ``keys``.

    Output: ``keys + compare_cols + op_col`` with one row per changed
    key — ``op`` ∈ {'I','U','D'}; attribute columns carry the NEW value
    for I/U and the OLD (deleted) value for D.  Unchanged keys are
    omitted.  Null attributes compare equal via the null-normalized row
    hash (``functions.hashing.row_hash``); key columns must be non-null
    (primary-key contract, as in ``cdc/scd.py``).

    With ``include_before=True`` each compare column also ships a
    ``<col>__before`` twin holding the OLD value (null for I) — the
    Debezium-style before-image that downstream *delta* consumers need
    (``incremental_agg_merge`` uses it to retract a changed row's old
    contribution without re-reading the base table).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    compare = compare_cols or [c for c in new.columns if c not in keys]
    if not compare:
        raise ValueError("no attribute columns to compare (all columns are keys)")
    missing = [c for c in compare if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a snapshot: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__ov_{c}") for c in compare],
        row_hash(compare).alias("__oh"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__nv_{c}") for c in compare],
        row_hash(compare).alias("__nh"),
    )
    cond = [o[f"__ok_{k}"] == n[f"__nk_{k}"] for k in keys]
    j = o.join(n, cond, "full_outer")

    op = (
        F.when(F.col(f"__ok_{keys[0]}").isNull(), F.lit("I"))
        .when(F.col(f"__nk_{keys[0]}").isNull(), F.lit("D"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("U"))
    )
    out_keys = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    out_vals = [
        F.when(F.col(op_col) == "D", F.col(f"__ov_{c}"))
        .otherwise(F.col(f"__nv_{c}"))
        .alias(c)
        for c in compare
    ]
    out_before = (
        [
            F.when(F.col(op_col) != "I", F.col(f"__ov_{c}")).alias(f"{c}__before")
            for c in compare
        ]
        if include_before
        else []
    )
    return (
        j.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(*out_keys, *out_vals, *out_before, op_col)
    )


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog (the :func:`snapshot_diff` format) to a
    snapshot, producing the next snapshot.

    Round-trip contract (property-tested):
    ``apply_changelog(old, snapshot_diff(old, new), keys) ≡ new``.

    Shape: one left-anti-style outer join on the keys — rows keyed by a
    D/U changelog entry are dropped/replaced, I/U rows are appended
    from the changelog's values.  Both passes shuffle on the same key
    family; the changelog side is O(changes) and broadcastable when
    the day's churn is small.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    cols = [c for c in snapshot.columns]
    touched = changelog.where(F.col(op_col).isin("U", "D")).select(
        *[F.col(k).alias(f"__t_{k}") for k in keys]
    )
    cond = [snapshot[k] == touched[f"__t_{k}"] for k in keys]
    kept = snapshot.join(touched, cond, "left_anti")
    upserts = changelog.where(F.col(op_col).isin("I", "U")).select(*cols)
    return kept.unionByName(upserts)


def incremental_agg_merge(
    base_agg: DataFrame,
    changelog: DataFrame,
    group_cols: list[str],
    value_col: str,
    count_col: str = "n_rows",
    sum_col: str = "total",
    op_col: str = "op",
    before_suffix: str = "__before",
    nonnull_col: "str | None" = None,
) -> DataFrame:
    """Incremental materialized-view maintenance: merge an I/U/D
    changelog into a grouped (count, sum) aggregate WITHOUT recomputing
    the base table — the standard delta-maintenance rule for
    distributive aggregates (count/sum/avg-from-sum).

    ``base_agg`` holds ``group_cols + [count_col, sum_col]`` (the view
    as of the old snapshot); ``changelog`` is the
    :func:`snapshot_diff(..., include_before=True)` format, where the
    grouping attributes and ``value_col`` carry NEW values and their
    ``__before`` twins carry OLD values.  Each change contributes:

    * I → (+1, +value) to the new group;
    * D → (−1, −value_before) to the old group;
    * U → both — so a row that MOVED groups retracts from the old group
      and lands in the new one, and an in-place value change cancels
      its own count.

    Shape: two narrow projections of the O(changes) changelog unioned
    under the view, ONE grouped sum, groups whose count reaches zero
    drop out.  At 100 TB the base view never rescans its fact table —
    the whole merge is proportional to the day's churn.  Exactness:
    delta contributions are cast to the view's own count/sum types, so
    a decimal-summed view stays exact under maintenance (property: the
    merged view ≡ recomputing the aggregate from the new snapshot — the
    catalog oracle checks precisely that).

    Null values: delta arithmetic alone cannot distinguish a group whose
    values are ALL null (SQL ``SUM`` = NULL) from one whose deltas
    cancel to 0.  Pass ``nonnull_col`` naming a maintained count of
    non-null values (``base_agg`` must carry it, e.g. built with
    ``F.count(value)``); the merge then reports ``sum = NULL`` exactly
    when that counter reaches 0, matching a recompute bit-for-bit even
    under all-null transitions.  Without it the view is exact whenever
    ``value_col`` is non-nullable (the common measures case) and
    reports 0 instead of NULL otherwise — found by fuzzing, pinned in
    ``tests/test_cdc_properties.py``.
    """
    track = nonnull_col is not None
    if track and nonnull_col not in base_agg.columns:
        raise ValueError(f"base_agg lacks nonnull_col {nonnull_col!r}")
    if f"{value_col}{before_suffix}" not in changelog.columns:
        raise ValueError(
            f"changelog lacks {value_col}{before_suffix!r}: build it with "
            f"snapshot_diff(..., include_before=True) and include "
            f"{value_col!r} in compare_cols"
        )

    def before_col(g: str) -> Column:
        # a group col that was a snapshot_diff KEY has no __before twin
        # (keys cannot change, so its own value IS the before-image);
        # anything else missing is a mis-built changelog — fail clearly
        # instead of the opaque unresolved-column AnalysisException later
        if f"{g}{before_suffix}" in changelog.columns:
            return F.col(f"{g}{before_suffix}")
        if g in changelog.columns:
            return F.col(g)
        raise ValueError(
            f"group col {g!r} has neither a {before_suffix} twin nor its "
            f"own column in the changelog; include it in snapshot_diff's "
            f"compare_cols (or keys)"
        )

    cnt_t = base_agg.schema[count_col].dataType
    sum_t = base_agg.schema[sum_col].dataType
    before_val = F.col(f"{value_col}{before_suffix}")
    minus = changelog.where(F.col(op_col) != "I").select(
        *[before_col(g).alias(g) for g in group_cols],
        F.lit(-1).cast(cnt_t).alias(count_col),
        (-before_val.cast(sum_t)).alias(sum_col),
        *(
            [(-before_val.isNotNull().cast(cnt_t)).alias(nonnull_col)]
            if track
            else []
        ),
    )
    plus = changelog.where(F.col(op_col) != "D").select(
        *group_cols,
        F.lit(1).cast(cnt_t).alias(count_col),
        F.col(value_col).cast(sum_t).alias(sum_col),
        *(
            [F.col(value_col).isNotNull().cast(cnt_t).alias(nonnull_col)]
            if track
            else []
        ),
    )
    carried = [count_col, sum_col] + ([nonnull_col] if track else [])
    merged = (
        base_agg.select(*group_cols, *carried)
        .unionByName(minus)
        .unionByName(plus)
        .groupBy(*group_cols)
        .agg(
            F.sum(count_col).cast(cnt_t).alias(count_col),
            F.sum(sum_col).cast(sum_t).alias(sum_col),
            *([F.sum(nonnull_col).cast(cnt_t).alias(nonnull_col)] if track else []),
        )
    )
    if track:
        merged = merged.withColumn(
            sum_col,
            F.when(F.col(nonnull_col) > 0, F.col(sum_col)),
        )
    return merged.where(F.col(count_col) > 0)


def incremental_join_merge(
    view: DataFrame,
    fact_changelog: DataFrame,
    dim_changelog: DataFrame,
    new_dim: DataFrame,
    fact_key: str,
    fk: str,
    dim_key: str,
    dim_attrs: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a LEFT many-to-one join view
    ``facts LEFT JOIN dim ON facts.fk == dim.dim_key`` — the fact⋈dim
    enrichment every star schema materializes — without rescanning the
    fact table.

    ``view`` is the join output as of the old snapshots (fact columns +
    ``dim_attrs``); ``fact_changelog`` / ``dim_changelog`` are
    :func:`snapshot_diff` changelogs of the respective inputs
    (``fact_changelog`` keyed by ``fact_key`` and carrying ``fk`` in its
    compare/key columns); ``new_dim`` is the NEW dim snapshot (probed
    only by the O(Δfacts) insert path).  Left-join semantics make dim
    churn closed over the view itself:

    * dim U → refresh ``dim_attrs`` on every view row whose ``fk``
      matches (one join of the view against the O(Δdim) changelog);
    * dim D → those rows keep their fact columns, attrs go null;
    * dim I → previously-unmatched rows (attrs null) pick up the new
      attrs through the same join;
    * fact U/D → drop the old view row (anti-join on ``fact_key``);
      fact I/U → rebuild the row against ``new_dim`` (O(Δfacts) probe),
      which also covers fk reassignment.

    Exactness contract (property-tested and oracle-checked by
    ``c_incremental_join``): the merged view ≡ recomputing the left
    join from the new snapshots.  Requires the join to be many-to-one
    (``dim_key`` unique) — the uniqueness every dimension table already
    guarantees; a multi-match dim would need multiset row accounting.

    Scale: never touches the fact table — one view⋈Δdim join (Δdim
    broadcastable), one anti-join on O(Δfacts) keys, one Δfacts⋈dim
    probe.  All three shuffle O(view churn), not O(view).
    """
    for c in (fact_key, fk):
        if c not in view.columns:
            raise ValueError(f"view lacks fact column {c!r}")
    missing = [a for a in dim_attrs if a not in view.columns]
    if missing:
        raise ValueError(f"view lacks dim attrs {missing}")
    if fk not in fact_changelog.columns:
        raise ValueError(
            f"fact changelog lacks {fk!r}: include it in snapshot_diff's "
            "compare_cols (or keys) so fk reassignment is visible"
        )
    missing = [a for a in dim_attrs if a not in dim_changelog.columns]
    if missing:
        raise ValueError(f"dim changelog lacks attrs {missing}")

    fact_cols = [c for c in view.columns if c not in dim_attrs]

    # 1. dim churn: refresh attrs through the view's own fk
    dlog = dim_changelog.select(
        F.col(dim_key).alias("__dk"),
        F.col(op_col).alias("__dop"),
        *[F.col(a).alias(f"__dn_{a}") for a in dim_attrs],
    )
    refreshed = view.join(dlog, view[fk] == dlog["__dk"], "left").select(
        *fact_cols,
        *[
            F.when(F.col("__dop").isNull(), F.col(a))
            .when(F.col("__dop") == "D", F.lit(None).cast(view.schema[a].dataType))
            .otherwise(F.col(f"__dn_{a}"))
            .alias(a)
            for a in dim_attrs
        ],
    )

    # 2. drop fact rows the fact changelog replaces or deletes
    touched = fact_changelog.where(F.col(op_col).isin("U", "D")).select(
        F.col(fact_key).alias("__tk")
    )
    kept = refreshed.join(
        touched, refreshed[fact_key] == touched["__tk"], "left_anti"
    )

    # 3. rebuild inserted/updated fact rows against the NEW dim
    ins = fact_changelog.where(F.col(op_col).isin("I", "U")).select(*fact_cols)
    dim_side = new_dim.select(
        F.col(dim_key).alias("__dk"), *[F.col(a) for a in dim_attrs]
    )
    rebuilt = ins.join(dim_side, ins[fk] == dim_side["__dk"], "left").select(
        *fact_cols, *dim_attrs
    )
    return kept.unionByName(rebuilt)
