"""Property-based SCD tests: random batch sequences vs a dict reference model.

hypothesis drives small random upsert histories through the real Spark
protocols; a pure-Python model computes the expected end state.  Catches
ordering, null-key, and hash-gating edge cases example tests miss.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_fuse_spark.cdc import current_only_upsert, track_history_upsert

KEYS = [1, 2, 3]
VALUES = ["a", "b", "c"]

# a batch: per-key at most one row (dedup is covered by example tests);
# value None means "key absent from this batch"
batch_strategy = st.fixed_dictionaries({k: st.sampled_from(VALUES + [None]) for k in KEYS})
history_strategy = st.lists(batch_strategy, min_size=1, max_size=4)

_counter = 0


def _fresh_target(tmp_path_factory) -> str:
    global _counter
    _counter += 1
    return str(tmp_path_factory.mktemp("prop") / f"t{_counter}")


@pytest.fixture(scope="module")
def tpf(tmp_path_factory):
    return tmp_path_factory


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(history=history_strategy)
def test_scd1_matches_model(spark, tpf, history):
    target = _fresh_target(tpf)
    model: dict[int, tuple[str, int]] = {}  # key -> (value, batch_idx of last CHANGE)
    applied = False
    for i, batch in enumerate(history):
        rows = [(k, v) for k, v in batch.items() if v is not None]
        if not rows:
            continue
        ts = f"to_timestamp('2024-01-0{i + 1} 00:00:00')"
        current_only_upsert(
            spark,
            spark.createDataFrame(rows, ["id", "val"]),
            target,
            ["id"],
            load_ts_expr=ts,
        )
        applied = True
        for k, v in rows:
            if k not in model or model[k][0] != v:
                model[k] = (v, i)  # insert or hash-gated update
    if not applied:
        return
    out = {
        r["id"]: (r["val"], int(str(r["load_ts"])[9]) - 1)
        for r in spark.read.parquet(target).collect()
    }
    assert out == model


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(history=history_strategy)
def test_scd2_matches_model(spark, tpf, history):
    target = _fresh_target(tpf)
    # model: key -> list of versions (value, closed?)
    model: dict[int, list[list]] = {}
    applied = False
    for i, batch in enumerate(history):
        rows = [(k, v) for k, v in batch.items() if v is not None]
        if not rows:
            continue
        ts = f"to_timestamp('2024-01-0{i + 1} 00:00:00')"
        track_history_upsert(
            spark,
            spark.createDataFrame(rows, ["id", "val"]),
            target,
            ["id"],
            load_ts_expr=ts,
        )
        applied = True
        for k, v in rows:
            chain = model.setdefault(k, [])
            if not chain:
                chain.append([v, False])
            elif chain[-1][0] != v:
                chain[-1][1] = True  # close current
                chain.append([v, False])
    if not applied:
        return
    rows = [r.asDict() for r in spark.read.parquet(target).collect()]
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["version"])):
        got.setdefault(r["id"], []).append([r["val"], not r["is_current"]])
    assert got == model
    # invariants: exactly one current row per key; versions are 1..n
    for k, chain in got.items():
        versions = [r["version"] for r in sorted(rows, key=lambda r: r["version"]) if r["id"] == k]
        assert versions == list(range(1, len(chain) + 1))
        assert sum(1 for c in chain if not c[1]) == 1


# ----------------------------------------------- incremental agg merge
# old/new snapshots over keys 1..8: each key maps to (group, value) or
# None (absent).  Property: maintaining the (count, sum) view through
# snapshot_diff + incremental_agg_merge equals recomputing it from new.
_state = st.fixed_dictionaries({
    k: st.one_of(
        st.none(),
        st.tuples(st.sampled_from(["g1", "g2", "g3", None]),
                  st.one_of(st.none(),
                            st.integers(min_value=-50, max_value=50))),
    )
    for k in range(1, 9)
})


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(old_state=_state, new_state=_state)
def test_incremental_agg_merge_equals_recompute(spark, old_state, new_state):
    """With the non-null counter maintained, the merged view matches a
    recompute EXACTLY — including null groups, null values, and groups
    whose values become all-null (SUM must come back NULL, not 0)."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.cdc import incremental_agg_merge, snapshot_diff

    schema = "id long, grp string, val long"
    old_rows = [(k, g, v) for k, gv in old_state.items() if gv for g, v in [gv]]
    new_rows = [(k, g, v) for k, gv in new_state.items() if gv for g, v in [gv]]
    old = spark.createDataFrame(old_rows or [], schema)
    new = spark.createDataFrame(new_rows or [], schema)

    base = old.groupBy("grp").agg(
        F.count("*").alias("n_rows"),
        F.sum("val").alias("total"),
        F.count("val").alias("n_vals"),
    )
    log = snapshot_diff(old, new, keys=["id"], compare_cols=["grp", "val"],
                        include_before=True)
    view = incremental_agg_merge(base, log, ["grp"], "val", nonnull_col="n_vals")
    got = {r.grp: (r.n_rows, r.total) for r in view.collect()}

    expect: dict = {}
    for _, g, v in new_rows:
        n, t = expect.get(g, (0, None))
        expect[g] = (n + 1, t if v is None else (v if t is None else t + v))
    assert got == expect


# ----------------------------------------------- incremental join merge
# facts: key -> (fk, price) or None; dims: key -> attr or None.  fks draw
# from a slightly larger range than dim keys so unmatched facts (left-join
# nulls), dim inserts resurrecting them, and dim deletes nulling them all
# occur.  Property: maintaining the left many-to-one join view through
# snapshot_diff + incremental_join_merge equals recomputing the join from
# the new snapshots.
_facts = st.fixed_dictionaries({
    k: st.one_of(
        st.none(),
        st.tuples(st.integers(min_value=1, max_value=5),
                  st.integers(min_value=-50, max_value=50)),
    )
    for k in range(1, 9)
})
_dims = st.fixed_dictionaries({
    k: st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    for k in range(1, 4)
})


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(old_f=_facts, new_f=_facts, old_d=_dims, new_d=_dims)
def test_incremental_join_merge_equals_recompute(spark, old_f, new_f, old_d, new_d):
    """Merged view == recomputed left join under arbitrary fact churn
    (including fk moves), dim updates, dim deletes (attrs null), and dim
    inserts (previously-unmatched rows pick up attrs)."""
    from spark_fuse_spark.cdc import incremental_join_merge, snapshot_diff

    fschema = "fid long, fk long, price long"
    dschema = "did long, attr string"
    of = [(k, fk, p) for k, v in old_f.items() if v for fk, p in [v]]
    nf = [(k, fk, p) for k, v in new_f.items() if v for fk, p in [v]]
    od = [(k, a) for k, a in old_d.items() if a]
    nd = [(k, a) for k, a in new_d.items() if a]
    old_facts = spark.createDataFrame(of or [], fschema)
    new_facts = spark.createDataFrame(nf or [], fschema)
    old_dim = spark.createDataFrame(od or [], dschema)
    new_dim = spark.createDataFrame(nd or [], dschema)

    view = old_facts.join(
        old_dim, old_facts.fk == old_dim.did, "left"
    ).select("fid", "fk", "price", "attr")
    flog = snapshot_diff(old_facts, new_facts, keys=["fid"],
                         compare_cols=["fk", "price"])
    dlog = snapshot_diff(old_dim, new_dim, keys=["did"], compare_cols=["attr"])
    merged = incremental_join_merge(
        view, flog, dlog, new_dim,
        fact_key="fid", fk="fk", dim_key="did", dim_attrs=["attr"],
    )
    got = sorted((r.fid, r.fk, r.price, r.attr) for r in merged.collect())
    dmap = dict(nd)
    expect = sorted((k, fk, p, dmap.get(fk)) for k, fk, p in nf)
    assert got == expect


def test_incremental_join_merge_validates_inputs(spark):
    """Mis-built inputs fail loudly: missing fk in the fact changelog
    (fk moves would be invisible), missing dim attrs, missing view cols."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.cdc import incremental_join_merge

    view = spark.createDataFrame([(1, 1, "a")], "fid long, fk long, attr string")
    flog_no_fk = spark.createDataFrame([(1, "U")], "fid long, op string")
    dlog = spark.createDataFrame([(1, "a", "U")], "did long, attr string, op string")
    dim = spark.createDataFrame([(1, "a")], "did long, attr string")
    with pytest.raises(ValueError, match="fact changelog lacks 'fk'"):
        incremental_join_merge(view, flog_no_fk, dlog, dim,
                               fact_key="fid", fk="fk", dim_key="did",
                               dim_attrs=["attr"])
    with pytest.raises(ValueError, match="view lacks dim attrs"):
        incremental_join_merge(view.drop("attr"), flog_no_fk, dlog, dim,
                               fact_key="fid", fk="fk", dim_key="did",
                               dim_attrs=["attr"])
    with pytest.raises(ValueError, match="dim changelog lacks attrs"):
        incremental_join_merge(view, flog_no_fk.withColumn("fk", F.lit(1)),
                               dlog.drop("attr"), dim,
                               fact_key="fid", fk="fk", dim_key="did",
                               dim_attrs=["attr"])
