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
