"""Property-based tests for the time-ordered curation operators: random
event sequences through the real Spark windows vs a pure-Python model.
Catches ordering, tie, and boundary edge cases example tests miss."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

# (user_id, minutes offset, masked?) — offsets may collide across users but
# are made unique per user via the event_id tiebreak in both implementations
event_strategy = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=5000),
    st.booleans(),
)
events_strategy = st.lists(event_strategy, min_size=1, max_size=25)


def _frame(spark, events):
    rows = [
        (i, u, BASE + dt.timedelta(minutes=m), None if masked else float(i))
        for i, (u, m, masked) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
def test_forward_fill_matches_model(spark, events):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["event_id"]: r["filled"]
        for r in _frame(spark, events)
        .select("event_id", F.last("value", ignorenulls=True).over(w).alias("filled"))
        .collect()
    }
    # model: sort each user's rows by (ts, event_id), carry last non-null
    want = {}
    by_user: dict = {}
    for i, (u, m, masked) in enumerate(events):
        by_user.setdefault(u, []).append((m, i, None if masked else float(i)))
    for u, rows in by_user.items():
        carry = None
        for _, i, v in sorted(rows):
            carry = v if v is not None else carry
            want[i] = carry
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
def test_gap_sessionization_matches_model(spark, events):
    """Session boundaries at >30-minute gaps: per-user session count and
    sizes equal a pure-Python pass."""
    df = _frame(spark, events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_ts = F.lag("ts").over(w)
    breaks = F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")
    got = sorted(
        (r["user_id"], r["session_idx"], r["n"])
        for r in df.select(
            "user_id",
            "ts",
            F.when(prev_ts.isNull() | breaks, 1).otherwise(0).alias("new_s"),
            "event_id",
        )
        .select("user_id", "event_id", F.sum("new_s").over(run).alias("session_idx"))
        .groupBy("user_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = []
    by_user: dict = {}
    for i, (u, m, _) in enumerate(events):
        by_user.setdefault(u, []).append((m, i))
    for u, rows in by_user.items():
        sess, n, last = 0, 0, None
        sizes = []
        for m, _ in sorted(rows):
            if last is None or (m - last) > 30:
                if n:
                    sizes.append(n)
                sess += 1
                n = 0
            n += 1
            last = m
        sizes.append(n)
        want += [(u, idx + 1, sz) for idx, sz in enumerate(sizes)]
    assert got == sorted(want)


# random frames for the data-quality suite: ids with nulls and dups,
# doubles straddling the [0, 10] range bound
check_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=1, max_value=5)),
        st.floats(min_value=-5, max_value=15, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=check_rows)
def test_run_checks_matches_model(spark, rows):
    from spark_fuse_spark.operators.checks import InRange, NotNull, Unique, run_checks

    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "id long, v double"
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in run_checks(
            df, [NotNull("id"), InRange("v", 0.0, 10.0), Unique(("id",))]
        ).collect()
    }
    ids = [i for i, _ in rows]
    vals = [v for _, v in rows]
    from collections import Counter

    dup_rows = sum(c for c in Counter(ids).values() if c > 1)
    want = {
        "not_null:id": sum(1 for i in ids if i is None),
        "in_range:v[0.0,10.0]": sum(1 for v in vals if v < 0.0 or v > 10.0),
        "unique:id": dup_rows,
    }
    assert got == want
