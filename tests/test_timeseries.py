"""Boundary semantics for the time-grid resampler (the oracle gate covers
the happy path over the events table; these pin gap/edge behavior on
constructed frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_fuse_spark.operators.timeseries import resample_time_grid, time_bucket


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_gap_hours_are_materialized_and_filled(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:05:00"), 10.0),
            (1, _ts("2024-01-01 00:35:00"), 20.0),  # same bucket: mean 15
            (1, _ts("2024-01-01 03:10:00"), 40.0),  # hours 01,02 are gaps
        ],
        "user_id long, ts timestamp, value double",
    )
    out = (
        resample_time_grid(df, "user_id", "ts", "value", 3600)
        .orderBy("bucket_ts")
        .collect()
    )
    assert [r.bucket_ts.hour for r in out] == [0, 1, 2, 3]
    assert [r.value for r in out] == [15.0, None, None, 40.0]
    assert [r.filled_value for r in out] == [15.0, 15.0, 15.0, 40.0]
    assert [r.is_observed for r in out] == [True, False, False, True]


def test_single_event_key_yields_one_bucket(spark):
    df = spark.createDataFrame(
        [(7, _ts("2024-03-01 12:59:59"), 3.5)],
        "user_id long, ts timestamp, value double",
    )
    out = resample_time_grid(df, "user_id", "ts", "value", 3600).collect()
    assert len(out) == 1
    assert out[0].bucket_ts == _ts("2024-03-01 12:00:00")
    assert out[0].value == 3.5 and out[0].is_observed


def test_mean_is_exact_on_rounding_ties(spark):
    # 39.78 + 39.79 averages to exactly 39.785 — a tie IEEE round breaks
    # differently per engine; micro-unit integer math keeps it exact.
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:01"), 39.78),
            (1, _ts("2024-01-01 00:00:02"), 39.79),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = resample_time_grid(df, "user_id", "ts", "value", 3600).collect()
    assert out[0].value == 39.785


def test_time_bucket_epoch_alignment(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 10:44:00"),)], "ts timestamp"
    ).select(time_bucket("ts", 900).alias("b"))
    assert df.collect()[0].b == _ts("2024-01-01 10:30:00")


def test_independent_keys_do_not_share_spans(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (2, _ts("2024-01-05 00:00:00"), 2.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = resample_time_grid(df, "user_id", "ts", "value", 3600)
    # each key's grid spans only its own [first, last] bucket: 1 row each,
    # not a shared 4-day grid
    assert out.count() == 2
    assert out.where(F.col("value").isNull()).count() == 0


def test_watermark_audit_batch_semantics(spark):
    from spark_fuse_spark.operators.timeseries import watermark_audit

    rows = [
        (0, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-01 10:10:00")),
        (2, _ts("2024-01-01 09:55:00")),  # vs wm 10:05 -> late by 600s
        (3, _ts("2024-01-01 10:20:00")),
        (4, _ts("2024-01-01 10:01:00")),  # vs wm 10:15 -> late by 840s
        (5, _ts("2024-01-01 10:30:00")),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {
        r.batch_id: r
        for r in watermark_audit(df, "ts", "event_id", 300, batch_rows=2).collect()
    }
    assert out[0].watermark_ts is None and out[0].n_late == 0
    assert out[1].watermark_ts == _ts("2024-01-01 10:05:00")
    assert out[1].n_late == 1 and out[1].max_lateness_sec == 600
    assert out[2].watermark_ts == _ts("2024-01-01 10:15:00")
    assert out[2].n_late == 1 and out[2].max_lateness_sec == 840


def test_watermark_audit_ordered_stream_drops_nothing(spark):
    from spark_fuse_spark.operators.timeseries import watermark_audit

    rows = [(i, _ts("2024-01-01 10:00:00") + dt.timedelta(minutes=i)) for i in range(9)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = watermark_audit(df, "ts", "event_id", 0, batch_rows=3).collect()
    assert sum(r.n_late for r in out) == 0


def test_merge_intervals_islands(spark):
    from spark_fuse_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(
        [
            # doc 1: [1,3]+[2,5] overlap, [6,8] touches (adjacent), [15,16] apart
            (1, 1, 3), (1, 2, 5), (1, 6, 8), (1, 15, 16),
            # doc 2: single interval
            (2, 4, 9),
        ],
        "doc_id long, start long, end long",
    )
    out = sorted(
        merge_intervals(df, "doc_id").collect(),
        key=lambda r: (r.doc_id, r.region_start),
    )
    got = [(r.doc_id, r.region_start, r.region_end, r.n_intervals) for r in out]
    assert got == [(1, 1, 8, 3), (1, 15, 16, 1), (2, 4, 9, 1)]


def test_merge_intervals_gap_of_two_does_not_merge(spark):
    from spark_fuse_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(
        [(1, 1, 3), (1, 5, 6)], "doc_id long, start long, end long"
    )
    assert merge_intervals(df, "doc_id").count() == 2


def test_merge_intervals_randomized_against_python_model(spark):
    """200 random intervals across 20 keys, ONE Spark job, compared to a
    reference python sweep-line merge (same touching-merge semantics)."""
    import random

    rng = random.Random(42)
    rows = []
    for key in range(20):
        for _ in range(10):
            s = rng.randint(0, 60)
            rows.append((key, s, s + rng.randint(0, 12)))

    def model(intervals):
        out = []
        for s, e in sorted(intervals):
            if out and s <= out[-1][1] + 1:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return [(s, e) for s, e in out]

    from spark_fuse_spark.operators.timeseries import merge_intervals

    df = spark.createDataFrame(rows, "k long, start long, end long")
    got: dict[int, list] = {}
    for r in merge_intervals(df, "k").collect():
        got.setdefault(r.k, []).append((r.region_start, r.region_end))
    for key in range(20):
        want = model([(s, e) for k, s, e in rows if k == key])
        assert sorted(got[key]) == want, f"key {key}"


def test_resample_and_audit_handle_empty_input(spark):
    from spark_fuse_spark.operators.timeseries import (
        resample_time_grid,
        watermark_audit,
    )

    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert resample_time_grid(empty, "user_id", "ts", "value", 3600).count() == 0
    empty_e = spark.createDataFrame([], "event_id long, ts timestamp")
    assert watermark_audit(empty_e, "ts", "event_id", 60).count() == 0


def test_apply_span_cuts_edges(spark):
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.timeseries import apply_span_cuts

    toks = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e"]),   # cut [2,3] -> a d e
            (2, ["x", "y"]),                   # no regions -> untouched
            (3, ["q", "r", "s"]),              # cut [1,3] -> everything
        ],
        "doc_id long, t array<string>",
    )
    regions = spark.createDataFrame(
        [(1, 2, 3, 1), (3, 1, 3, 1)],
        "doc_id long, region_start long, region_end long, n_intervals long",
    )
    out = {r.doc_id: r for r in apply_span_cuts(toks, regions).collect()}
    assert out[1].cleaned_text == "a d e" and out[1].removed_tokens == 2
    assert out[2].cleaned_text == "x y" and out[2].removed_tokens == 0
    assert out[3].cleaned_text == "" and out[3].removed_tokens == 3
    assert all(out[d].n_tokens == n for d, n in [(1, 5), (2, 2), (3, 3)])
