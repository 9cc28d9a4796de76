"""Edge-case tests for the round-3 curation operators (the oracle gate
covers the happy path on real tables; these pin the boundary semantics
on tiny constructed frames)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_duplicate_spans_ignores_short_docs(spark):
    """Documents with < 8 tokens contribute no 8-gram spans."""
    from spark_fuse_spark.catalog import load_all  # noqa: F401  (registers)
    from spark_fuse_spark.functions.hashing import portable_hash64
    from spark_fuse_spark.functions.text import tokens

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),  # 7 tokens: no gram
            (2, "a b c d e f g h i"),  # 9 tokens: 2 grams
            (3, "a b c d e f g h i"),  # identical: shared grams
        ],
        "doc_id long, text string",
    )
    t = docs.select("doc_id", tokens("text").alias("t")).where(F.size("t") >= 8)
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-7), i -> concat_ws(' ', slice(t, i, 8)))"
            )
        ).alias("gram"),
    )
    shared = (
        grams.select("doc_id", portable_hash64("gram").alias("h"))
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )
    assert shared.count() == 2  # the two 8-gram windows of docs 2 and 3
    assert grams.where(F.col("doc_id") == 1).count() == 0


def test_forward_fill_leading_nulls_stay_null(spark):
    """A user whose first readings are masked has no prior good value —
    filled_value stays NULL until the first good reading."""
    from pyspark.sql import Window

    rows = [
        (1, 10, "error", 5.0),
        (2, 10, "click", 1.0),
        (3, 10, "error", 9.0),
        (4, 10, "view", 2.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, value double")
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r["event_id"]: r["filled"]
        for r in ev.select(
            "event_id", F.last(masked, ignorenulls=True).over(w).alias("filled")
        ).collect()
    }
    assert out == {1: None, 2: 1.0, 3: 1.0, 4: 2.0}


def test_key_skew_profile_values(spark):
    """share and skew_ratio on a constructed skewed key distribution."""
    from spark_fuse_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 8 + [("warm",)] * 3 + [("cold",)] * 1, "k string"
    )
    prof = {r["key"]: r for r in key_skew_profile(df, "k", top_n=2).collect()}
    assert set(prof) == {"hot", "warm"}
    assert prof["hot"]["rank"] == 1 and prof["hot"]["cnt"] == 8
    assert prof["hot"]["share"] == pytest.approx(8 / 12, abs=1e-6)
    # 3 distinct keys, 12 rows → uniform key = 4 rows; hot is 2× that
    assert prof["hot"]["skew_ratio"] == pytest.approx(2.0, abs=1e-6)


def test_interval_join_stream_batch_semantics(spark):
    """Batch path of the stream-stream join: only views within the
    5-minute lookback (inclusive both ends) match."""
    import datetime as dt

    from spark_fuse_spark import streaming as st

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta
    mk = lambda eid, ts, et: (eid, ts, 1, et, 1.0, None)
    ev = spark.createDataFrame(
        [
            mk(1, base, "view"),  # 10 min before click: outside
            mk(2, base + s(minutes=6), "view"),  # 4 min before: inside
            mk(3, base + s(minutes=10), "click"),
            mk(4, base + s(minutes=11), "view"),  # after click: outside
        ],
        st.EVENT_SCHEMA,
    )
    out = st.interval_join_stream(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "view"),
        lookback="5 minutes",
    ).collect()
    assert [(r["event_id"], r["matched_event_id"]) for r in out] == [(3, 2)]


def test_dataset_card_argmax_tie_is_deterministic(spark):
    """Equal language counts break lexicographically-last via the
    zero-padded composite ordering key."""
    df = spark.createDataFrame(
        [("en",), ("en",), ("fr",), ("fr",)], "lang string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    top = (
        df.select("lang", F.count(F.lit(1)).over(w).alias("cnt_lang"))
        .agg(
            F.expr("max_by(lang, format_string('%015d|%s', cnt_lang, lang))").alias(
                "top_lang"
            )
        )
        .collect()[0]["top_lang"]
    )
    assert top == "fr"  # tie on count → lexicographically last wins


def test_truncate_renormalize_zero_prefix_is_null(spark):
    """A vector whose kept prefix is all zeros can't be renormalized —
    the result is NULL, not a division blow-up; a live prefix comes back
    unit-norm."""
    from spark_fuse_spark.functions.vectors import l2_norm, truncate_renormalize

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 3.0, 4.0]), (2, [3.0, 4.0, 0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    out = {
        r["vec_id"]: (r["t"], r["n"])
        for r in df.select(
            "vec_id",
            truncate_renormalize("v", 2).alias("t"),
            F.round(l2_norm(truncate_renormalize("v", 2)), 6).alias("n"),
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2][0] == pytest.approx([0.6, 0.8]) and out[2][1] == 1.0


def test_sample_frames_stride_and_cap(spark):
    """Stride keeps indices 0,2,4…; max_frames caps kept frames per doc."""
    from spark_fuse_spark.operators.multimodal import sample_frames

    frames = spark.createDataFrame(
        [(1, i) for i in range(10)], "doc_id long, frame_index long"
    )
    kept = sorted(
        r["frame_index"] for r in sample_frames(frames, stride=3).collect()
    )
    assert kept == [0, 3, 6, 9]
    capped = sorted(
        r["frame_index"]
        for r in sample_frames(frames, stride=2, max_frames=3).collect()
    )
    assert capped == [0, 2, 4]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_frames(frames, stride=0)


def test_run_checks_counts_violations(spark):
    """Each check type reports exact violation counts on a frame with
    known defects."""
    from spark_fuse_spark.operators.checks import (
        InRange,
        InSet,
        NotNull,
        Predicate,
        RefIntegrity,
        Unique,
        run_checks,
    )

    df = spark.createDataFrame(
        [
            (1, 5.0, "A", 100),
            (2, -1.0, "X", 100),   # range + set violations
            (None, 2.0, "N", 200), # null id; orphan parent ref
            (1, 99.0, "R", None),  # dup id; range violation; null ref ok
        ],
        "id long, v double, flag string, parent_id long",
    )
    parent = spark.createDataFrame([(100,)], "pid long")
    res = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in run_checks(
            df,
            [
                NotNull("id"),
                InRange("v", 0.0, 10.0),
                InSet("flag", ("A", "N", "R")),
                Predicate("v_nonneg", F.col("v") >= 0),
                Unique(("id",)),
                RefIntegrity("parent_id", parent, "pid", broadcast_parent=True),
            ],
        ).collect()
    }
    assert res["not_null:id"] == (1, False)
    assert res["in_range:v[0.0,10.0]"] == (2, False)
    assert res["in_set:flag"] == (1, False)
    assert res["predicate:v_nonneg"] == (1, False)
    assert res["unique:id"] == (2, False)  # both rows of the dup key count
    assert res["ref_integrity:parent_id->pid"] == (1, False)
    assert all(r[0] >= 0 for r in res.values()) and len(res) == 6


def test_assign_shards_range_and_determinism(spark):
    from spark_fuse_spark.operators.layout import assign_shards

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = assign_shards(df, "doc_id", 8).collect()
    assert all(0 <= r.shard_id < 8 for r in a)
    b = {r.doc_id: r.shard_id for r in assign_shards(df, "doc_id", 8).collect()}
    assert all(b[r.doc_id] == r.shard_id for r in a)
    # a different salt re-deals membership
    c = {r.doc_id: r.shard_id for r in assign_shards(df, "doc_id", 8, salt="e1").collect()}
    assert any(c[r.doc_id] != r.shard_id for r in a)


def test_shard_manifest_shares_sum_to_one(spark):
    import pytest

    from spark_fuse_spark.operators.layout import assign_shards, shard_manifest

    df = spark.range(1000).withColumnRenamed("id", "doc_id").withColumn(
        "w", F.lit(3)
    )
    m = shard_manifest(df, "doc_id", 4, weight_col="w").collect()
    assert len(m) == 4
    assert sum(r.n_rows for r in m) == 1000
    assert sum(r.total_weight for r in m) == 3000
    assert sum(r.load_share for r in m) == pytest.approx(1.0, abs=1e-4)
    # uniform ids hash evenly: every shard within 25% of ideal
    assert all(0.75 <= r.skew_ratio <= 1.25 for r in m)
    with pytest.raises(ValueError):
        assign_shards(df, "doc_id", 0)


def test_script_mix_detects_cjk_dominance(spark):
    """The synthetic corpus is all-Latin, so the CJK branch is pinned here
    on constructed text (driver oracle covers the arithmetic parity)."""
    from spark_fuse_spark.catalog import load_all  # noqa: F401  (registers)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "深度学习模型训练数据 ok"), (2, "mostly english text 中")],
        "doc_id long, text string",
    )
    n = F.length("text").cast("long")
    latin = n - F.length(F.regexp_replace("text", "[A-Za-z]", "")).cast("long")
    cjk = n - F.length(F.regexp_replace("text", r"[\x{4e00}-\x{9fff}]", "")).cast("long")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            latin.alias("latin"),
            cjk.alias("cjk"),
            F.when(cjk > latin, F.lit("cjk")).otherwise(F.lit("latin")).alias("dom"),
        ).collect()
    }
    assert out[1].cjk == 10 and out[1].dom == "cjk"
    assert out[2].cjk == 1 and out[2].dom == "latin"


def test_write_sharded_one_file_per_shard(spark, tmp_path):
    from spark_fuse_spark.operators.layout import assign_shards, write_sharded

    df = spark.range(500).withColumnRenamed("id", "doc_id").withColumn(
        "payload", F.col("doc_id") * 2
    )
    out = str(tmp_path / "sharded")
    write_sharded(df, out, "doc_id", 8)
    import os

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, d
    back = spark.read.parquet(out)
    assert back.count() == 500
    # membership matches assign_shards exactly (deterministic reproduce)
    want = {r.doc_id: r.shard_id for r in assign_shards(df, "doc_id", 8).collect()}
    got = {r.doc_id: r.shard_id for r in back.collect()}
    assert got == want


def test_path_to_conversion_matches_python_brute_force(spark):
    """Session paths, conversion flags, and the top-k ranking equal a
    dict-based pure-Python sessionizer over the same events."""
    import collections

    import duckdb

    from spark_fuse_spark.catalog import load_all
    from spark_fuse_spark.catalog.curation_events import _PATH_CAP, _PATH_TOPK

    sf = "/root/testdata/sf0.001"
    ev = duckdb.sql(
        f"SELECT user_id, event_id, ts, event_type FROM "
        f"read_parquet('{sf}/events.parquet') ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = collections.defaultdict(list)
    for u, eid, ts, et in ev:
        by_user[u].append((ts, eid, et))
    paths = collections.Counter()
    users = collections.defaultdict(set)
    for u, seq in by_user.items():
        sessions, cur, prev = [], [], None
        for ts, eid, et in seq:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev = ts
        sessions.append(cur)
        for s in sessions:
            if "purchase" in s:
                p = ">".join(s[:_PATH_CAP])
                paths[p] += 1
                users[p].add(u)
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPK]

    rows = load_all()["e_path_to_conversion"].spark(spark, sf).collect()
    assert [(r.path, r.n_sessions) for r in rows] == expect
    for r in rows:
        assert r.n_users == len(users[r.path])
