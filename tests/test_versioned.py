"""VersionedParquetStore: commit linearity, time travel, rollback,
vacuum reference counting, and SCD protocols running on the backend."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from spark_fuse_spark.cdc import VersionedParquetStore, get_store


@pytest.fixture()
def store():
    return VersionedParquetStore()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_overwrite_append_and_time_travel(spark, store, tmp_path):
    t = str(tmp_path / "t")
    a = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    b = spark.createDataFrame([(3, "c")], ["id", "v"])

    assert not store.exists(spark, t)
    store.overwrite(a, t)
    assert store.exists(spark, t) and store.latest_version(t) == 1
    store.append(b, t)
    assert store.latest_version(t) == 2

    assert _rows(store.read(spark, t)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(store.read_version(spark, t, 1)) == [(1, "a"), (2, "b")]
    ops = [m["op"] for m in store.history(t)]
    assert ops == ["overwrite", "append"]


def test_append_reuses_segments_without_rewrite(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(spark.createDataFrame([(1,)], ["id"]), t)
    seg_v1 = store.history(t)[0]["segments"]
    store.append(spark.createDataFrame([(2,)], ["id"]), t)
    m2 = store.history(t)[1]
    assert seg_v1[0] in m2["segments"] and len(m2["segments"]) == 2


def test_rollback_is_append_only(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(spark.createDataFrame([(1,)], ["id"]), t)
    store.overwrite(spark.createDataFrame([(9,)], ["id"]), t)
    v3 = store.rollback(t, 1)
    assert v3 == 3 and store.latest_version(t) == 3
    assert _rows(store.read(spark, t)) == [(1,)]
    # v2 content is still readable — rollback rewrote nothing
    assert _rows(store.read_version(spark, t, 2)) == [(9,)]


def test_vacuum_keeps_referenced_segments(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(spark.createDataFrame([(1,)], ["id"]), t)   # v1 seg A
    store.overwrite(spark.createDataFrame([(2,)], ["id"]), t)   # v2 seg B
    store.rollback(t, 1)                                        # v3 -> seg A
    store.append(spark.createDataFrame([(3,)], ["id"]), t)      # v4 seg A+C
    deleted = store.vacuum(t, keep_last=2)
    # v3/v4 both reference seg A; only v2's seg B is unreferenced
    assert len(deleted) == 1
    assert _rows(store.read(spark, t)) == [(1,), (3,)]
    assert _rows(store.read_version(spark, t, 3)) == [(1,)]
    with pytest.raises(ValueError):
        store.read_version(spark, t, 2)
    # no orphan segment dirs remain
    segs = {n for n in os.listdir(t) if n.startswith("seg_")}
    live = {s for m in store.history(t) for s in m["segments"]}
    assert segs == live


def test_scd1_runs_on_versioned_backend(spark, tmp_path):
    from spark_fuse_spark.cdc import current_only_upsert

    t = str(tmp_path / "scd1")
    store = get_store("versioned")
    b1 = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    b2 = spark.createDataFrame([(2, "Y"), (3, "z")], ["k", "v"])
    current_only_upsert(spark, b1, t, business_keys=["k"], store=store)
    current_only_upsert(spark, b2, t, business_keys=["k"], store=store)
    got = {(r.k, r.v) for r in store.read(spark, t).select("k", "v").collect()}
    assert got == {(1, "x"), (2, "Y"), (3, "z")}
    # every upsert committed a version; the first state is still readable
    assert store.latest_version(t) >= 2
    v1 = {(r.k, r.v) for r in store.read_version(spark, t, 1).select("k", "v").collect()}
    assert v1 == {(1, "x"), (2, "y")}


def test_cli_table_commands(spark, tmp_path, capsys):
    from spark_fuse_spark.cli import main

    t = str(tmp_path / "clit")
    store = VersionedParquetStore()
    store.overwrite(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    store.append(spark.createDataFrame([(2, "b")], ["id", "v"]), t)

    assert main(["table", "history", "--path", t]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and '"op": "append"' in out[1]

    assert main(["table", "rollback", "--path", t, "--version", "1"]) == 0
    assert store.latest_version(t) == 3
    assert main(["table", "vacuum", "--path", t, "--keep", "2"]) == 0
    assert main(["table", "rollback", "--path", t]) == 2


def test_stream_to_scd_on_versioned_store(spark, tmp_path):
    """Streaming CDC lands on the versioned backend: every non-empty
    micro-batch commits a version, and intermediate states stay
    time-travelable."""
    import spark_fuse_spark.streaming as st

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], ["k", "v", "seq"]
    ).coalesce(1).write.parquet(os.path.join(src, "batch0"))
    spark.createDataFrame(
        [(2, "B", 2), (3, "c", 2)], ["k", "v", "seq"]
    ).coalesce(1).write.parquet(os.path.join(src, "batch1"))

    target = str(tmp_path / "scd")
    store = get_store("versioned")
    stream = spark.readStream.schema("k long, v string, seq long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        st.stream_to_scd(
            stream, target, ["k"], mode="scd1",
            checkpoint=str(tmp_path / "ck"), store=store,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    assert store.latest_version(target) is not None
    final = {(r.k, r.v) for r in store.read(spark, target).select("k", "v").collect()}
    assert final == {(1, "a"), (2, "B"), (3, "c")}
    # at least one intermediate version exists and is readable
    if store.latest_version(target) >= 2:
        first = {(r.k, r.v) for r in store.read_version(spark, target, 1)
                 .select("k", "v").collect()}
        assert first <= final | {(2, "b")}


def test_versioned_store_random_op_sequence_matches_model(spark, tmp_path):
    """Seeded random overwrite/append/rollback sequence vs a pure-Python
    model of per-version content; every historical version stays
    readable until vacuumed."""
    import random

    rng = random.Random(23)
    t = str(tmp_path / "model")
    store = VersionedParquetStore()
    versions: list[list[int]] = []  # model: content (list of ids) per version
    next_id = 0

    for _ in range(12):
        op = rng.choice(["overwrite", "append", "rollback"] if versions else ["overwrite"])
        if op == "overwrite":
            batch = list(range(next_id, next_id + rng.randint(1, 3))); next_id += len(batch)
            store.overwrite(spark.createDataFrame([(i,) for i in batch], ["id"]), t)
            versions.append(list(batch))
        elif op == "append":
            batch = list(range(next_id, next_id + rng.randint(1, 3))); next_id += len(batch)
            store.append(spark.createDataFrame([(i,) for i in batch], ["id"]), t)
            versions.append(versions[-1] + batch)
        else:
            v = rng.randint(1, len(versions))
            store.rollback(t, v)
            versions.append(list(versions[v - 1]))

    assert store.latest_version(t) == len(versions)
    for v, want in enumerate(versions, start=1):
        got = sorted(r.id for r in store.read_version(spark, t, v).collect())
        assert got == sorted(want), f"v{v}"
    # vacuum keeps the last 3 readable and exact
    store.vacuum(t, keep_last=3)
    for v in range(len(versions) - 2, len(versions) + 1):
        got = sorted(r.id for r in store.read_version(spark, t, v).collect())
        assert got == sorted(versions[v - 1])


def test_stream_versioned_batch_parity_per_commit(spark, tmp_path):
    """End-to-end round trip: file stream → stream_to_scd on the versioned
    store → time-travel reads.  The SAME micro-batches applied in batch
    mode to a second versioned target must produce an IDENTICAL table
    state at EVERY commit — batch==stream per version, not just at the
    end (a replayed/reordered stream would break an intermediate version
    long before it breaks the final state)."""
    import spark_fuse_spark.streaming as st
    from spark_fuse_spark.cdc import apply_change_tracking

    ts = "to_timestamp('2024-01-01 00:00:00')"
    batches = [
        [(1, "a", 1), (2, "b", 1)],
        [(2, "B", 2), (3, "c", 2)],
        [(1, "A", 3), (4, "d", 3)],
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["k", "v", "seq"]).coalesce(1).write.parquet(
            os.path.join(src, f"batch{i}")
        )

    s_target, b_target = str(tmp_path / "stream_t"), str(tmp_path / "batch_t")
    s_store, b_store = get_store("versioned"), get_store("versioned")
    stream = (
        spark.readStream.schema("k long, v string, seq long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        st.stream_to_scd(
            stream, s_target, ["k"], mode="scd1",
            checkpoint=str(tmp_path / "ck"), store=s_store, load_ts_expr=ts,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    for rows in batches:
        apply_change_tracking(
            spark, spark.createDataFrame(rows, ["k", "v", "seq"]),
            b_target, ["k"], mode="scd1", store=b_store, load_ts_expr=ts,
        )

    n = b_store.latest_version(b_target)
    assert s_store.latest_version(s_target) == n == len(batches)
    for v in range(1, n + 1):
        sv = {
            (r.k, r.v, r.seq)
            for r in s_store.read_version(spark, s_target, v).select("k", "v", "seq").collect()
        }
        bv = {
            (r.k, r.v, r.seq)
            for r in b_store.read_version(spark, b_target, v).select("k", "v", "seq").collect()
        }
        assert sv == bv, f"version {v}: stream {sv} != batch {bv}"
    assert {(r.k, r.v) for r in s_store.read(spark, s_target).select("k", "v").collect()} == {
        (1, "A"), (2, "B"), (3, "c"), (4, "d")
    }


def test_concurrent_commit_fails_loudly(spark, store, tmp_path, monkeypatch):
    """Two writers that both observed version 1 race to commit version 2:
    the loser must fail with a clear error, not silently overwrite the
    winner's manifest (os.link O_EXCL semantics; os.rename would
    replace)."""
    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    store.overwrite(df, target)  # version 1
    # rival lands version 2 first...
    from spark_fuse_spark.cdc.versioned import _manifest_path

    rival = _manifest_path(target, 2)
    rival_body = '{"version": 2, "op": "append", "segments": [], "committed_at": 0}'
    with open(rival, "w") as f:
        f.write(rival_body)
    # ...while OUR writer still believes the latest is 1 (stale read —
    # the exact race the O_EXCL link guards)
    monkeypatch.setattr(type(store), "latest_version", lambda self, t: 1)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        store.append(df, target)
    monkeypatch.undo()
    # the winner's manifest is untouched and still the latest
    assert store.latest_version(target) == 2
    assert open(rival).read() == rival_body


def test_append_schema_mismatch_fails_loudly(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(spark.range(5).select(F.col("id").alias("k")), t)
    widened = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("extra"))
    with pytest.raises(ValueError, match="merge_schema=True"):
        store.append(widened, t)


def test_append_merge_schema_evolves_and_time_travels(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(spark.range(3).select(F.col("id").alias("k")), t)
    widened = spark.range(3, 5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    )
    store.append(widened, t, merge_schema=True)
    live = store.read(spark, t)
    # the evolved column surfaces, null-filled on the old segment — not
    # silently dropped by single-footer schema inference
    assert set(live.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in live.collect()}
    assert rows[0] is None and rows[3] == 30 and len(rows) == 5
    # time travel to v1 shows the original narrow schema
    assert store.read_version(spark, t, 1).columns == ["k"]
    # a further SAME-schema append keeps working and stays evolved
    store.append(
        spark.range(5, 6).select(F.col("id").alias("k"), (F.col("id") * 10).alias("extra")),
        t,
        merge_schema=True,
    )
    assert store.read(spark, t).count() == 6
    # rollback carries the evolution flag (read still merges footers)
    v = store.rollback(t, 2)
    assert set(store.read_version(spark, t, v).columns) == {"k", "extra"}


def test_append_type_evolution_rejected_up_front(spark, store, tmp_path):
    t = str(tmp_path / "t")
    store.overwrite(
        spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("v")), t
    )
    # same column name, different type: a (name, type) union would commit a
    # duplicate-name schema that only explodes later as an opaque parquet
    # mergeSchema error — the append itself must refuse with a clear message
    retyped = spark.range(3, 5).select(
        F.col("id").alias("k"), F.lit("s").alias("v")
    )
    with pytest.raises(ValueError, match="type evolution unsupported"):
        store.append(retyped, t, merge_schema=True)
    # the table is untouched and still readable
    assert store.read(spark, t).count() == 3
