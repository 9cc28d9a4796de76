"""Deletion-vector merge-on-read: delete/read/compact/stats lifecycle."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_fuse_spark.cdc import mor_compact, mor_delete, mor_read, mor_stats, mor_write


def _base(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


def test_delete_read_compact_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    mor_write(_base(spark), t)
    assert mor_read(spark, t, ["k"]).count() == 100

    mor_delete(_base(spark).where("k % 10 = 0").select("k"), t, ["k"])
    live = mor_read(spark, t, ["k"])
    assert live.count() == 90
    assert live.where("k % 10 = 0").count() == 0

    # second sidecar accumulates; overlap with the first is idempotent
    mor_delete(_base(spark).where("k < 25").select("k"), t, ["k"])
    assert mor_read(spark, t, ["k"]).count() == 100 - 25 - 7  # 10,20 overlap

    st = mor_stats(spark, t, ["k"])
    assert st == {
        "base_rows": 100,
        "delete_keys": 32,
        "live_rows": 68,
        "delete_files": 2,
    }

    before = mor_read(spark, t, ["k"]).orderBy("k").collect()
    assert mor_compact(spark, t, ["k"]) == 2
    after = mor_read(spark, t, ["k"]).orderBy("k").collect()
    assert before == after
    # sidecars folded away; base physically shrank
    st2 = mor_stats(spark, t, ["k"])
    assert st2 == {
        "base_rows": 68,
        "delete_keys": 0,
        "live_rows": 68,
        "delete_files": 0,
    }
    assert mor_compact(spark, t, ["k"]) == 0  # nothing to fold


def test_delete_of_absent_keys_is_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    mor_write(_base(spark), t)
    mor_delete(spark.range(500, 510).select(F.col("id").alias("k")), t, ["k"])
    assert mor_read(spark, t, ["k"]).count() == 100


def test_mor_read_plans_broadcast_anti_join(spark, tmp_path):
    t = str(tmp_path / "t")
    mor_write(_base(spark), t)
    mor_delete(_base(spark).where("k < 5").select("k"), t, ["k"])
    plan = mor_read(spark, t, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_overwrite_clears_sidecars(spark, tmp_path):
    t = str(tmp_path / "t")
    mor_write(_base(spark), t)
    mor_delete(_base(spark).where("k < 50").select("k"), t, ["k"])
    mor_write(_base(spark), t)  # fresh base: old deletes must not apply
    assert mor_read(spark, t, ["k"]).count() == 100
    assert not os.path.isdir(str(tmp_path / "t" / "_deletes"))
