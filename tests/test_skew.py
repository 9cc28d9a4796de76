"""Salting rewrites must be result-identical to the naive plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # one hot key (90%) + a long tail
    hot = spark.range(0, 900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("t"), F.col("id") % 10).alias("k"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(_skewed_df(spark), ["k"], {"a": ("v", "avg")})


def test_salted_join_inner_and_left(spark):
    probe = _skewed_df(spark)
    build = spark.createDataFrame(
        [("HOT", 1.5), ("t1", 2.0), ("missing", 9.9)], ["k", "w"]
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["v"], r["w"]) for r in probe.join(build, "k", how).collect()
        )
        salted = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(probe, build, ["k"], n_salts=4, how=how).collect()
        )
        assert salted == plain and len(plain) > 0


def test_salted_join_rejects_build_preserving(spark):
    probe = _skewed_df(spark)
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(probe, probe, ["k"], how="full")
