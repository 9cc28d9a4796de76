"""Unit tests for operators/survival.py and operators/panels.py —
the round-6 promotions of the K-M fold and the 1-row panel idiom.
The catalog queries (e_survival_curve / e_weibull_fit) pin the same
implementations against the DuckDB oracle; these tests pin the
operator contracts directly on hand-computed inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.operators.panels import attach_scalar_panel, scalar_panel
from spark_fuse_spark.operators.survival import km_survival, weibull_from_km


# ------------------------------------------------------------ km_survival
def test_km_survival_hand_computed(spark):
    # 4 subjects: events at t=1, t=2, t=3; one censored at t=2.
    subj = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1)], ["duration", "event"]
    )
    rows = km_survival(subj).collect()
    got = [(r.duration, r.n_risk, r.n_events, r.survival) for r in rows]
    # t=1: 4 at risk, 1 event          -> S = 3/4
    # t=2: 3 at risk, 1 event (1 cens) -> S = 3/4 * 2/3 = 1/2
    # t=3: 1 at risk, 1 event          -> S = 0
    assert got == [(1, 4, 1, 0.75), (2, 3, 1, 0.5), (3, 1, 1, 0.0)]


def test_km_survival_censored_only_steps_are_skipped(spark):
    # a duration with only censored exits consumes risk but emits no row
    subj = spark.createDataFrame([(1, 0), (1, 0), (2, 1)], ["duration", "event"])
    rows = km_survival(subj).collect()
    assert [(r.duration, r.n_risk, r.n_events, r.survival) for r in rows] == [
        (2, 1, 1, 0.0)
    ]


def test_km_survival_no_rounding_option(spark):
    subj = spark.createDataFrame([(1, 1), (1, 1), (2, 1)], ["duration", "event"])
    rows = km_survival(subj, round_digits=None).orderBy("duration").collect()
    assert rows[0].survival == pytest.approx(1 / 3, abs=1e-12)


# --------------------------------------------------------- weibull_from_km
def test_weibull_recovers_known_parameters(spark):
    # exact Weibull survival S(t) = exp(-(t/10)^2): shape 2, scale 10
    pts = [(float(t), math.exp(-((t / 10.0) ** 2))) for t in range(1, 9)]
    km = spark.createDataFrame(pts, ["duration", "survival"])
    row = weibull_from_km(km).collect()[0]
    assert row.n_points == 8
    assert row.shape_k == pytest.approx(2.0, abs=1e-5)
    assert row.scale == pytest.approx(10.0, abs=0.01)
    assert row.r2 == pytest.approx(1.0, abs=1e-6)


def test_weibull_uninformative_steps_excluded_and_min_points(spark):
    # S=1 and S=0 rows carry no linearization info; with only 2 usable
    # points the fit refuses (no row) rather than dividing by near-zero
    km = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 0.8), (3.0, 0.5), (4.0, 0.0)], ["duration", "survival"]
    )
    assert weibull_from_km(km).count() == 0
    assert weibull_from_km(km, min_points=2).collect()[0].n_points == 2


# ------------------------------------------------------ attach_scalar_panel
def test_attach_scalar_panel_global_aggregate(spark):
    df = spark.range(10)
    panel = scalar_panel(df, F.max("id").alias("mx"), F.count("*").alias("n"))
    out = attach_scalar_panel(df, panel)
    assert out.count() == 10
    assert out.select(F.max("mx"), F.max("n")).collect()[0][:] == (9, 10)


def test_attach_scalar_panel_accepts_limit1_filter_and_join(spark):
    df = spark.range(5)
    # limit(1)
    assert attach_scalar_panel(df, spark.range(100).limit(1)).count() == 5
    # filter over a global aggregate (<=1 row)
    panel = df.agg(F.sum("id").alias("s")).where(F.col("s") > 0)
    assert attach_scalar_panel(df, panel).count() == 5
    # join of two scalar panels
    two = df.agg(F.min("id").alias("lo")).crossJoin(df.agg(F.max("id").alias("hi")))
    assert attach_scalar_panel(df, two).select(F.max("lo"), F.max("hi")).collect()[
        0
    ][:] == (0, 4)


def test_attach_scalar_panel_rejects_multi_row(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="single-row panel"):
        attach_scalar_panel(df, spark.range(3))
    with pytest.raises(ValueError, match="single-row panel"):
        attach_scalar_panel(df, df.groupBy("id").count())  # grouped agg: N rows
    # explicit opt-out still works (caller owns the guarantee)
    assert attach_scalar_panel(df, spark.range(1), validate=False).count() == 5


def test_attach_scalar_panel_degrades_when_uninspectable(spark, monkeypatch):
    """Spark Connect has no _jdf handle, and py4j drift can break the plan
    walker — validation must degrade to a RuntimeWarning, not fail a query
    that is correct as a plain broadcast crossJoin (round-6 ADVICE)."""
    from spark_fuse_spark.operators import panels

    df = spark.range(5)
    # even a MULTI-row panel passes when inspection is unavailable — the
    # caller owns the guarantee, exactly like validate=False
    panel = df.agg(F.max("id").alias("mx"))

    monkeypatch.setattr(panels, "_plan_handle", lambda _p: None)
    with pytest.warns(RuntimeWarning, match="Spark Connect"):
        out = attach_scalar_panel(df, panel)
    assert out.count() == 5
    monkeypatch.undo()

    def _boom(_jplan):
        raise RuntimeError("py4j drift")

    monkeypatch.setattr(panels, "_yields_at_most_one_row", _boom)
    with pytest.warns(RuntimeWarning, match="could not inspect"):
        out = attach_scalar_panel(df, panel)
    assert out.count() == 5
    monkeypatch.undo()

    # with inspection intact, the multi-row rejection still hard-fails
    with pytest.raises(ValueError, match="single-row panel"):
        attach_scalar_panel(df, spark.range(3))


# ------------------------------------------------------------ prefix_panel
def test_prefix_panel_values_and_types(spark):
    from spark_fuse_spark.operators.panels import prefix_panel

    df = spark.createDataFrame(
        [(3, 10, 1), (1, 5, 0), (2, 7, 2)], "k int, n int, pos int"
    )
    row = prefix_panel(df, ["k", "n", "pos"], ["n", "pos"]).collect()[0]
    assert [c["k"] for c in row.l] == [1, 2, 3]  # sorted by first field
    assert row.pre_n == [5, 12, 22]  # inclusive left-to-right prefixes
    assert row.pre_pos == [0, 2, 3]
    assert row.tot_n == 22 and row.tot_pos == 3
    # overflow-widening discipline: int cells fold in long space
    schema = prefix_panel(df, ["k", "n"], ["n"]).schema
    assert schema["pre_n"].dataType.simpleString() == "array<bigint>"
    assert schema["tot_n"].dataType.simpleString() == "bigint"


def test_prefix_panel_empty_and_long_overflow(spark):
    from spark_fuse_spark.operators.panels import prefix_panel

    empty = spark.createDataFrame([], "k int, n int")
    row = prefix_panel(empty, ["k", "n"], ["n"]).collect()[0]
    assert row.l == [] and row.pre_n == [] and row.tot_n == 0
    # int cells that sum past 2^31 must not wrap (the widening pin)
    big = spark.createDataFrame(
        [(i, 2_000_000_000) for i in range(3)], "k int, n int"
    )
    row = prefix_panel(big, ["k", "n"], ["n"]).collect()[0]
    assert row.tot_n == 6_000_000_000
