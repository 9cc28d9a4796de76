"""v_pca_power vs an independent numpy replay + spectral sanity bounds."""
from __future__ import annotations

import numpy as np

from spark_fuse_spark.catalog import load_all

SF = "/root/testdata/sf0.001"
SCALE = 1_048_576
ITERS = 6  # keep in sync with catalog/vectors_events._PCA_ITERS


def _numpy_state():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    q = np.floor(x * SCALE + 0.5)
    n = q.shape[0]
    cn = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    return n, cn


def test_pca_power_matches_numpy_round_replay(spark):
    """The op has BOUNDED-ROUND semantics (like x_kcore / LPA): it reports
    the ITERS-round power-iteration state, not the eigh fixpoint.  An
    independent numpy replay of the same rounds must land on the same
    loadings and Rayleigh value."""
    n, cn = _numpy_state()
    v = np.full(64, 0.125)
    lam_sim = None
    for _ in range(ITERS):
        w = cn @ v
        lam_sim = float(v @ w)
        v = w / np.sqrt(float(w @ w))
    out = load_all()["v_pca_power"].spark(spark, SF).orderBy("dim").collect()
    got_v = np.array([r["loading"] for r in out])
    assert np.allclose(got_v, v, atol=2e-6), np.abs(got_v - v).max()
    # the query reports lambda floored at 1e-4 display precision; compare
    # the simulated value through the same quantizer
    den = n * n * float(2**40)
    want_disp = np.floor(lam_sim / den * 10000 + 0.5) / 10000
    assert out[0]["eigenvalue"] == want_disp


def test_pca_power_rayleigh_brackets_spectrum(spark):
    """Spectral sanity: the Rayleigh estimate converges to lambda_max from
    below and must already dominate the spectrum's bulk."""
    n, cn = _numpy_state()
    vals = np.linalg.eigvalsh(cn)
    out = load_all()["v_pca_power"].spark(spark, SF).limit(1).collect()
    lam = out[0]["eigenvalue"] * (n * n * float(2**40))
    # display flooring only ever lowers the estimate, preserving from-below
    assert lam <= vals[-1] * (1 + 1e-9)
    # deterministic fixture: 6 rounds reach 0.869 * lambda_1 on this data
    # (the synthetic spectrum is nearly flat at the top: lambda_2/lambda_1
    # = 0.93, the worst case for power iteration); pin a safe floor
    assert lam >= vals[-1] * 0.85


def test_pca_operator_library_surface(spark):
    """The promoted operators/pca.py functions are callable outside the
    catalog registry and behave on synthetic data: the dominant component
    of a corpus varying only along dimension 0 loads ~1.0 on dim 0."""
    import random

    from spark_fuse_spark.operators.pca import (
        pca_dominant_component,
        pca_projection_scores,
    )

    rng = random.Random(7)
    rows = [([rng.uniform(-1, 1), rng.uniform(-0.01, 0.01), 0.0, 0.0], i) for i in range(200)]
    df = spark.createDataFrame(rows, "embedding array<double>, vec_id long")
    comp = {r.dim: r.loading for r in pca_dominant_component(spark, df, dims=4, iters=8).collect()}
    assert abs(abs(comp[0]) - 1.0) < 0.01, comp
    assert all(abs(comp[d]) < 0.1 for d in (1, 2, 3)), comp
    scores = pca_projection_scores(spark, df, dims=4, iters=8)
    assert scores.count() == 200
    # score sign tracks the dim-0 coordinate (component sign is fixed by
    # the all-positive start)
    joined = scores.join(df, "vec_id").collect()
    agree = sum(1 for r in joined if (r.score > 0) == (r.embedding[0] > sum(e[0][0] for e in rows) / 200))
    assert agree >= 195, agree


def test_logistic_gd_operator_recovers_separable_signal(spark):
    """operators/glm.logistic_gd_quantized on a linearly separable feature:
    accuracy beats the majority baseline and the weight sign is right."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.glm import logistic_gd_quantized

    base = spark.range(1000).select(
        (F.col("id") % 21 - 10).cast("long").alias("x")
    ).select("x", F.when(F.col("x") > 0, 1).otherwise(0).alias("y"))
    rep = logistic_gd_quantized(base, "y", "x", steps=6, eta=0.5).collect()[0]
    assert rep.n_rows == 1000
    assert rep.w_0_micro > 0
    assert rep.accuracy > rep.baseline_accuracy


def test_power_iteration_rejects_zero_iters(spark):
    import pytest

    from spark_fuse_spark.operators.pca import power_iteration

    with pytest.raises(ValueError, match="iters >= 1"):
        power_iteration(spark, None, dims=4, iters=0)


def test_pca_single_iter_eigenvalue_scaled_for_any_dims(spark):
    """iters=1's Rayleigh quotient uses the start vector, so the start must
    be unit-norm for EVERY dims (the old 0.125 constant was only right for
    dims=64): on a rank-1 4-dim corpus the uniform unit start's Rayleigh
    quotient is exactly lambda/dims, so lam1/lam8 must sit at ~1/4 — the
    unnormalized 0.125 start would report 1/64 (a further 16x off)."""
    import random

    from spark_fuse_spark.operators.pca import pca_dominant_component

    rng = random.Random(11)
    rows = [([rng.uniform(-1, 1), 0.0, 0.0, 0.0], i) for i in range(100)]
    df = spark.createDataFrame(rows, "embedding array<double>, vec_id long")
    lam1 = pca_dominant_component(spark, df, dims=4, iters=1).collect()[0].eigenvalue
    lam8 = pca_dominant_component(spark, df, dims=4, iters=8).collect()[0].eigenvalue
    assert lam8 > 0
    assert 0.2 < lam1 / lam8 < 0.3, (lam1, lam8)


def test_logistic_gd_degenerate_labels_fail_loudly(spark):
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from spark_fuse_spark.operators.glm import logistic_gd_weights

    base = spark.range(100).select(
        F.col("id").cast("double").alias("x"), F.lit(1).alias("y")
    )
    with pytest.raises(Exception, match="degenerate labels"):
        logistic_gd_weights(base, "y", "x").collect()
