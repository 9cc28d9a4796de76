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
