"""In-engine quantized-gradient GLM fitting.

Promoted from the ``q_logistic_gd`` catalog query so the scan is callable
as a library (the catalog entry is a thin wrapper).  Single-feature
logistic regression by bounded-round gradient descent with every piece of
shared state quantized to integer micro-units:

* weights live as (qb, qw) integer micro-unit longs in a 1-row panel that
  is BROADCAST over each gradient scan — no driver collect, no .rdd, and
  the panel algebra is exact integer math, so independent engines (or
  re-partitioned re-runs) walk bit-identical weight trajectories;
* the sigmoid is the rational softsign surrogate
  0.5 + 0.5·(z/2)/(1+|z/2|) — no exp(), whose libm may differ across
  engines — and per-row residuals floor-quantize to micro-units BEFORE the
  sum, making the gradient an order-independent integer aggregate;
* BOUNDED-ROUND semantics (house contract shared with x_kcore/LPA/PCA):
  the caller budgets ``steps``; each step is one corpus scan with a
  map-side-combined integer aggregate.

Scale: per step one scan + one 1-row panel; the accuracy pass is one more
scan.  Nothing grows with the corpus except the scans themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logistic_gd_weights", "logistic_gd_quantized"]


def logistic_gd_weights(
    base: DataFrame,
    y_col: str = "y",
    x_col: str = "x",
    steps: int = 2,
    eta: float = 0.05,
) -> DataFrame:
    """One-row weight panel (n, s_y, qb, qw) after ``steps`` quantized
    GD passes — the fitting core, without the accuracy read-out scan
    (callers that only score, e.g. calibration audits, broadcast this
    panel directly)."""
    y, x = F.col(y_col), F.col(x_col)
    mo = base.agg(F.count("*").alias("n"), F.sum(y_col).alias("s_y"))
    w = mo.select(
        "n",
        "s_y",
        F.floor(
            F.log(F.col("s_y").cast("double") / (F.col("n") - F.col("s_y"))) * 1000000
            + 0.5
        )
        .cast("long")
        .alias("qb"),
        F.lit(0).cast("long").alias("qw"),
    )
    for _ in range(steps):
        z = (F.col("qb") + F.col("qw") * x) / 1000000.0
        sig = 0.5 + 0.5 * (z / 2) / (1 + F.abs(z / 2))
        resid_q = F.floor((sig - y) * 1000000 + 0.5).cast("long")
        g = (
            base.crossJoin(F.broadcast(w))
            .groupBy("n", "s_y", "qb", "qw")
            .agg(
                F.sum(resid_q).alias("rs_b"),
                F.sum(resid_q * x).alias("rs_w"),
            )
        )
        w = g.select(
            "n",
            "s_y",
            (
                F.col("qb")
                - F.floor(eta * F.col("rs_b") / F.col("n") + 0.5).cast("long")
            ).alias("qb"),
            (
                F.col("qw")
                - F.floor(eta * F.col("rs_w") / F.col("n") + 0.5).cast("long")
            ).alias("qw"),
        )
    return w


def logistic_gd_quantized(
    base: DataFrame,
    y_col: str = "y",
    x_col: str = "x",
    steps: int = 2,
    eta: float = 0.05,
) -> DataFrame:
    """One-row fit report: (n_rows, w_bias_micro, w_qty_micro, accuracy,
    baseline_accuracy).

    ``base`` must carry an integer 0/1 ``y_col`` and an integer (ideally
    centered) feature ``x_col``.  The bias starts at the log-odds of the
    base rate (floor-quantized), the weight at 0; ``accuracy`` is the 0/1
    accuracy of sign(qb + qw·x) and ``baseline_accuracy`` the
    majority-class rate — report both, so a no-signal feature reads
    honestly as accuracy == baseline.
    """
    y, x = F.col(y_col), F.col(x_col)
    w = logistic_gd_weights(base, y_col, x_col, steps, eta)
    pred = F.when(F.col("qb") + F.col("qw") * x >= 0, 1).otherwise(0)
    acc = (
        base.crossJoin(F.broadcast(w))
        .groupBy("n", "s_y", "qb", "qw")
        .agg(F.sum(F.when(pred == y, 1).otherwise(0)).alias("n_correct"))
    )
    return acc.select(
        F.col("n").alias("n_rows"),
        F.col("qb").alias("w_bias_micro"),
        F.col("qw").alias("w_qty_micro"),
        (
            F.floor(F.col("n_correct").cast("double") / F.col("n") * 1000000 + 0.5)
            / 1000000
        ).alias("accuracy"),
        (
            F.floor(
                F.greatest(F.col("s_y"), F.col("n") - F.col("s_y")).cast("double")
                / F.col("n")
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("baseline_accuracy"),
    )
