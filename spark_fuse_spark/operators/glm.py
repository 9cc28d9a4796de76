"""In-engine quantized-gradient GLM fitting.

Promoted from the ``q_logistic_gd`` catalog query so the scan is callable
as a library (the catalog entry is a thin wrapper).  Logistic regression
(any number of integer features) by bounded-round gradient descent with
every piece of shared state quantized to integer micro-units:

* weights live as integer micro-unit longs in a 1-row panel that is
  BROADCAST over each gradient scan — no driver collect, no .rdd, and
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

__all__ = [
    "logistic_gd_weights",
    "logistic_gd_quantized",
    "rational_sigmoid",
    "logit_z",
    "with_logit_probability",
]


def _as_cols(x_cols: "str | list[str]") -> "list[str]":
    return [x_cols] if isinstance(x_cols, str) else list(x_cols)


def rational_sigmoid(z: "F.Column") -> "F.Column":
    """The engine-portable logistic link: sigma(z) ~ 0.5 + 0.5*(z/2)/(1+|z/2|).

    A rational surrogate instead of 1/(1+exp(-z)) so the identical
    arithmetic runs on Spark and any SQL oracle with no exp() overflow
    or libm rounding divergence.  Shared by the GD residual step and
    every downstream scoring scan (calibration, accuracy read-outs)."""
    return 0.5 + 0.5 * (z / 2) / (1 + F.abs(z / 2))


def logit_z(x_cols: "str | list[str]") -> "F.Column":
    """Linear predictor (qb + sum qw_i*x_i)/1e6 over the micro-quantized
    weight panel columns produced by :func:`logistic_gd_weights`."""
    xs = _as_cols(x_cols)
    return (
        F.col("qb")
        + sum(F.col(f"qw_{i}") * F.col(x) for i, x in enumerate(xs))
    ) / 1000000.0


def with_logit_probability(
    base: DataFrame,
    weights: DataFrame,
    x_cols: "str | list[str]",
    prob_col: str = "p_sig",
) -> DataFrame:
    """Score every row of ``base`` against a 1-row weight panel: broadcast
    cross-join (the panel is one row — no shuffle of the fact side) plus a
    rational-sigmoid probability column.  The scoring scan shared by the
    calibration / reliability family."""
    scored = base.crossJoin(F.broadcast(weights))
    return scored.withColumn(prob_col, rational_sigmoid(logit_z(x_cols)))


def logistic_gd_weights(
    base: DataFrame,
    y_col: str = "y",
    x_cols: "str | list[str]" = "x",
    steps: int = 2,
    eta: float = 0.05,
) -> DataFrame:
    """One-row weight panel (n, s_y, qb, qw_0..qw_{K-1}) after ``steps``
    quantized GD passes over ``x_cols`` (a single name or a list) — the
    fitting core, without the accuracy read-out scan (callers that only
    score, e.g. calibration audits, broadcast this panel directly)."""
    xs = _as_cols(x_cols)
    y = F.col(y_col)
    qw_names = [f"qw_{i}" for i in range(len(xs))]
    mo = base.agg(F.count("*").alias("n"), F.sum(y_col).alias("s_y"))
    # degenerate labels (all-0 or all-1 y) make the log-odds init log(0) or
    # a division by zero, which would propagate as a silent all-null fit;
    # assert_true keeps the guard inside the plan (no extra action) and
    # fails the job loudly instead
    labels_ok = F.assert_true(
        (F.col("s_y") > 0) & (F.col("s_y") < F.col("n")),
        F.lit(
            "logistic_gd_weights: degenerate labels — y is all-0 or all-1, "
            "log-odds initialization is undefined"
        ),
    )
    w = mo.select(
        "n",
        "s_y",
        F.when(
            labels_ok.isNull(),
            F.floor(
                F.log(F.col("s_y").cast("double") / (F.col("n") - F.col("s_y")))
                * 1000000
                + 0.5
            ).cast("long"),
        ).alias("qb"),
        *[F.lit(0).cast("long").alias(q) for q in qw_names],
    )
    for _ in range(steps):
        sig = rational_sigmoid(logit_z(xs))
        resid_q = F.floor((sig - y) * 1000000 + 0.5).cast("long")
        g = (
            base.crossJoin(F.broadcast(w))
            .groupBy("n", "s_y", "qb", *qw_names)
            .agg(
                F.sum(resid_q).alias("rs_b"),
                *[
                    F.sum(resid_q * F.col(x)).alias(f"rs_{i}")
                    for i, x in enumerate(xs)
                ],
            )
        )
        w = g.select(
            "n",
            "s_y",
            (
                F.col("qb")
                - F.floor(eta * F.col("rs_b") / F.col("n") + 0.5).cast("long")
            ).alias("qb"),
            *[
                (
                    F.col(q)
                    - F.floor(eta * F.col(f"rs_{i}") / F.col("n") + 0.5).cast("long")
                ).alias(q)
                for i, q in enumerate(qw_names)
            ],
        )
    return w


def logistic_gd_quantized(
    base: DataFrame,
    y_col: str = "y",
    x_cols: "str | list[str]" = "x",
    steps: int = 2,
    eta: float = 0.05,
) -> DataFrame:
    """One-row fit report: (n_rows, w_bias_micro, w_0_micro.., accuracy,
    baseline_accuracy).

    ``base`` must carry an integer 0/1 ``y_col`` and integer (ideally
    centered) features.  The bias starts at the log-odds of the base rate
    (floor-quantized), the weights at 0; ``accuracy`` is the 0/1 accuracy
    of sign(qb + Σ qw_i·x_i) and ``baseline_accuracy`` the majority-class
    rate — report both, so a no-signal feature set reads honestly as
    accuracy == baseline.
    """
    xs = _as_cols(x_cols)
    y = F.col(y_col)
    qw_names = [f"qw_{i}" for i in range(len(xs))]
    w = logistic_gd_weights(base, y_col, xs, steps, eta)
    score = F.col("qb") + sum(F.col(q) * F.col(x) for q, x in zip(qw_names, xs))
    pred = F.when(score >= 0, 1).otherwise(0)
    acc = (
        base.crossJoin(F.broadcast(w))
        .groupBy("n", "s_y", "qb", *qw_names)
        .agg(F.sum(F.when(pred == y, 1).otherwise(0)).alias("n_correct"))
    )
    weight_cols = [F.col("qb").alias("w_bias_micro")] + [
        F.col(q).alias(f"w_{i}_micro") for i, q in enumerate(qw_names)
    ]
    return acc.select(
        F.col("n").alias("n_rows"),
        *weight_cols,
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
