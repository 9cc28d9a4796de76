"""Survival analysis operators: Kaplan-Meier product-limit curves and
closed-form parametric (Weibull) fits over them.

Promoted from the catalog (``e_survival_curve`` / ``e_weibull_fit``,
``catalog/experimentation.py``) so pipelines can run churn/retention/
reliability analysis on their own subject tables; the catalog queries are
now thin wrappers and their DuckDB-oracle hashes pin these
implementations bit-for-bit.

Determinism contract (what makes these cross-engine reproducible):

* all event counts are exact integers; the only doubles are the hazard
  factors and their running product;
* the factor product folds LEFT-TO-RIGHT over the duration-sorted step
  panel (``F.aggregate`` — the same pairwise multiply sequence as
  DuckDB's ``list_reduce``), so the double is bit-identical before the
  final floor-rounding;
* rounding is ``floor(x * 10^d + 0.5) / 10^d`` — half-up, engine-neutral
  (SQL ``ROUND`` ties differ between engines).

Scale shape: one subject-keyed aggregation produces the step panel
(bounded by DISTINCT duration values, not by subjects), which folds in a
SINGLE row — no global window, no per-subject state.  The fold is
O(k^2) in panel size k; coarsen the duration grain (hours -> days ->
weeks) as observation spans grow so the panel, not the corpus, stays the
bounded object.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["km_survival", "weibull_from_km"]


def _floor_round(col: Column, digits: int) -> Column:
    scale = 10**digits
    return F.floor(col * scale + 0.5) / scale


def km_survival(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    *,
    round_digits: "int | None" = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve S(t) from one row per subject.

    ``subjects`` has one row per subject: ``duration_col`` (integer time
    units observed) and ``event_col`` (1 = the event occurred / churned,
    0 = right-censored).  Returns one row per duration at which >=1 event
    occurred: ``duration``, ``n_risk`` (subjects still at risk entering
    that time), ``n_events``, and ``survival`` — the product-limit
    estimator (Kaplan & Meier 1958)::

        S(t) = prod_{t_i <= t, d_i > 0} (1 - d_i / n_i)

    Censored subjects leave the risk set at their duration without
    contributing an event — the standard right-censoring treatment.
    """
    steps = subjects.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(event_col).alias("d"), F.count("*").alias("ended")
    )
    panel = steps.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "ended"))).alias("lst")
    )
    lst = F.col("lst")
    total = F.aggregate(lst, F.lit(0).cast("long"), lambda a, x: a + x["ended"])
    # before_i[i] = subjects whose observation ended strictly before step
    # i: elements 0..i-1 == slice(lst, 1, i) with Spark's 0-based index
    before_i = F.transform(
        lst,
        lambda x, i: F.aggregate(
            F.slice(lst, F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, y: a + y["ended"],
        ),
    )
    arrs = panel.select(
        lst.alias("lst"), total.alias("total"), before_i.alias("before_i")
    )
    factors = F.transform(
        F.col("lst"),
        lambda x, i: F.when(
            x["d"] > 0,
            F.lit(1.0)
            - x["d"].cast("double")
            / (F.col("total") - F.element_at(F.col("before_i"), i + 1)),
        ).otherwise(F.lit(1.0)),
    )
    arrs2 = arrs.select("lst", "total", "before_i", factors.alias("factors"))
    km = arrs2.select(
        "total", "before_i", "factors", F.posexplode("lst").alias("i0", "s")
    )
    # survival(i) = left fold of factors[0..i]; seeding with 1.0 adds one
    # EXACT multiply (1.0 * f1), keeping the pairwise sequence identical
    # to a fold that starts from the first factor.
    surv = F.aggregate(
        F.slice(F.col("factors"), F.lit(1), F.col("i0") + 1),
        F.lit(1.0),
        lambda a, f: a * f,
    )
    if round_digits is not None:
        surv = _floor_round(surv, round_digits)
    return (
        km.where(F.col("s")["d"] > 0)
        .select(
            F.col("s")["t"].alias("duration"),
            (F.col("total") - F.element_at(F.col("before_i"), F.col("i0") + 1)).alias(
                "n_risk"
            ),
            F.col("s")["d"].alias("n_events"),
            surv.alias("survival"),
        )
        .orderBy("duration")
    )


def weibull_from_km(
    km: DataFrame,
    duration_col: str = "duration",
    survival_col: str = "survival",
    *,
    min_points: int = 3,
    round_digits: int = 6,
    scale_round_digits: int = 2,
) -> DataFrame:
    """Closed-form Weibull fit of a Kaplan-Meier curve.

    The Weibull survival function ``S(t) = exp(-(t/lambda)^k)``
    linearizes as ``ln(-ln S) = k*ln t - k*ln lambda``, so shape ``k``
    and scale ``lambda`` come from ordinary least squares over the
    (bounded) step panel; ``r2`` is the Weibull-ness diagnostic
    (k < 1: infant-mortality hazard, k = 1: memoryless/exponential,
    k > 1: wear-out).  Steps with S in {0, 1} or t <= 0 carry no
    information for the linearization and are excluded; panels with
    fewer than ``min_points`` usable steps yield NO row (rather than a
    divide-by-zero) — the caller's signal that the curve is too coarse
    to fit.

    Returns one row: ``n_points``, ``shape_k``, ``scale`` (same time
    unit as ``duration_col``), ``r2``.
    """
    pts = (
        km.where(
            (F.col(duration_col) > 0)
            & (F.col(survival_col) > 0)
            & (F.col(survival_col) < 1)
        )
        .select(
            F.log(F.col(duration_col).cast("double")).alias("x"),
            F.log(-F.log(survival_col)).alias("y"),
        )
        .agg(F.sort_array(F.collect_list(F.struct("x", "y"))).alias("l"))
    )

    def fold(expr: str) -> Column:
        return F.expr(f"aggregate(transform(l, p -> {expr}), 0.0D, (a, b) -> a + b)")

    s = pts.select(
        F.size("l").cast("long").alias("n"),
        fold("p.x").alias("sx"),
        fold("p.y").alias("sy"),
        fold("p.x * p.x").alias("sxx"),
        fold("p.x * p.y").alias("sxy"),
        fold("p.y * p.y").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    k = num / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    r2 = (num * num) / (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    fit = s.where(F.col("n") >= int(min_points)).select(
        "n", k.alias("k"), "sx", "sy", r2.alias("r2")
    )
    scale = F.exp(-((F.col("sy") - F.col("k") * F.col("sx")) / F.col("n")) / F.col("k"))
    return fit.select(
        F.col("n").alias("n_points"),
        _floor_round(F.col("k"), round_digits).alias("shape_k"),
        _floor_round(scale, scale_round_digits).alias("scale"),
        _floor_round(F.col("r2"), round_digits).alias("r2"),
    )
