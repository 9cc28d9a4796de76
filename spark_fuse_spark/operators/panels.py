"""Scalar-panel attachment: the safe form of the 1-row broadcast cross join.

The stats/curation catalog leans on one idiom dozens of times: compute a
handful of corpus-wide scalars (a cutoff timestamp, grand totals, moment
sums) as a ONE-ROW aggregate, then ``crossJoin(F.broadcast(panel))`` so
every row can see them — the distributed replacement for "collect the
scalar to the driver and re-literal it" that keeps plans collect-free.

A cross join is only safe under that 1-row precondition; against a
multi-row DataFrame it is a cartesian bomb.  ``attach_scalar_panel``
makes the precondition structural: it refuses (at PLAN time, before any
execution) unless the panel's logical plan provably yields at most one
row — a global aggregate (no grouping expressions), a ``limit(<=1)``, a
literal 1-row relation — walking through projections/filters/aliases.
The repo-wide plan gates (``tests/test_plans.py``) prohibit unvetted
cartesian products across the whole catalog; this operator is how new
code complies by construction.
"""

from __future__ import annotations

import warnings
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["scalar_panel", "attach_scalar_panel", "prefix_panel"]

# unary nodes that preserve "at most one row" from their child
_PASSTHROUGH = {"Project", "SubqueryAlias", "Filter", "Sort", "ResolvedHint"}

# one warning per process per degradation reason class — a Connect-style
# session calls attach_scalar_panel hundreds of times per catalog run and
# the guidance doesn't change between calls
_UNVALIDATED_WARNED: set = set()


def _yields_at_most_one_row(jplan) -> bool:
    name = jplan.getClass().getSimpleName()
    while name in _PASSTHROUGH:
        jplan = jplan.children().head()
        name = jplan.getClass().getSimpleName()
    if name == "Aggregate":
        # global aggregate: no grouping expressions => exactly one row
        return jplan.groupingExpressions().isEmpty()
    if name == "OneRowRelation":
        return True
    if name in ("GlobalLimit", "LocalLimit"):
        try:
            return int(str(jplan.limitExpr().eval(None))) <= 1
        except Exception:
            return False
    if name == "LocalRelation":
        try:
            return jplan.data().size() <= 1
        except Exception:
            return False
    if name == "Join":
        # a join of two scalar panels is itself a scalar panel
        return all(
            _yields_at_most_one_row(jplan.children().apply(i))
            for i in range(jplan.children().size())
        )
    return False


def _plan_handle(panel: DataFrame):
    """The JVM DataFrame handle, or None where none exists (Spark Connect)."""
    return getattr(panel, "_jdf", None)


def scalar_panel(df: DataFrame, *aggs: Column) -> DataFrame:
    """One-row panel of corpus-wide scalars: ``df.agg(*aggs)``, named so
    call sites read as intent (*this is a panel, not a reduction step*)."""
    return df.agg(*aggs)


def attach_scalar_panel(
    df: DataFrame, panel: DataFrame, *, validate: bool = True
) -> DataFrame:
    """Broadcast-attach a one-row scalar panel to every row of ``df``.

    Raises ``ValueError`` at plan time when ``panel``'s logical plan is
    inspectable and provably NOT <=1 row (global aggregate, ``limit(1)``,
    1-row literal relation, or joins/projections thereof all pass).
    ``validate=False`` skips the structural check for panel shapes the
    walker cannot classify — the caller then owns the 1-row guarantee.

    On sessions where plan inspection is unavailable — Spark Connect has
    no ``_jdf`` JVM handle, and py4j surface drift can break the walker —
    the check degrades to a ``RuntimeWarning`` instead of failing: the
    validation is a guard rail for developers, and a query that was
    correct as a plain broadcast crossJoin must not start hard-failing
    because the runtime cannot prove what the author already knows.

    **Spark Connect gets NO 1-row enforcement**: without a JVM plan
    handle a genuinely multi-row panel will silently multiply every row
    of ``df`` via the crossJoin.  The degradation warns ONCE per process
    per reason (not per call) so catalog-scale runs aren't drowned in
    repeats; where a handle exists, ``validate=True`` still hard-fails.
    """
    if validate:
        problem = None
        jdf = _plan_handle(panel)
        if jdf is None:  # Spark Connect: no JVM plan handle exists
            problem = "no _jdf plan handle on this session (Spark Connect?)"
        else:
            try:
                ok = _yields_at_most_one_row(jdf.queryExecution().analyzed())
            except Exception as exc:  # py4j surface drift — degrade, loudly
                problem = f"could not inspect the panel plan ({exc!r})"
        if problem is not None:
            reason_class = problem.split("(")[0]
            if reason_class not in _UNVALIDATED_WARNED:
                _UNVALIDATED_WARNED.add(reason_class)
                warnings.warn(
                    f"attach_scalar_panel cannot validate the 1-row panel "
                    f"precondition: {problem}; proceeding unvalidated — the "
                    "caller owns the 1-row guarantee (warned once per "
                    "process; this session gets no cartesian enforcement)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        elif not ok:
            raise ValueError(
                "attach_scalar_panel requires a provably single-row panel "
                "(global aggregate / limit(1) / 1-row literal relation); "
                "got a plan that may yield multiple rows — a cross join "
                "against it would be a cartesian product. Aggregate first, "
                "or pass validate=False if you own the 1-row guarantee."
            )
    return df.crossJoin(F.broadcast(panel))


def prefix_panel(
    df: DataFrame, cols: Sequence[str], sums: Sequence[str], *, list_col: str = "l"
) -> DataFrame:
    """One-row panel: sorted cell list + exact inclusive prefix-sum arrays.

    The stats/econometrics catalog's recurring two-phase prefix idiom
    (``q_gains_table``, ``q_isotonic_calibration``,
    ``q_revenue_concentration``, ``q_weighted_deciles``): collapse a
    BOUNDED set of cells into one row, sort it, and fold running sums so
    downstream closed-form math (NTILE tiles, PAVA blocks, Lorenz/Gini
    shares) reads prefix totals by index instead of re-scanning the
    corpus or opening an unpartitioned window.

    ``cols`` are the cell fields — ``sort_array`` orders by struct-field
    position, so list ``cols`` with the sort key(s) first.  ``sums``
    names the integer fields to prefix-fold.  Output columns:

    * ``list_col``  — ``array<struct<cols...>>``, ascending;
    * ``pre_<f>``   — ``array<long>``, the INCLUSIVE left-to-right
      prefix sums of field ``f`` (``pre_f[i] = Σ_{j<=i} l[j].f``);
    * ``tot_<f>``   — ``long``, the grand total (last prefix, 0 when
      the frame is empty).

    Determinism/overflow discipline, pinned here once for every call
    site: the fold accumulator initializes as ``long`` so int cells
    widen BEFORE any addition, and the fold is a single left-to-right
    pass — exact integer arithmetic, no float order sensitivity.  (The
    fold appends via ``concat(acc.arr, array(...))``, which copies the
    accumulator per element, so total copy work is O(B²) — harmless for
    the bounded few-hundred-cell panels this serves, and still one
    ADDITION per cell; what it avoids is per-index slice
    re-AGGREGATION, which would be O(B²) additions.)  The result is a
    1-row panel in the
    :func:`attach_scalar_panel` sense; the panel never sees corpus rows,
    only the pre-aggregated cells (keep B bounded — a few hundred cells,
    not a per-row list).
    """
    panel = df.agg(F.sort_array(F.collect_list(F.struct(*cols))).alias(list_col))

    def _merge(f: str):
        # closure factory, NOT a default-arg capture: a third parameter
        # would make pyspark bind this as a 3-arg (value, index) lambda
        return lambda acc, x: F.struct(
            F.concat(acc["arr"], F.array(acc["run"] + x[f])).alias("arr"),
            (acc["run"] + x[f]).alias("run"),
        )

    pre_cols = [
        F.aggregate(
            F.col(list_col),
            F.struct(
                F.array().cast("array<long>").alias("arr"),
                F.lit(0).cast("long").alias("run"),
            ),
            _merge(f),
            lambda acc: acc["arr"],
        ).alias(f"pre_{f}")
        for f in sums
    ]
    panel = panel.select(F.col(list_col), *pre_cols)
    tot_cols = [
        F.coalesce(
            F.try_element_at(F.col(f"pre_{f}"), F.lit(-1)), F.lit(0).cast("long")
        ).alias(f"tot_{f}")
        for f in sums
    ]
    return panel.select("*", *tot_cols)
