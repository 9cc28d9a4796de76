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

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["scalar_panel", "attach_scalar_panel"]

# unary nodes that preserve "at most one row" from their child
_PASSTHROUGH = {"Project", "SubqueryAlias", "Filter", "Sort", "ResolvedHint"}


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
            warnings.warn(
                f"attach_scalar_panel cannot validate the 1-row panel "
                f"precondition: {problem}; proceeding unvalidated — the "
                "caller owns the 1-row guarantee",
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
