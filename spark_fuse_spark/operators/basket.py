"""Market-basket co-occurrence mining: support / confidence / lift.

The classic association-rule primitives (Agrawal & Srikant 1994, "Fast
Algorithms for Mining Association Rules" — the a-priori counting step)
re-expressed as DataFrame ops: which items appear together in the same
basket more often than chance?  In an LLM-data context the same shape
answers "which sources/domains co-occur in the same near-dup cluster"
or "which tags co-fire on the same document"; here it runs over TPC-H
order baskets.

Scale shape — ONE wide shuffle of the fact table, no self-join:

* ``collect_set`` gathers each basket's distinct items in the single
  basket-keyed exchange (map-side partial collection included);
  every downstream relation (pairs, item frequencies, basket total)
  derives from that one aggregated subtree, so the fact table is
  scanned and shuffled once;
* pair expansion is WITHIN-ROW: the sorted item set unrolls to its
  ``k·(k−1)/2`` ordered pairs with nested ``transform``/``slice`` +
  ``explode`` — pure codegen, cost Σ per-basket k², bounded by the
  largest basket, and the only further shuffles carry (item_a, item_b)
  pair rows and |items| frequency rows — both tiny next to the fact;
* the ``item_a < item_b`` canonical order comes free from
  ``array_sort``.

Skew note: at 100 TB a pathological mega-basket (one basket with 10⁶
items) would quadratically dominate; ``max_basket_size`` drops such
baskets right after the aggregate (standard practice — a basket that
large carries no association signal), keeping per-row expansion
bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["basket_item_sets", "basket_pairs", "association_rules"]


def basket_item_sets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: "int | None" = None,
) -> DataFrame:
    """One row per basket with its SORTED distinct item array — the
    single wide aggregate every association relation derives from."""
    out = df.groupBy(F.col(basket_col).alias("__basket")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("__items")
    )
    if max_basket_size is not None:
        out = out.where(F.size("__items") <= max_basket_size)
    return out


def _pair_rows(item_sets: DataFrame) -> DataFrame:
    """Within-row unroll of each sorted item array to its ordered pairs."""
    pairs = F.flatten(
        F.expr(
            "transform(__items, (x, i) -> "
            "transform(slice(__items, i + 2, size(__items) - i - 1), "
            "y -> struct(x AS item_a, y AS item_b)))"
        )
    )
    return item_sets.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.item_a").alias("item_a"), F.col("__p.item_b").alias("item_b")
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: "int | None" = None,
    _item_sets: "DataFrame | None" = None,
) -> DataFrame:
    """Co-occurrence pair counts: ``item_a, item_b, pair_count`` for
    unordered item pairs sharing a basket, kept at
    ``pair_count >= min_support``.

    ``_item_sets`` lets :func:`association_rules` share its aggregated
    basket relation so all consumers reference the identical subtree.
    """
    sets_ = (
        _item_sets
        if _item_sets is not None
        else basket_item_sets(df, basket_col, item_col, max_basket_size)
    )
    return (
        _pair_rows(sets_)
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: "int | None" = None,
    materialize: bool = True,
) -> DataFrame:
    """Pair-level association metrics over :func:`basket_pairs`.

    Output per unordered pair: ``item_a, item_b, pair_count, count_a,
    count_b, support, confidence_a_to_b, lift`` where support =
    pair_count / n_baskets, confidence(a→b) = pair_count / count_a and
    lift = support / (P(a)·P(b)).  Lift > 1 means the pair co-occurs
    more than independence predicts.

    The item-frequency relation aggregates to |items| rows and the
    basket total to ONE row — both broadcast onto the pair relation, so
    after the single basket shuffle only pair/frequency rows move.

    ``materialize=False`` skips the persist/eager-checkpoint sharing and
    returns the raw lazy plan (each consumer re-executes the basket
    subtree) — the plan-inspection escape hatch, since the checkpointed
    default truncates lineage and hides the joins from plan gates and
    executed-metrics readers.
    """
    # persist-share-release: the basket-set aggregation has four
    # consumers (pair expansion, BOTH broadcast item-count legs, the
    # basket total) and the item-count agg two (ca/cb) — alias-renamed /
    # broadcast subtrees get no exchange reuse, so without sharing the
    # basket shuffle ran ~4x.  The small rule table is eagerly
    # checkpointed at the end so the basket-scale blocks release
    # immediately instead of squatting in the shared storage pool.
    from pyspark import StorageLevel

    sets_ = basket_item_sets(df, basket_col, item_col, max_basket_size)
    if materialize:
        sets_ = sets_.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = basket_pairs(
        df, basket_col, item_col, min_support, max_basket_size, _item_sets=sets_
    )
    item_counts = (
        sets_.select(F.explode("__items").alias("__item"))
        .groupBy("__item")
        .agg(F.count("*").alias("__n"))
    )
    totals = sets_.select(F.count("*").alias("__n_baskets"))
    if materialize:
        item_counts = item_counts.persist(StorageLevel.MEMORY_AND_DISK)
    ca = item_counts.select(F.col("__item").alias("item_a"), F.col("__n").alias("count_a"))
    cb = item_counts.select(F.col("__item").alias("item_b"), F.col("__n").alias("count_b"))
    out = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(F.col("pair_count") / F.col("__n_baskets"), 6).alias("support"),
            F.round(F.col("pair_count") / F.col("count_a"), 6).alias("confidence_a_to_b"),
            F.round(
                (F.col("pair_count") * F.col("__n_baskets"))
                / (F.col("count_a") * F.col("count_b")),
                6,
            ).alias("lift"),
        )
    )
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    sets_.unpersist()
    item_counts.unpersist()
    return out
