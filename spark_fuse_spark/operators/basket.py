"""Market-basket co-occurrence mining: support / confidence / lift.

The classic association-rule primitives (Agrawal & Srikant 1994, "Fast
Algorithms for Mining Association Rules" — the a-priori counting step)
re-expressed as DataFrame joins: which items appear together in the same
basket more often than chance?  In an LLM-data context the same shape
answers "which sources/domains co-occur in the same near-dup cluster"
or "which tags co-fire on the same document"; here it runs over TPC-H
order baskets.

Scale shape — this is an INVERTED-INDEX self-join, never all-pairs:

* distinct (basket, item) pairs first — one hash aggregate, map-side
  partial, kills within-basket duplicate lines before any join;
* the self-join is equi on the basket key, so pair expansion happens
  only WITHIN a basket (shuffle O(lines), pair cost Σ per-basket k²
  with k = basket size, bounded by the largest basket — identical cost
  model to ``dedup.ngram_jaccard_pairs``'s shingle-bucket join);
* the ``item_a < item_b`` predicate halves the expansion and canonises
  pair identity;
* per-item counts and the basket total are tiny aggregates broadcast
  back onto the pair relation for confidence/lift.

Skew note: at 100 TB a pathological mega-basket (one basket with 10⁶
items) would quadratically dominate; ``max_basket_size`` drops such
baskets up front (standard practice — a basket that large carries no
association signal), keeping per-key expansion bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["basket_pairs", "association_rules"]


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: "int | None" = None,
) -> DataFrame:
    """Co-occurrence pair counts: ``item_a, item_b, pair_count`` for
    unordered item pairs sharing a basket, kept at
    ``pair_count >= min_support``."""
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    if max_basket_size is not None:
        sizes = items.groupBy("__basket").agg(F.count("*").alias("__bsz"))
        items = (
            items.join(sizes, "__basket")
            .where(F.col("__bsz") <= max_basket_size)
            .drop("__bsz")
        )
    a = items.select("__basket", F.col("__item").alias("item_a"))
    b = items.select("__basket", F.col("__item").alias("item_b"))
    return (
        a.join(b, "__basket")
        .where(F.col("item_a") < F.col("item_b"))
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
) -> DataFrame:
    """Pair-level association metrics over :func:`basket_pairs`.

    Output per unordered pair: ``item_a, item_b, pair_count, count_a,
    count_b, support, confidence_a_to_b, lift`` where support =
    pair_count / n_baskets, confidence(a→b) = pair_count / count_a and
    lift = support / (P(a)·P(b)).  Lift > 1 means the pair co-occurs
    more than independence predicts.

    The item-frequency relation aggregates to |items| rows and the
    basket total to ONE row — both broadcast onto the pair relation, so
    the only large shuffles are the pair groupBy itself.
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    pairs = basket_pairs(df, basket_col, item_col, min_support, max_basket_size)
    item_counts = items.groupBy(F.col("__item")).agg(F.count("*").alias("__n"))
    totals = items.select(F.countDistinct("__basket").alias("__n_baskets"))
    ca = item_counts.select(F.col("__item").alias("item_a"), F.col("__n").alias("count_a"))
    cb = item_counts.select(F.col("__item").alias("item_b"), F.col("__n").alias("count_b"))
    return (
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
