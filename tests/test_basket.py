"""Market-basket association rules: hand-computed metrics on a tiny
basket set, duplicate-line collapsing, and the mega-basket guard."""

from __future__ import annotations

from spark_fuse_spark.operators.basket import association_rules, basket_pairs


def _baskets(spark):
    # b1: {x, y}; b2: {x, y}; b3: {x, z}; b4: {y} — with a duplicate
    # (b1, x) line that must collapse before pairing
    rows = [
        (1, "x"), (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    return spark.createDataFrame(rows, ["basket", "item"])


def test_pair_counts_and_min_support(spark):
    df = _baskets(spark)
    pairs = {(r.item_a, r.item_b): r.pair_count
             for r in basket_pairs(df, "basket", "item", min_support=1).collect()}
    assert pairs == {("x", "y"): 2, ("x", "z"): 1}
    kept = basket_pairs(df, "basket", "item", min_support=2).collect()
    assert [(r.item_a, r.item_b) for r in kept] == [("x", "y")]


def test_association_metrics_hand_computed(spark):
    df = _baskets(spark)
    rules = {(r.item_a, r.item_b): r
             for r in association_rules(df, "basket", "item", min_support=1).collect()}
    xy = rules[("x", "y")]
    # 4 baskets; x in 3, y in 3, xy in 2
    assert xy.pair_count == 2 and xy.count_a == 3 and xy.count_b == 3
    assert xy.support == 0.5
    assert round(xy.confidence_a_to_b, 6) == round(2 / 3, 6)
    assert round(xy.lift, 6) == round(2 * 4 / (3 * 3), 6)


def test_mega_basket_guard_drops_oversized(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    pairs = basket_pairs(df, "basket", "item", min_support=1, max_basket_size=2)
    assert {(r.item_a, r.item_b) for r in pairs.collect()} == {("x", "y")}
