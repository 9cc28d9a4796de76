"""Extended TPC-H-shaped suite: the join/subquery shapes q01-q10 left out.

Adapted to the driver's reduced schemas (no ``partsupp``, no
``l_shipmode/l_commitdate``, no ``c_phone/o_comment`` — see TESTDATA.md),
keeping each query's *operator shape* intact:

* q07 — nation-pair volume: double nation join + disjunctive pair filter;
* q08 — market share: share-of-total via conditional aggregation;
* q13 — custdist: LEFT outer join + two-level aggregation (zero-order
  customers must appear — the classic outer-join-then-agg shape);
* q14 — promo revenue: conditional ratio aggregate;
* q17 — small-quantity revenue: per-key correlated average (window);
* q18 — large orders: grouped HAVING + semi-ish join + total-order top-k;
* q22 — idle customers: global scalar subquery + anti-join.

Scale notes: dims broadcast; the only wide shuffles are the fact-table
aggregations.  q17's correlated average is a window over l_partkey —
one shuffle, no self-join.  q13's outer join keeps customer as the build
side only at this SF; at 100 TB both sides are fact-scale and AQE picks
sort-merge — which is the right plan there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

def _rev():
    # built lazily: classic PySpark Column construction needs an active
    # SparkContext, and catalog modules import during pytest collection
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


@register(
    "q07_nation_volume",
    oracle="""
SELECT sn AS supp_nation, cn AS cust_nation, yr AS l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT sn.n_name AS sn, cnn.n_name AS cn,
         CAST(year(l.l_shipdate) AS INT) AS yr,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cnn ON c.c_nationkey = cnn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE ((sn.n_name = 'NATION_1' AND cnn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cnn.n_name = 'NATION_1'))
    AND year(l.l_shipdate) IN (1996, 1997))
GROUP BY sn, cn, yr
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 shape: lineitem→orders→customer→nation + supplier→nation "
    "double-dimension join with a disjunctive nation-pair predicate, "
    "grouped by year. All five dims broadcast.",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_n), c.c_nationkey == F.col("cn_key"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), s.s_nationkey == F.col("sn_key"))
        .where(pair & F.year("l_shipdate").isin(1996, 1997))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev(),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q08_market_share",
    oracle="""
SELECT yr AS o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS nation
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cnn ON c.c_nationkey = cnn.n_nationkey
  JOIN region r   ON cnn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND year(o.o_orderdate) IN (1996, 1997))
GROUP BY yr
ORDER BY o_year
""",
    doc="TPC-H Q8 shape: seven-table join, share-of-total by conditional "
    "aggregation (supplier-nation share of ASIA promo volume per year).",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_type") == "PROMO")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    cust_n = n.select("n_nationkey", "n_regionkey")
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_n), c.c_nationkey == cust_n.n_nationkey)
        .join(F.broadcast(r), cust_n.n_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), s.s_nationkey == F.col("sn_key"))
        .where(F.year("o_orderdate").isin(1996, 1997))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), _rev(), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_custdist",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13 shape: LEFT outer join so zero-order customers appear "
    "with c_count = 0, then a second aggregation over the distribution.",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
""",
    doc="TPC-H Q14: promo share of one month's revenue via conditional "
    "ratio aggregate. Part broadcasts; single scan of lineitem with the "
    "date filter pushed to parquet.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM (SELECT l.l_extendedprice, l.l_quantity,
             AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 5)
WHERE l_quantity < 0.5 * avg_qty
""",
    doc="TPC-H Q17 shape: per-partkey correlated average expressed as a "
    "window (one shuffle on l_partkey) instead of a correlated subquery "
    "self-join — same result, half the lineitem scans.",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_size") <= 5)
    w = Window.partitionBy("l_partkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_extendedprice", "l_quantity", "l_partkey")
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       ROUND(o.o_totalprice, 2) AS o_totalprice_r,
       ROUND(t.sum_qty, 2) AS sum_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) t
JOIN orders o   ON t.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice_r DESC, o.o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18: grouped HAVING over lineitem quantities joined back to "
    "orders+customer; top-100 with a total order (price desc, orderkey "
    "tie-break).",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice_r"), "o_orderkey")
        .limit(100)
    )


@register(
    "x_salted_agg",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       CAST(COUNT(l_extendedprice) AS BIGINT) AS n_items,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="skew-mitigation rewrite: two-phase salted aggregation over "
    "(l_returnflag, salt) then l_returnflag — the hot-key groupBy shape "
    "AQE cannot split. The oracle is the PLAIN aggregate, asserting the "
    "rewrite is result-identical (operators/skew.py).",
)
def x_salted(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import salted_agg

    l = load_table(spark, sf, "lineitem")
    out = salted_agg(
        l,
        ["l_returnflag"],
        {
            "sum_price": ("l_extendedprice", "sum"),
            "n_items": ("l_extendedprice", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_price", 2).alias("sum_price"),
        F.col("n_items").cast("long").alias("n_items"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("l_returnflag")


@register(
    "q22_idle_customers",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1995-04-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="TPC-H Q22 shape: global scalar subquery (average positive "
    "balance) + anti-join against early-window orders, grouped totals. "
    "The scalar aggregate is a one-row broadcast; the anti-join shuffles "
    "on custkey (the order-date filter is pushed to the parquet scan).",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").where(F.col("o_orderdate") < "1995-04-01")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
