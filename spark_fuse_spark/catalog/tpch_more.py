"""TPC-H completion suite: the nine shapes q02..q21 not yet in the catalog.

Each query keeps the *operator shape* of its TPC-H namesake while adapting
to the driver's reduced schemas (no ``partsupp``, no
``l_commitdate/l_receiptdate/l_shipmode`` — see TESTDATA.md):

* q02 — correlated MIN subquery: cheapest supplier per part (window min
  over an aggregated pair table, the modern Spark answer to Q2's
  correlated scalar subquery);
* q09 — profit by nation/year: 5-way join + LIKE filter on part name;
* q11 — important parts: grouped value with a HAVING over a *global*
  scalar aggregate (share-of-total threshold);
* q12 — ship-class priority counts: CASE-sum conditional aggregation
  over a derived lateness class;
* q15 — top supplier: aggregated revenue view + equality with its MAX
  (global scalar subquery);
* q16 — supplier count: NOT-IN exclusion subquery + COUNT(DISTINCT);
* q19 — disjunctive brand/size/quantity predicate bands (single-row);
* q20 — nested semi-join: suppliers over an aggregated-HAVING IN
  subquery, region-restricted;
* q21 — waiting suppliers: EXISTS + NOT-EXISTS double correlated
  subquery (left_semi + left_anti in Spark).

Scale notes: every dim join (part, supplier, nation, region) broadcasts;
the wide shuffles are the fact-side aggregations, which all partial-agg
map-side first.  q21's two self-joins of ``lineitem`` are equi-joins on
``l_orderkey`` — at 100 TB they sort-merge on the same key, so one
exchange of each side feeds both the semi and anti probes; AQE handles
the skewed multi-line orders.  q02's per-part min is a window over the
*aggregated* (part, supplier) table — orders of magnitude smaller than
the fact table, so the window shuffle is cheap; the equality filter is
on raw (un-arithmetic) doubles, so cross-engine comparison is exact.

Reference parity: extends the reference's join/agg surface
(``notebooks/tutorials/05_spark_dataframe_joins.ipynb``,
``04_spark_sql_vs_pyspark.ipynb``) to the full TPC-H shape list per
SURVEY.md §7.1 milestone 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


def _rev():
    # lazy: Column construction needs an active SparkContext and catalog
    # modules import during pytest collection
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q02_min_price_supplier",
    oracle="""
WITH pairs AS (
  SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS pair_price
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
  GROUP BY l.l_partkey, l.l_suppkey
)
SELECT s.s_name, n.n_name AS nation, pr.l_partkey AS p_partkey, p.p_name,
       ROUND(pr.pair_price, 2) AS min_price
FROM pairs pr
JOIN (SELECT l_partkey, MIN(pair_price) AS best FROM pairs GROUP BY l_partkey) m
  ON pr.l_partkey = m.l_partkey AND pr.pair_price = m.best
JOIN supplier s ON pr.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN part p     ON pr.l_partkey = p.p_partkey
ORDER BY min_price, p_partkey, s_name
""",
    doc="TPC-H Q2 shape: correlated MIN subquery — cheapest supplier per "
    "STANDARD mid-size part, resolved as a window min over the aggregated "
    "(part, supplier) pair table.  Equality on raw doubles is exact: both "
    "engines take MIN over the identical parquet values, no arithmetic.",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    pairs = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("pair_price"))
    )
    best = pairs.withColumn(
        "best", F.min("pair_price").over(Window.partitionBy("l_partkey"))
    ).where(F.col("pair_price") == F.col("best"))
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(p.select("p_partkey", "p_name")),
            best.l_partkey == F.col("p_partkey"),
        )
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.round("pair_price", 2).alias("min_price"),
        )
        .orderBy("min_price", "p_partkey", "s_name")
    )


@register(
    "q09_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.5 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 shape: five-table join with LIKE part-name filter; "
    "profit proxy = revenue minus 0.5*retailprice*qty (no partsupp "
    "supplycost in the reduced schema).  part/supplier/nation broadcast; "
    "the orders join is fact-to-fact equi on l_orderkey.",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        # sum in exact decimal: the profit expression subtracts two
        # same-magnitude products, so a double sum can land a half-cent
        # boundary one ulp apart from the oracle's; per-row decimal(18,6)
        # cast of the IDENTICAL double is engine-stable, and decimal
        # addition is exact on both sides
        .agg(
            F.round(F.sum(F.col("profit").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle="""
WITH vals AS (
  SELECT l.l_partkey, SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey
)
SELECT l_partkey, ROUND(value, 2) AS value
FROM vals
WHERE value > (SELECT 0.001 * SUM(value) FROM vals)
ORDER BY value DESC, l_partkey
""",
    doc="TPC-H Q11 shape: grouped value with HAVING over a global scalar "
    "aggregate — parts whose ASIA-supplied value exceeds 0.1% of the "
    "total.  The scalar total is a broadcast cross-join of a 1-row "
    "aggregate; the per-part agg is the only wide shuffle.",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value"))
    )
    total = vals.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        vals.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_shipclass_priority",
    oracle="""
SELECT l.l_returnflag,
       CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE year(l.l_shipdate) = 1997
GROUP BY l_returnflag, ship_class
ORDER BY l_returnflag, ship_class
""",
    doc="TPC-H Q12 shape: conditional CASE-sum aggregation over a derived "
    "lateness class (shipdate > orderdate + 90 days stands in for the "
    "missing commit/receipt dates).  One fact-fact equi-join, one "
    "grouped agg with map-side partials.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(F.year("l_shipdate") == 1997)
    o = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        "LATE",
    ).otherwise("ONTIME")
    return (
        li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .select("l_returnflag", ship_class.alias("ship_class"), high.alias("high"))
        .groupBy("l_returnflag", "ship_class")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag", "ship_class")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15 shape: aggregated revenue view + equality with its MAX "
    "(global scalar subquery).  Revenue is rounded to 2 decimals BEFORE "
    "the max-compare on both sides, so the equality is on identical "
    "representable values.",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    s = load_table(spark, sf, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best"))
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape: NOT-IN exclusion subquery (left_anti against the "
    "negative-balance supplier set, broadcast) + COUNT(DISTINCT) per "
    "(brand, type, size).  The distinct-agg is the only wide shuffle.",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf, "lineitem")
    bad = load_table(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 5 AND 15)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 11 AND 25
       AND l.l_quantity BETWEEN 15 AND 30)
   OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 26 AND 40
       AND l.l_quantity BETWEEN 25 AND 45)
""",
    doc="TPC-H Q19 shape: three-way disjunctive brand/size/quantity "
    "predicate bands over a part join, single-row revenue.  The "
    "part-side brand/size conjuncts are NOT pushable through the OR "
    "individually, but the join stays broadcast and the common "
    "l_quantity range [5,45] could be pushed as a bounding predicate at "
    "100 TB (left to Catalyst constraint propagation).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(5, 15)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(11, 25)
        & F.col("l_quantity").between(15, 30)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(26, 40)
        & F.col("l_quantity").between(25, 45)
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .where(band)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q20_promo_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO' AND year(l.l_shipdate) = 1996
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 300)
ORDER BY s_suppkey
""",
    doc="TPC-H Q20 shape: nested semi-join — ASIA suppliers whose 1996 "
    "PROMO-part shipments exceed a quantity threshold, via an "
    "aggregated-HAVING IN subquery (left_semi in Spark).  The subquery "
    "aggregates the fact table once; supplier/nation/region broadcast.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    li = load_table(spark, sf, "lineitem").where(F.year("l_shipdate") == 1996)
    p = load_table(spark, sf, "part").where(F.col("p_type") == "PROMO")
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o   ON l1.l_orderkey = o.o_orderkey
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
""",
    doc="TPC-H Q21 shape: EXISTS + NOT-EXISTS double correlated subquery "
    "— EUROPE suppliers who were the SOLE late shipper (>60 days after "
    "order date, standing in for receipt-vs-commit) in multi-supplier "
    "finished orders.  Spark plan: left_semi (another supplier exists in "
    "the order) then left_anti (no OTHER supplier was late) — both "
    "equi-joins on l_orderkey, so at 100 TB one exchange of lineitem "
    "feeds both probes; supplier/nation/region broadcast.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").where(F.col("r_name") == "EUROPE")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # late lines of finished orders (the l1 base, and the l3 probe side)
    late_f = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .where(late)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late_f.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    base = (
        late_f.join(
            others,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), base.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
