"""Relational query suite: scans, filters, joins, aggregations, windows,
set ops, subqueries, grouping sets, pivot, and the column toolkit —
each entry doubles as a usage example of the library operator it wraps.

Scale annotations per query explain the intended 100 TB plan shape
(broadcast vs shuffle, pushdown expectations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.columns import cast_columns, rename_columns, with_constants
from ..operators.topk import keep_latest, top_k_per_group
from ..functions.dates import calendar_dimension, split_by_date_formats, time_dimension
from ..tables import load_table
from . import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# Money sums go through decimal(18,6): the inputs are ≤6-decimal values, so
# the decimal cast recovers the exact value and the SUM is exact integer
# arithmetic — bit-identical across engines and partition orders (double
# summation is order-dependent; at 60k+ rows last-ulp noise flips ROUND()
# boundaries and breaks hash equality).
def _dsum(col) -> "F.Column":
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def _dsum_sql(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"


# --------------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       ROUND({_dsum_sql("l_quantity")}, 2)       AS sum_qty,
       ROUND({_dsum_sql("l_extendedprice")}, 2)  AS sum_base_price,
       ROUND({_dsum_sql("l_extendedprice * (1 - l_discount)")}, 2) AS sum_disc_price,
       ROUND({_dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}, 2) AS sum_charge,
       ROUND({_dsum_sql("l_quantity")} / COUNT(*), 4)      AS avg_qty,
       ROUND({_dsum_sql("l_extendedprice")} / COUNT(*), 4) AS avg_price,
       ROUND({_dsum_sql("l_discount")} / COUNT(*), 4)      AS avg_disc,
       COUNT(*)                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 flavor: scan-heavy partial+final hash aggregate. Scale: "
    "filter + 8-col projection push into the parquet scan; two-phase agg on "
    "2 grouping keys → shuffle carries only |groups| rows per partition.",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_dsum(F.col("l_quantity")), 2).alias("sum_qty"),
            F.round(_dsum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(_dsum(disc_price), 2).alias("sum_disc_price"),
            F.round(_dsum(charge), 2).alias("sum_charge"),
            F.round(_dsum(F.col("l_quantity")) / cnt, 4).alias("avg_qty"),
            F.round(_dsum(F.col("l_extendedprice")) / cnt, 4).alias("avg_price"),
            F.round(_dsum(F.col("l_discount")) / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q06_forecast_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 flavor: pure filter + global agg. Scale: all four "
    "predicates push to parquet (row-group pruning on shipdate); no shuffle "
    "beyond the single-row final agg.",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(_dsum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q03_top_revenue_orders",
    oracle="""
SELECT l_orderkey,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 flavor: 3-way join + agg + total-ordered top-10. Scale: "
    "customer is dim-sized → broadcast into orders; orders⋈lineitem shuffles "
    "on orderkey (the natural co-partition key); top-k via TakeOrdered, no "
    "global sort.",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle="""
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="TPC-H Q5 flavor: 6-way star join. Scale: supplier/nation/region/"
    "customer all broadcast; the only big shuffle is orders⋈lineitem on "
    "orderkey. The c_nationkey=s_nationkey local-supplier predicate rides "
    "the broadcast join for free.",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
       n_name, c_mktsegment
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 flavor: revenue lost to returns per customer, top 20. "
    "Scale: returnflag filter pushes to scan; customer/nation broadcast.",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            F.round(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join-type coverage
# --------------------------------------------------------------------------
@register(
    "q_semi_join",
    oracle="""
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
""",
    doc="left-semi join (EXISTS). Scale: semi-join shuffles only the key "
    "column of the probe side; AQE converts to broadcast when the filtered "
    "build side is small.",
)
def q_semi(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(l, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    doc="left-anti join (NOT EXISTS): customers that never ordered.",
)
def q_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_left_join_nullfill",
    oracle="""
SELECT c_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       ROUND(COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0), 2) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    doc="left outer join + null-filled aggregate (reference J5 semantics: "
    "unmatched rows survive with nulls).",
)
def q_left_join(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(_dsum(F.col("o_totalprice")), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "q_full_outer_join",
    oracle="""
WITH a AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     b AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(a.nk, b.nk) AS nationkey,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
FROM a FULL OUTER JOIN b ON a.nk = b.nk
""",
    doc="full outer join of two aggregates with coalesced keys.",
)
def q_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    a = _t(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    b = _t(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        a.join(b, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "q_cross_join_small",
    oracle="""
SELECT r.r_name AS region_name, s.r_name AS other_region
FROM region r CROSS JOIN region s
WHERE r.r_name <> s.r_name
""",
    doc="explicit cross join (dim × dim only — never fact × fact).",
)
def q_cross(spark: SparkSession, sf: str) -> DataFrame:
    r = _t(spark, sf, "region")
    a = r.select(F.col("r_name").alias("region_name"))
    b = r.select(F.col("r_name").alias("other_region"))
    return a.crossJoin(b).filter(F.col("region_name") != F.col("other_region"))


@register(
    "q_range_join",
    oracle="""
SELECT o_orderkey, band_name
FROM orders JOIN (VALUES ('small', 0.0, 50000.0),
                         ('medium', 50000.0, 200000.0),
                         ('large', 200000.0, 1e9)) AS bands(band_name, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
""",
    doc="range (theta) join against a tiny banding table — broadcast-nested-"
    "loop; the band table is always broadcastable.",
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 200000.0), ("large", 200000.0, 1e9)],
        "band_name string, lo double, hi double",
    )
    return o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    ).select("o_orderkey", "band_name")


@register(
    "q_asof_join",
    oracle="""
WITH marks AS (SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-01-01',
                                             INTERVAL 1 YEAR)) AS mark_ts)
SELECT o_orderkey, strftime(mark_ts, '%Y-%m-%d') AS asof_mark
FROM orders
LEFT JOIN marks ON mark_ts <= o_orderdate
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY mark_ts DESC) = 1
""",
    doc="as-of join: latest mark ≤ event time, via range join + keep-latest "
    "window. Scale: marks are tiny → broadcast; the window partitions by "
    "orderkey which is already the join output partitioning.",
)
def q_asof(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    marks = spark.createDataFrame(
        [(f"{y}-01-01 00:00:00",) for y in range(1995, 2002)], "mark string"
    ).select(F.to_timestamp("mark").alias("mark_ts"))
    joined = o.join(F.broadcast(marks), F.col("mark_ts") <= F.col("o_orderdate"), "left")
    w = Window.partitionBy("o_orderkey").orderBy(F.col("mark_ts").desc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_orderkey", F.date_format("mark_ts", "yyyy-MM-dd").alias("asof_mark"))
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------
@register(
    "q_scalar_subquery",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE p_retailprice > 1.2 * (SELECT AVG(p_retailprice) FROM part)
""",
    doc="scalar subquery in predicate (price 20% above mean).",
)
def q_scalar_sub(spark: SparkSession, sf: str) -> DataFrame:
    _t(spark, sf, "part").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, p_brand, p_retailprice FROM part "
        "WHERE p_retailprice > 1.2 * (SELECT AVG(p_retailprice) FROM part)"
    )


@register(
    "q_in_subquery",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
""",
    doc="IN-subquery → semi join on a broadcast dim.",
)
def q_in_sub(spark: SparkSession, sf: str) -> DataFrame:
    _t(spark, sf, "supplier").createOrReplaceTempView("supplier")
    _t(spark, sf, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)"
    )


@register(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 flavor: correlated EXISTS (→ semi join) + agg.",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    _t(spark, sf, "orders").createOrReplaceTempView("orders")
    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------
@register(
    "q_window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_spend
FROM orders
""",
    doc="running total per customer (reference W5). One shuffle on the "
    "partition key, streaming frame evaluation.",
)
def q_running_total(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"), 2).alias("running_spend")
    )


@register(
    "q_window_rolling_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 4) AS rolling_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    doc="rolling 3-row average (reference W6).",
)
def q_rolling_avg(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            4,  # scale 4: frame denominators are 1/2/3, so no .5 rounding ties
        ).alias("rolling_avg")
    )


@register(
    "q_window_dense_rank",
    oracle="""
SELECT c_nationkey, c_custkey,
       CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
            AS INT) AS bal_rank
FROM customer
""",
    doc="dense rank within nation (reference W7); total order via custkey "
    "tie-break.",
)
def q_dense_rank(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_nationkey", "c_custkey", F.dense_rank().over(w).cast("int").alias("bal_rank")
    )


@register(
    "q_dedup_keep_latest",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
""",
    doc="dedup-keep-latest (reference W1/C-group): newest order per "
    "customer via ranking window.",
)
def q_keep_latest(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    latest = keep_latest(o, ["o_custkey"], ["o_orderdate", "o_orderkey"], descending=True)
    return latest.select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate")
    )


@register(
    "q_topk_per_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
FROM orders JOIN customer ON o_custkey = c_custkey
QUALIFY rk <= 3
""",
    doc="top-3 orders per market segment (reference O4/W3/W4 generalized).",
)
def q_topk(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    joined = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    out = top_k_per_group(
        joined,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        descending=None,  # order columns already carry direction
        rank_column="rk",
    )
    return out.select("c_mktsegment", "o_orderkey", "o_totalprice", F.col("rk").cast("int").alias("rk"))


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@register(
    "q_union_by_name",
    oracle="""
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer WHERE c_nationkey = 3
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier WHERE s_nationkey = 3
""",
    doc="unionByName over re-aligned schemas (reference U1/U2).",
)
def q_union(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select(F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
                F.lit("customer").alias("kind"))
    )
    s = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select(F.lit("supplier").alias("kind"), F.col("s_name").alias("name"),
                F.col("s_acctbal").alias("acctbal"))
    )
    return c.unionByName(s)


@register(
    "q_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
""",
    doc="INTERSECT (distinct): customers active in both years.",
)
def q_intersect(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


@register(
    "q_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="EXCEPT (distinct): customers with no finished orders.",
)
def q_except(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select("c_custkey")
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)  # EXCEPT (distinct) semantics


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot / distinct
# --------------------------------------------------------------------------
@register(
    "q_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP hierarchy totals (reference gap noted in SURVEY §2.4).",
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over status × priority.",
)
def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(_dsum(F.col("o_totalprice")), 2).alias("total")
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    doc="explicit GROUPING SETS via SQL.",
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    )


@register(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem
GROUP BY l_returnflag
""",
    doc="pivot aggregate (reference A6) with explicit value list (required "
    "at scale — implicit pivot triggers an extra distinct-values job).",
)
def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "q_count_distinct",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
    doc="exact distinct aggregate (expand+two-phase under the hood).",
)
def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "q_approx_count_distinct",
    oracle=None,  # HLL sketches are engine-specific; rows-only check
    doc="approx_count_distinct (HLL++). No SQL oracle: sketch estimates are "
    "engine-specific by construction; verified in tests against exact "
    "counts with rsd tolerance.",
)
def q_approx_cd(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders")
    )


@register(
    "q_percentiles",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
       ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
FROM orders
GROUP BY o_orderstatus
""",
    doc="exact continuous percentiles (Spark `percentile`, DuckDB "
    "quantile_cont). approx_percentile is the scale path; exact keeps the "
    "oracle tight.",
)
def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95"),
    )


# --------------------------------------------------------------------------
# Column toolkit / scalar functions / conditional projection
# --------------------------------------------------------------------------
@register(
    "q_case_when_bands",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS band,
       COUNT(*) AS n
FROM orders
GROUP BY 1
""",
    doc="conditional projection (reference P8) + agg.",
)
def q_case_when(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(band.alias("band")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_column_toolkit",
    oracle="""
SELECT CAST(r_regionkey AS BIGINT) AS region_id, r_name AS region_name,
       'tpch' AS source
FROM region
""",
    doc="rename_columns + cast_columns + with_constants (reference P1-P3) "
    "collapse to one projection.",
)
def q_column_toolkit(spark: SparkSession, sf: str) -> DataFrame:
    r = _t(spark, sf, "region")
    out = rename_columns(r, {"r_regionkey": "region_id", "r_name": "region_name"})
    out = cast_columns(out, {"region_id": "bigint"})
    return with_constants(out, {"source": "tpch"})


@register(
    "q_row_hash",
    oracle="""
SELECT c_custkey,
       sha256(concat_ws('␟',
              COALESCE(CAST(c_custkey AS VARCHAR), ''),
              COALESCE(c_name, ''),
              COALESCE(NULLIF(c_mktsegment, 'BUILDING'), ''))) AS row_hash
FROM customer
""",
    doc="the reference's SCD change-detection hash recipe (F5): sha256 over "
    "unit-separator-joined, null-coalesced string casts. NULLIF injects "
    "nulls to prove null-normalization matches.",
)
def q_row_hash(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import row_hash

    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        row_hash(
            [
                F.col("c_custkey"),
                F.col("c_name"),
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            ]
        ).alias("row_hash"),
    )


@register(
    "q_multi_format_dates",
    oracle="""
WITH raw AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN 'not a date'
              WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
              ELSE strftime(o_orderdate, '%d.%m.%Y') END AS raw
  FROM orders)
SELECT o_orderkey, raw,
       CAST(COALESCE(try_strptime(raw, '%Y-%m-%d'),
                     try_strptime(raw, '%m/%d/%Y'),
                     try_strptime(raw, '%d.%m.%Y')) AS DATE) AS parsed_date,
       CASE WHEN try_strptime(raw, '%Y-%m-%d') IS NOT NULL THEN 0
            WHEN try_strptime(raw, '%m/%d/%Y') IS NOT NULL THEN 1
            WHEN try_strptime(raw, '%d.%m.%Y') IS NOT NULL THEN 2 END AS format_index
FROM raw
""",
    doc="split_by_date_formats (reference F2): tolerant multi-format parse, "
    "first-match coalesce, match-index when-chain, null mode.",
)
def q_multi_dates(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("not a date"))
        .when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "dd.MM.yyyy"))
    )
    staged = o.select("o_orderkey", raw.alias("raw"))
    return split_by_date_formats(
        staged, "raw", ["yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy"], output_column="parsed_date",
        format_index_column="format_index", mode="null",
    )


@register(
    "q_calendar_dim",
    oracle="""
SELECT CAST(d AS DATE) AS date,
       CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
       CAST(month(d) AS INT) AS month, monthname(d) AS month_name,
       CAST(weekofyear(d) AS INT) AS week_of_year,
       CAST(dayofmonth(d) AS INT) AS day_of_month,
       CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
       dayname(d) AS day_name
FROM (SELECT unnest(generate_series(DATE '1998-01-01', DATE '1998-12-31',
                                    INTERVAL 1 DAY)) AS d)
""",
    doc="calendar dimension generator (reference S19/F3) built on "
    "spark.range — distributed, no driver loop. DuckDB dayofweek is "
    "0-based Sunday; Spark is 1-based — oracle adds 1.",
)
def q_calendar(spark: SparkSession, sf: str) -> DataFrame:
    return calendar_dimension(spark, "1998-01-01", "1998-12-31")


@register(
    "q_time_dim",
    oracle="""
SELECT CAST(i AS INT) AS second_of_day,
       CAST(i // 3600 AS INT) AS hour,
       CAST((i % 3600) // 60 AS INT) AS minute,
       CAST(i % 60 AS INT) AS second,
       printf('%02d:%02d:%02d', i // 3600, (i % 3600) // 60, i % 60) AS hhmmss
FROM range(0, 86400) t(i)
""",
    doc="seconds-of-day time dimension (reference F4: floor/mod clock math "
    "+ format_string).",
)
def q_time_dim(spark: SparkSession, sf: str) -> DataFrame:
    return time_dimension(spark, 1)


@register(
    "q_window_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(LAG(o_totalprice) OVER w, 2) AS prev_price,
       ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       ROUND(FIRST_VALUE(o_totalprice) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    doc="analytic-window breadth in one pass: lag/lead, ntile, "
    "percent_rank, cume_dist, first_value and nth_value share a single "
    "window spec, so Catalyst evaluates all seven in ONE WindowExec over "
    "one (o_custkey) hash shuffle + in-partition sort — adding a "
    "function to the same spec is free at any scale.  Order is total "
    "(orderdate then orderkey), so ranking/navigation output is "
    "engine-deterministic.",
)
def q_window_suite(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("o_totalprice").over(wf), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wf), 2).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


# ------------------------------------------------- backlog aging buckets
@register(
    "q_order_aging",
    oracle="""
WITH open_o AS (
  SELECT o_orderkey, o_totalprice,
         CAST((EXTRACT(YEAR FROM DATE '1999-01-01')
               - EXTRACT(YEAR FROM o_orderdate)) * 12
              + EXTRACT(MONTH FROM DATE '1999-01-01')
              - EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS age_months
  FROM orders
  WHERE o_orderstatus <> 'F' AND o_orderdate < DATE '1999-01-01'),
b AS (
  SELECT CASE WHEN age_months <= 3 THEN '0-3m'
              WHEN age_months <= 6 THEN '3-6m'
              WHEN age_months <= 12 THEN '6-12m'
              ELSE '12m+' END AS age_bucket,
         o_totalprice
  FROM open_o)
SELECT age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS backlog_cents
FROM b
GROUP BY age_bucket
ORDER BY age_bucket
""",
    doc="backlog aging snapshot (the AR-aging shape every ops dashboard "
    "carries): non-finalized orders open as of a fixed snapshot date, "
    "bucketed by whole-month age (calendar month arithmetic, no "
    "day-count ambiguity) with order counts and exact integer-cent "
    "backlog value per bucket.  Scale: one pushed-down status+date "
    "filter (both reach the parquet scan), one map-side-combined "
    "rollup to 4 cells.",
)
def q_order_aging(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    snap_y, snap_m = 1999, 1
    age = (
        (F.lit(snap_y) - F.year("o_orderdate")) * 12
        + F.lit(snap_m)
        - F.month("o_orderdate")
    ).cast("long")
    open_o = o.where(
        (F.col("o_orderstatus") != "F") & (F.col("o_orderdate") < F.lit("1999-01-01"))
    ).select("o_totalprice", age.alias("age_months"))
    bucket = (
        F.when(F.col("age_months") <= 3, "0-3m")
        .when(F.col("age_months") <= 6, "3-6m")
        .when(F.col("age_months") <= 12, "6-12m")
        .otherwise("12m+")
    )
    return (
        open_o.select(bucket.alias("age_bucket"), "o_totalprice")
        .groupBy("age_bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("backlog_cents"),
        )
        .orderBy("age_bucket")
    )
