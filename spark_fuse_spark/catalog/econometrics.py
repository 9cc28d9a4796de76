"""Business-econometrics catalog queries: pricing, growth, selection.

Split from the round-3..6 stats_graph suite (round-7 verdict #6) — pure
mechanical move, registry names and oracles unchanged.  Price index and
elasticity, revenue concentration, RFM, KPI/seasonal decomposition,
forecast backtest, event study, gains/lift, Pareto frontier.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

# ----------------------------------------------------- price index panel
@register(
    "q_price_index",
    oracle="""
WITH cells AS (
  SELECT CAST((EXTRACT(YEAR FROM l.l_shipdate) - 1995) * 12
              + EXTRACT(MONTH FROM l.l_shipdate) - 1 AS BIGINT) AS m,
         p.p_brand AS b,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS DECIMAL(38,0))) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
mn AS (SELECT CAST(MIN(m) AS BIGINT) AS m0 FROM cells),
base AS (
  SELECT c.b, c.q AS q0, c.r AS r0 FROM cells c JOIN mn ON c.m = mn.m0),
j AS (
  SELECT c.m, c.b, c.q, CAST(c.r AS DOUBLE) AS r,
         b0.q0, CAST(b0.r0 AS DOUBLE) AS r0
  FROM cells c JOIN base b0 ON c.b = b0.b),
idx AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_brands,
         SUM(r * q0 / q) / SUM(r0) AS laspeyres,
         SUM(r) / SUM(r0 * q / q0) AS paasche
  FROM j GROUP BY m)
SELECT m AS month_idx, n_brands,
       FLOOR(laspeyres * 1000000 + 0.5) / 1000000 AS laspeyres,
       FLOOR(paasche * 1000000 + 0.5) / 1000000 AS paasche,
       FLOOR(sqrt(laspeyres * paasche) * 1000000 + 0.5) / 1000000 AS fisher
FROM idx
ORDER BY month_idx
""",
    doc="Laspeyres / Paasche / Fisher price indices per shipping month "
    "over the brand basket (the CPI construction, base = the corpus's "
    "first month): per-(month, brand) quantity and revenue aggregates "
    "in exact integers (quantities BIGINT, cents DECIMAL(38)), unit "
    "prices formed only at the bounded per-month panel — Laspeyres "
    "reuses the base basket (sum r_m*q0/q_m over base revenue), Paasche "
    "the current one, Fisher their geometric mean.  Scale: one "
    "(month, brand)-keyed partial-agg'd shuffle on the fact scan (the "
    "part dim broadcasts), then all index math runs on |months|x|brands| "
    "rows; the base basket is a broadcast |brands|-row panel.",
)
def q_price_index(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    m = (
        (F.year("l_shipdate") - F.lit(1995)) * 12 + F.month("l_shipdate") - 1
    ).cast("long")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(m.alias("m"), F.col("p_brand").alias("b"))
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
            ).alias("r"),
        )
    )
    mn = cells.agg(F.min("m").cast("long").alias("m0"))
    base = (
        cells.crossJoin(F.broadcast(mn))
        .where(F.col("m") == F.col("m0"))
        .select("b", F.col("q").alias("q0"), F.col("r").alias("r0"))
    )
    j = cells.join(F.broadcast(base), "b").select(
        "m",
        "b",
        "q",
        F.col("r").cast("double").alias("r"),
        "q0",
        F.col("r0").cast("double").alias("r0"),
    )
    idx = j.groupBy("m").agg(
        F.count("*").cast("long").alias("n_brands"),
        (F.sum(F.col("r") * F.col("q0") / F.col("q")) / F.sum("r0")).alias("laspeyres"),
        (F.sum("r") / F.sum(F.col("r0") * F.col("q") / F.col("q0"))).alias("paasche"),
    )
    m6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return idx.select(
        F.col("m").alias("month_idx"),
        "n_brands",
        m6(F.col("laspeyres")).alias("laspeyres"),
        m6(F.col("paasche")).alias("paasche"),
        m6(F.sqrt(F.col("laspeyres") * F.col("paasche"))).alias("fisher"),
    ).orderBy("month_idx")
# ------------------------------------------------- revenue concentration
@register(
    "q_revenue_concentration",
    oracle="""
WITH spend AS (
  SELECT o_custkey AS custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT custkey, cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, custkey) - 1 AS BIGINT) AS rank0
  FROM spend),
panel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS total FROM spend),
dec AS (
  SELECT CAST(FLOOR(r.rank0 * 10 / p.n) AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS customers,
         CAST(SUM(r.cents) AS BIGINT) AS revenue_cents
  FROM ranked r, panel p GROUP BY 1),
cum AS (
  SELECT d1.decile, d1.customers, d1.revenue_cents,
         CAST(SUM(d2.revenue_cents) AS BIGINT) AS cum_cents
  FROM dec d1 JOIN dec d2 ON d2.decile <= d1.decile
  GROUP BY d1.decile, d1.customers, d1.revenue_cents)
SELECT c.decile, c.customers,
       FLOOR(CAST(c.revenue_cents AS DOUBLE) / p.total * 1000000 + 0.5)
         / 1000000 AS revenue_share,
       FLOOR(CAST(c.cum_cents AS DOUBLE) / p.total * 1000000 + 0.5)
         / 1000000 AS cumulative_share
FROM cum c, panel p
ORDER BY decile
""",
    doc="revenue concentration (Lorenz deciles): customers ranked by "
    "exact lifetime cents ascending, cut into deciles, each with its "
    "revenue share and the cumulative (Lorenz-curve) share — the "
    "whale-analysis panel behind Gini/Pareto dashboards.  The global "
    "rank rides the repo's two-phase distributed prefix machinery "
    "(operators/packing.with_prefix_sum: range partition + parallel "
    "local windows + bounded per-partition offsets) — NEVER a "
    "single-partition row_number over the customer table — and the "
    "cumulative share is a triangular self-join over the 10 decile "
    "rows, not a window.  Rank ties break on custkey via a fixed-width "
    "zero-padded sort key, identical to the oracle's (cents, custkey) "
    "window order.",
)
def q_revenue_concentration(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    spend = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    # fixed-width zero-padded (cents, custkey) string: lexicographic
    # order == numeric order for non-negative fixed-width fields, and
    # with_prefix_sum needs ONE unique range-partitionable order column
    okey = F.concat(
        F.lpad(F.col("cents").cast("string"), 15, "0"),
        F.lit("-"),
        F.lpad(F.col("custkey").cast("string"), 12, "0"),
    )
    ranked = with_prefix_sum(
        spend.withColumn("__okey", okey).withColumn("__one", F.lit(1)),
        order_col="__okey",
        value_col="__one",
        out_col="rank0",
    )
    panel = spend.agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    dec = (
        ranked.crossJoin(F.broadcast(panel))
        .groupBy(F.floor(F.col("rank0") * 10 / F.col("n")).alias("decile"))
        .agg(
            F.count("*").alias("customers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    # cumulative revenue via the 10-cell prefix panel (replaces the
    # triangular decile self-join — same exact-long sums, one less join)
    from ..operators.panels import prefix_panel

    cum = (
        prefix_panel(dec, ["decile", "customers", "revenue_cents"],
                     ["revenue_cents"])
        .select(
            F.explode(
                F.arrays_zip(F.col("l"), F.col("pre_revenue_cents").alias("c"))
            ).alias("z")
        )
        .select(
            F.col("z.l.decile").alias("decile"),
            F.col("z.l.customers").alias("customers"),
            F.col("z.l.revenue_cents").alias("revenue_cents"),
            F.col("z.c").alias("cum_cents"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(panel))
        .select(
            "decile",
            "customers",
            (
                F.floor(
                    F.col("revenue_cents").cast("double") / F.col("total") * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("revenue_share"),
            (
                F.floor(
                    F.col("cum_cents").cast("double") / F.col("total") * 1000000 + 0.5
                )
                / 1000000
            ).alias("cumulative_share"),
        )
        .orderBy("decile")
    )
# ------------------------------------------------- RFM customer segmentation
_RFM_Q = 5  # quintiles


def _rfm_cut_sql(tag: str, col: str) -> str:
    """One metric's quintile-boundary CTE chain (cells -> cumulative ->
    boundary rows).  Boundary k is the smallest value whose inclusive
    cumulative count covers k/5 of customers; a value spanning several
    boundaries contributes one ROW per k (duplicates are meaningful —
    the score counts boundary rows strictly below the value)."""
    return f"""
{tag}cells AS (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS w
               FROM base GROUP BY 1),
{tag}cum AS (SELECT v, SUM(w) OVER (ORDER BY v) AS ci,
                    SUM(w) OVER (ORDER BY v) - w AS ce
             FROM {tag}cells),
{tag}cut AS (SELECT v FROM {tag}cum CROSS JOIN n
             JOIN (VALUES (1),(2),(3),(4)) k(k)
               ON ci * {_RFM_Q} >= k.k * n.n AND ce * {_RFM_Q} < k.k * n.n)"""


@register(
    "q_rfm_segments",
    oracle=f"""
WITH per AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS m
  FROM orders GROUP BY 1),
mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
base AS (SELECT o_custkey,
                CAST(date_diff('day', last_order, maxd) AS BIGINT) AS r, f, m
         FROM per CROSS JOIN mx),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
{_rfm_cut_sql('r', 'r')},
{_rfm_cut_sql('f', 'f')},
{_rfm_cut_sql('m', 'm')},
scored AS (
  SELECT o_custkey, m,
         CAST(1 + (SELECT COUNT(*) FROM rcut WHERE rcut.v < base.r) AS BIGINT)
           AS r_score,
         CAST(1 + (SELECT COUNT(*) FROM fcut WHERE fcut.v < base.f) AS BIGINT)
           AS f_score,
         CAST(1 + (SELECT COUNT(*) FROM mcut WHERE mcut.v < base.m) AS BIGINT)
           AS m_score
  FROM base)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(m) AS DOUBLE) / 100, 2) AS monetary_dollars
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    doc="RFM customer segmentation with EXACT quintile boundaries and no "
    "global sort: per active customer, recency (days since last order, "
    "vs the corpus max date), frequency (order count) and monetary "
    "(lifetime cents, exact BIGINT); each metric's four quintile "
    "boundaries come from the two-phase distributed prefix sum over "
    "the distinct-value panel (operators/packing.with_prefix_sum — the "
    "q_weighted_deciles machinery), then scores assign by comparing "
    "the raw value against the 4-element broadcast boundary array "
    "(score = 1 + boundaries strictly below; a heavy value spanning "
    "several boundaries duplicates rows in the array, so coarse "
    "metrics like frequency score identically on both engines).  "
    "Scores run 1..5 ascending in the raw value (r_score 1 = most "
    "recent).  Scale: the customer rollup is one hash aggregate; each "
    "boundary panel is distinct-value sized with bounded-shuffle "
    "prefix sums; assignment is three 1-row broadcast arrays crossed "
    "into the customer relation — no sort, no window over customers.",
)
def q_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    o = load_table(spark, sf, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("f"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("m"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("maxd", "last_order").cast("long").alias("r"),
            "f",
            "m",
        )
        .localCheckpoint()  # feeds three boundary panels + the assignment
    )
    n_panel = base.agg(F.count(F.lit(1)).alias("n"))
    ks = spark.range(1, _RFM_Q).select(F.col("id").cast("long").alias("k"))

    def cut_array(col: str) -> DataFrame:
        cells = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("w")
        )
        cum = with_prefix_sum(cells, "v", "w", out_col="ce")
        cum = cum.withColumn("ci", F.col("ce") + F.col("w"))
        hits = cum.crossJoin(F.broadcast(n_panel)).join(
            F.broadcast(ks),
            (F.col("ci") * _RFM_Q >= F.col("k") * F.col("n"))
            & (F.col("ce") * _RFM_Q < F.col("k") * F.col("n")),
        )
        return hits.agg(F.sort_array(F.collect_list("v")).alias(f"{col}_cuts"))

    def score(col: str) -> F.Column:
        return (
            F.lit(1)
            + F.size(F.filter(F.col(f"{col}_cuts"), lambda t: t < F.col(col)))
        ).cast("long")

    scored = (
        base.crossJoin(F.broadcast(cut_array("r")))
        .crossJoin(F.broadcast(cut_array("f")))
        .crossJoin(F.broadcast(cut_array("m")))
        .select(
            "o_custkey",
            "m",
            score("r").alias("r_score"),
            score("f").alias("f_score"),
            score("m").alias("m_score"),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("m").cast("double") / 100, 2).alias("monetary_dollars"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
# --------------------------------------- additive seasonal decomposition
@register(
    "q_seasonal_decompose",
    oracle="""
WITH monthly AS (
  SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
offs AS (SELECT UNNEST(generate_series(-6, 6)) AS off),
win AS (
  SELECT a.m, a.rev,
         CAST(SUM(CASE WHEN ABS(o.off) = 6 THEN b.rev ELSE 2 * b.rev END)
              AS BIGINT) AS numer24,
         CAST(COUNT(*) AS BIGINT) AS n_present
  FROM monthly a CROSS JOIN offs o
  JOIN monthly b ON b.m = a.m + o.off
  GROUP BY a.m, a.rev),
full_win AS (SELECT m, rev, numer24, 24 * rev - numer24 AS d24
             FROM win WHERE n_present = 13),
season AS (
  SELECT m % 12 AS k, CAST(SUM(d24) AS BIGINT) AS sd24,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM full_win GROUP BY 1)
SELECT f.m AS month_idx, f.rev AS rev_cents,
       FLOOR(f.numer24 / 24.0 * 100 + 0.5) / 100 AS trend_cents,
       FLOOR(s.sd24 / (24.0 * s.cnt) * 100 + 0.5) / 100 AS seasonal_cents,
       FLOOR((f.rev - f.numer24 / 24.0 - s.sd24 / (24.0 * s.cnt)) * 100 + 0.5)
         / 100 AS residual_cents
FROM full_win f JOIN season s ON s.k = f.m % 12
ORDER BY month_idx
""",
    doc="classical additive seasonal decomposition of monthly revenue: "
    "trend = centered 2x12 moving average (half weights at the +-6 "
    "edges), seasonal = per-calendar-month mean of the detrended "
    "series, residual = remainder — the decomposition every forecast "
    "review starts from, one notch above e_dow_seasonality's "
    "day-of-week ANOVA.  Exactness: the MA numerator (x24) and the "
    "detrended values (x24) stay INTEGER cents — weights 1/2/2/.../1 "
    "sum to 24 — and the seasonal mean keeps an integer numerator with "
    "a separate count, so the only floats are three mirrored display "
    "divisions, floor-rounded to hundredths.  Scale: one map-side-"
    "combined monthly rollup; the 13-tap window is an EXPLODED-OFFSET "
    "EQUI-JOIN on the dense month index (never a range/nested-loop "
    "join, never a window sort); the seasonal panel is 12 rows.",
)
def q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev")
    ).localCheckpoint()  # feeds both sides of the offset join
    a = monthly.select(
        "m", "rev", F.explode(F.sequence(F.lit(-6), F.lit(6))).alias("off")
    )
    b = monthly.select(F.col("m").alias("bm"), F.col("rev").alias("brev"))
    win = (
        a.join(b, F.col("bm") == F.col("m") + F.col("off"))
        .groupBy("m", "rev")
        .agg(
            F.sum(
                F.when(F.abs(F.col("off")) == 6, F.col("brev")).otherwise(
                    2 * F.col("brev")
                )
            )
            .cast("long")
            .alias("numer24"),
            F.count("*").alias("n_present"),
        )
    )
    full_win = (
        win.where(F.col("n_present") == 13)
        .withColumn("d24", 24 * F.col("rev") - F.col("numer24"))
        .localCheckpoint()  # feeds the seasonal panel AND the final join
    )
    season = full_win.groupBy((F.col("m") % 12).alias("k")).agg(
        F.sum("d24").alias("sd24"), F.count("*").alias("cnt")
    )
    r2 = lambda col: F.floor(col * 100 + 0.5) / 100  # noqa: E731
    trend = F.col("numer24") / 24.0
    seasonal = F.col("sd24") / (24.0 * F.col("cnt"))
    return (
        full_win.join(F.broadcast(season), (F.col("m") % 12) == F.col("k"))
        .select(
            F.col("m").alias("month_idx"),
            F.col("rev").alias("rev_cents"),
            r2(trend).alias("trend_cents"),
            r2(seasonal).alias("seasonal_cents"),
            r2(F.col("rev") - trend - seasonal).alias("residual_cents"),
        )
        .orderBy("month_idx")
    )
# --------------------------------------------- KPI growth decomposition
@register(
    "q_kpi_decomposition",
    oracle="""
WITH monthly AS (
  SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
pairs AS (
  SELECT b.m AS month_idx,
         ln(CAST(b.rev AS DOUBLE) / a.rev) AS d_rev,
         ln(CAST(b.custs AS DOUBLE) / a.custs) AS d_cust,
         ln((CAST(b.n_orders AS DOUBLE) / b.custs)
            / (CAST(a.n_orders AS DOUBLE) / a.custs)) AS d_freq,
         ln((CAST(b.rev AS DOUBLE) / b.n_orders)
            / (CAST(a.rev AS DOUBLE) / a.n_orders)) AS d_aov
  FROM monthly a JOIN monthly b ON b.m = a.m + 1)
SELECT month_idx,
       FLOOR(d_rev * 1000000 + 0.5) / 1000000 AS ln_rev_change,
       FLOOR(d_cust * 1000000 + 0.5) / 1000000 AS contrib_customers,
       FLOOR(d_freq * 1000000 + 0.5) / 1000000 AS contrib_frequency,
       FLOOR(d_aov * 1000000 + 0.5) / 1000000 AS contrib_aov,
       ABS(d_rev - d_cust - d_freq - d_aov) < 1e-9 AS decomposition_closes
FROM pairs
ORDER BY month_idx
""",
    doc="month-over-month revenue growth decomposed through the exact "
    "multiplicative identity revenue = customers x orders-per-customer "
    "x average-order-value: in log space the three factor contributions "
    "SUM to the revenue change, so every growth review can say how "
    "much came from reach vs frequency vs basket size — with an "
    "in-row closure check (|d_rev - sum of parts| < 1e-9) proving the "
    "identity held, not just approximately.  Determinism: factor "
    "inputs are exact integers from one rollup; each ln() argument is "
    "one mirrored IEEE ratio.  Scale: one map-side-combined monthly "
    "rollup (two-phase distinct for customers), one dense month-index "
    "equi-self-join; calendar-bounded everywhere.",
)
def q_kpi_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(
        F.countDistinct("o_custkey").alias("custs"),
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev"),
    ).localCheckpoint()  # feeds both sides of the adjacency join
    a, b = monthly.alias("a"), monthly.alias("b")
    d_rev = F.log(F.col("b.rev").cast("double") / F.col("a.rev"))
    d_cust = F.log(F.col("b.custs").cast("double") / F.col("a.custs"))
    d_freq = F.log(
        (F.col("b.n_orders").cast("double") / F.col("b.custs"))
        / (F.col("a.n_orders").cast("double") / F.col("a.custs"))
    )
    d_aov = F.log(
        (F.col("b.rev").cast("double") / F.col("b.n_orders"))
        / (F.col("a.rev").cast("double") / F.col("a.n_orders"))
    )
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return (
        a.join(b, F.col("b.m") == F.col("a.m") + 1)
        .select(
            F.col("b.m").alias("month_idx"),
            r6(d_rev).alias("ln_rev_change"),
            r6(d_cust).alias("contrib_customers"),
            r6(d_freq).alias("contrib_frequency"),
            r6(d_aov).alias("contrib_aov"),
            (F.abs(d_rev - d_cust - d_freq - d_aov) < 1e-9).alias(
                "decomposition_closes"
            ),
        )
        .orderBy("month_idx")
    )
# ------------------------------------------------- new vs returning split
@register(
    "q_new_vs_returning",
    oracle="""
WITH om AS (
  SELECT o_custkey,
         CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
firstm AS (SELECT o_custkey, MIN(m) AS first_m FROM om GROUP BY o_custkey),
tagged AS (
  SELECT om.m, om.cents,
         CASE WHEN om.m = f.first_m THEN 1 ELSE 0 END AS is_new
  FROM om JOIN firstm f ON f.o_custkey = om.o_custkey)
SELECT m AS month_idx,
       CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS new_revenue_cents,
       CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT)
         AS returning_revenue_cents,
       CAST(SUM(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS BIGINT) AS new_orders,
       CAST(SUM(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_orders,
       FLOOR(CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS DOUBLE)
             / SUM(cents) * 1000000 + 0.5) / 1000000 AS new_share
FROM tagged
GROUP BY m
ORDER BY month_idx
""",
    doc="new-vs-returning revenue split per month: an order is 'new' "
    "when it lands in its customer's FIRST active month (the acquisition "
    "cohort boundary every growth dashboard draws); reports both revenue "
    "and order counts plus the new-revenue share.  Scale: the first-"
    "month table is one customer-keyed partial-agg'd MIN; tagging is "
    "one customer-keyed equi-join (no window, no sort); the monthly "
    "rollup map-side-combines.  Exact integer cents; one mirrored "
    "share division.",
)
def q_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    om = o.select(
        "o_custkey",
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    firstm = om.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    tagged = om.join(firstm, "o_custkey").select(
        "m",
        "cents",
        F.when(F.col("m") == F.col("first_m"), 1).otherwise(0).alias("is_new"),
    )
    new_c = F.sum(F.when(F.col("is_new") == 1, F.col("cents")).otherwise(0))
    ret_c = F.sum(F.when(F.col("is_new") == 0, F.col("cents")).otherwise(0))
    return (
        tagged.groupBy(F.col("m").alias("month_idx"))
        .agg(
            new_c.cast("long").alias("new_revenue_cents"),
            ret_c.cast("long").alias("returning_revenue_cents"),
            F.sum(F.when(F.col("is_new") == 1, 1).otherwise(0)).alias("new_orders"),
            F.sum(F.when(F.col("is_new") == 0, 1).otherwise(0)).alias(
                "returning_orders"
            ),
            (
                F.floor(
                    new_c.cast("double") / F.sum("cents") * 1000000 + 0.5
                )
                / 1000000
            ).alias("new_share"),
        )
        .orderBy("month_idx")
    )
# --------------------------------------------- rolling-origin backtest
@register(
    "q_forecast_backtest",
    oracle="""
WITH monthly AS (
  SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
j AS (
  SELECT t.m, t.rev,
         ABS(t.rev - n1.rev) AS err_naive,
         ABS(t.rev - s12.rev) AS err_snaive
  FROM monthly t
  JOIN monthly n1 ON n1.m = t.m - 1
  JOIN monthly s12 ON s12.m = t.m - 12),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(err_naive) AS BIGINT) AS se_naive,
         CAST(SUM(err_snaive) AS BIGINT) AS se_snaive,
         CAST(SUM(CASE WHEN err_snaive < err_naive THEN 1 ELSE 0 END) AS BIGINT)
           AS snaive_wins
  FROM j)
SELECT n_months,
       FLOOR(CAST(se_naive AS DOUBLE) / n_months / 100 * 100 + 0.5) / 100
         AS mae_naive_dollars,
       FLOOR(CAST(se_snaive AS DOUBLE) / n_months / 100 * 100 + 0.5) / 100
         AS mae_snaive_dollars,
       FLOOR(CAST(snaive_wins AS DOUBLE) / n_months * 1000000 + 0.5) / 1000000
         AS snaive_win_rate,
       se_snaive < se_naive AS seasonal_model_better
FROM agg
""",
    doc="rolling-origin forecast backtest, fully in-engine: every month "
    "with both references available scores the naive model (forecast = "
    "last month) against the seasonal-naive model (forecast = same "
    "month last year) on monthly revenue; absolute errors stay EXACT "
    "integer cents, so the MAEs, the per-month win rate, and the "
    "model verdict are order-independent on both engines — the "
    "evaluation harness a forecasting team needs before trusting "
    "q06_forecast_revenue or e_holt_trend in production.  Scale: one "
    "monthly rollup + two dense month-index equi-self-joins + a 1-row "
    "reduce; calendar-bounded everywhere.",
)
def q_forecast_backtest(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev")
    ).localCheckpoint()  # feeds three aliases of the adjacency joins
    t, n1, s12 = monthly.alias("t"), monthly.alias("n1"), monthly.alias("s12")
    j = (
        t.join(n1, F.col("n1.m") == F.col("t.m") - 1)
        .join(s12, F.col("s12.m") == F.col("t.m") - 12)
        .select(
            F.abs(F.col("t.rev") - F.col("n1.rev")).alias("err_naive"),
            F.abs(F.col("t.rev") - F.col("s12.rev")).alias("err_snaive"),
        )
    )
    agg = j.agg(
        F.count("*").alias("n_months"),
        F.sum("err_naive").alias("se_naive"),
        F.sum("err_snaive").alias("se_snaive"),
        F.sum(F.when(F.col("err_snaive") < F.col("err_naive"), 1).otherwise(0)).alias(
            "snaive_wins"
        ),
    )
    return agg.select(
        "n_months",
        (
            F.floor(F.col("se_naive").cast("double") / F.col("n_months") / 100 * 100 + 0.5)
            / 100
        ).alias("mae_naive_dollars"),
        (
            F.floor(
                F.col("se_snaive").cast("double") / F.col("n_months") / 100 * 100 + 0.5
            )
            / 100
        ).alias("mae_snaive_dollars"),
        (
            F.floor(
                F.col("snaive_wins").cast("double") / F.col("n_months") * 1000000 + 0.5
            )
            / 1000000
        ).alias("snaive_win_rate"),
        (F.col("se_snaive") < F.col("se_naive")).alias("seasonal_model_better"),
    )
# --------------------------------------------- grouped OLS (elasticity)
@register(
    "q_price_elasticity",
    oracle="""
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(FLOOR(ln(l_extendedprice / l_quantity) * 1000000) AS BIGINT) AS xq,
         CAST(FLOOR(ln(l_quantity) * 1000000) AS BIGINT) AS yq
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
m AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(xq AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(yq AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(xq AS HUGEINT) * yq) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy
  FROM base GROUP BY brand)
SELECT brand, n,
       FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS elasticity,
       FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS r2
FROM m
ORDER BY brand
""",
    doc="grouped closed-form OLS — per-brand price elasticity of demand "
    "(slope of ln quantity on ln unit price), ALL brands fitted in one "
    "pass: the 'thousands of small models' pattern, where each group's "
    "regression reduces to five moment sums inside a single map-side-"
    "combined groupBy, no per-group iteration or driver loop.  "
    "Determinism: per-row ln values floor-quantize to integer "
    "micro-units BEFORE summation (aggregation order cannot move the "
    "moments), one operand lifts to DECIMAL(38)/HUGEINT before every "
    "cross-moment multiply (the house overflow rule — xq*yq sums pass "
    "signed-64 at corpus scale), and the slope/r2 emerge through "
    "mirrored decimal->double casts with the squaring done in doubles "
    "(a decimal square of the 1e25-scale numerator would overflow 38 "
    "digits).  On TPC-H unit price is quantity-independent by "
    "construction, so the honest readout is elasticity ~ 0 with r2 ~ 0 "
    "— the machinery proves absence of signal rather than inventing "
    "one.  Scale: one fact-dim join (part broadcast) + one groupBy to "
    "|brands| rows.",
)
def q_price_elasticity(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor(F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1000000)
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("l_quantity")) * 1000000).cast("long").alias("yq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = base.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("xq"))).alias("sx"),
        F.sum(dec(F.col("yq"))).alias("sy"),
        F.sum(dec(F.col("xq")) * F.col("yq")).alias("sxy"),
        F.sum(dec(F.col("xq")) * F.col("xq")).alias("sxx"),
        F.sum(dec(F.col("yq")) * F.col("yq")).alias("syy"),
    )
    num = (dec(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x = (dec(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (dec(F.col("n")) * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "brand",
        "n",
        (F.floor(num / den_x * 1000000 + 0.5) / 1000000).alias("elasticity"),
        (F.floor(num * num / (den_x * den_y) * 1000000 + 0.5) / 1000000).alias("r2"),
    ).orderBy("brand")
# --------------------------------------------- event-study leads/lags
_ES_EVENT_M = 72  # 1998-01 in 0-based months since 1992-01 (orders span 1995-01..2001-08, so the +/-6 window has a full pre-period)
_ES_HORIZON = 6


@register(
    "q_event_study",
    oracle=f"""
WITH o AS (
  SELECT CAST((EXTRACT(YEAR FROM o.o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS BIGINT) AS m,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
win AS (
  SELECT m - {_ES_EVENT_M} AS k, treated,
         CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM o
  WHERE m BETWEEN {_ES_EVENT_M - _ES_HORIZON} AND {_ES_EVENT_M + _ES_HORIZON}
  GROUP BY 1, 2),
gap AS (
  SELECT t.k,
         CAST(FLOOR((CAST(t.s AS DOUBLE) / t.n - CAST(c.s AS DOUBLE) / c.n)
                    * 100 + 0.5) AS BIGINT) AS g_centi,
         t.n AS n_treated, c.n AS n_control
  FROM win t JOIN win c ON c.k = t.k AND t.treated = 1 AND c.treated = 0),
pre AS (
  SELECT CAST(SUM(g_centi) AS BIGINT) AS sp, CAST(COUNT(*) AS BIGINT) AS np
  FROM gap WHERE k < 0)
SELECT gap.k AS rel_month, gap.n_treated, gap.n_control,
       gap.g_centi / 100.0 AS gap_cents,
       FLOOR(gap.g_centi - CAST(pre.sp AS DOUBLE) / pre.np + 0.5) / 100
         AS effect_cents,
       gap.k >= 0 AS post
FROM gap CROSS JOIN pre
ORDER BY rel_month
""",
    doc="difference-in-differences EVENT STUDY (the leads/lags readout "
    "that validates e_did_estimate's parallel-trends assumption): "
    "around a fixed event month, the per-relative-month gap in mean "
    "order value between the BUILDING segment (treated) and the rest "
    "(control), centered on the pre-period mean gap — pre-event "
    "effect_cents hovering near zero IS the parallel-trends check, and "
    "post-event coefficients are the dynamic treatment path.  Exact "
    "integer-cent sums per (relative month, arm); the only float ops "
    "are the mirrored mean/centering divisions.  The honest TPC-H "
    "readout is no effect — uniform synthetic demand — which is "
    "exactly what the pre/post symmetry shows.  Scale: one fact-dim "
    "join (customer broadcast at these SFs, shuffled hash at 100 TB), "
    "one map-side-combined rollup to 13 x 2 cells, panel math on a "
    "13-row frame.",
)
def q_event_study(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("treated"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    win = (
        base.where(
            (F.col("m") >= _ES_EVENT_M - _ES_HORIZON)
            & (F.col("m") <= _ES_EVENT_M + _ES_HORIZON)
        )
        .groupBy((F.col("m") - _ES_EVENT_M).alias("k"), "treated")
        .agg(F.sum("cents").cast("long").alias("s"), F.count("*").cast("long").alias("n"))
        .localCheckpoint()  # feeds both arms of the gap join
    )
    t = win.where(F.col("treated") == 1).select(
        "k",
        (F.col("s").cast("double") / F.col("n")).alias("mt"),
        F.col("n").alias("n_treated"),
    )
    ctl = win.where(F.col("treated") == 0).select(
        F.col("k").alias("kc"),
        (F.col("s").cast("double") / F.col("n")).alias("mc"),
        F.col("n").alias("n_control"),
    )
    # per-month gaps quantize to integer centi-cents BEFORE the pre-period
    # panel sum, so the parallel-trends baseline is an exact integer ratio
    # (float-summation order cannot move it)
    gap = t.join(ctl, t.k == ctl.kc).select(
        "k",
        F.floor((F.col("mt") - F.col("mc")) * 100 + 0.5).cast("long").alias("g_centi"),
        "n_treated",
        "n_control",
    ).localCheckpoint()  # feeds the pre-period panel and the final rows
    pre = gap.where(F.col("k") < 0).agg(
        F.sum("g_centi").cast("long").alias("sp"), F.count("*").cast("long").alias("np")
    )
    return (
        gap.crossJoin(F.broadcast(pre))
        .select(
            F.col("k").alias("rel_month"),
            "n_treated",
            "n_control",
            (F.col("g_centi") / 100.0).alias("gap_cents"),
            (
                F.floor(
                    F.col("g_centi") - F.col("sp").cast("double") / F.col("np") + 0.5
                )
                / 100
            ).alias("effect_cents"),
            (F.col("k") >= 0).alias("post"),
        )
        .orderBy("rel_month")
    )
# --------------------------------------------------------- gains/lift table
@register(
    "q_gains_table",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS browse,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY user_id),
d AS (SELECT user_id, browse, converted,
             NTILE(10) OVER (ORDER BY browse DESC, user_id) AS decile
      FROM u),
per AS (SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS all_users,
               CAST(SUM(n_converted) AS BIGINT) AS all_converted
        FROM per),
cum AS (SELECT decile, n_users, n_converted,
               CAST(SUM(n_converted) OVER (ORDER BY decile) AS BIGINT) AS cum_converted,
               CAST(SUM(n_users) OVER (ORDER BY decile) AS BIGINT) AS cum_users
        FROM per)
SELECT c.decile, c.n_users, c.n_converted,
       ROUND(CAST(c.cum_converted AS DOUBLE) / t.all_converted, 6) AS cum_capture,
       ROUND((CAST(c.n_converted AS DOUBLE) / c.n_users)
             / (CAST(t.all_converted AS DOUBLE) / t.all_users), 6) AS lift,
       ROUND((CAST(c.cum_converted AS DOUBLE) / c.cum_users)
             / (CAST(t.all_converted AS DOUBLE) / t.all_users), 6) AS cum_lift
FROM cum c CROSS JOIN tot t
ORDER BY c.decile
""",
    doc="gains/lift table — the decile ranking-quality readout of "
    "targeting and propensity models: users ranked by browse activity "
    "(views + clicks), split into 10 deciles, and each decile reports "
    "its conversion lift over the base rate plus the cumulative capture "
    "curve ('top 2 deciles hold X% of all converters').  Complements "
    "q_calibration_bins (are scores calibrated?) and v_rank_metrics "
    "(retrieval NDCG) with the marketing/risk ranking audit.  The Spark "
    "side computes the EXACT NTILE(10) assignment without a global "
    "sort: rank = (users with larger score, from a bounded per-value "
    "offset panel folded in one row) + row_number within the value "
    "(partitioned window), then the closed-form NTILE tile formula — "
    "while the oracle keeps the natural NTILE window, so agreement is "
    "a two-formulation differential proof.  Determinism: ranks and "
    "counts are exact bigints; ratios are single IEEE divisions "
    "rounded at the end.  Scale: one user-keyed aggregate, one "
    "partitioned window, broadcast offset/total panels, 10-row "
    "cumulative fold — no unpartitioned window anywhere.",
)
def q_gains_table(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        ).alias("browse"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    # exact NTILE(10) over (browse DESC, user_id) WITHOUT a global sort:
    # rank(user) = (#users with a larger browse value) + row_number within
    # the user's own value (partitioned window).  The offsets come from a
    # bounded per-VALUE panel folded in one row — the two-phase prefix
    # pattern — so no task ever sees the whole user list.  The oracle
    # keeps the natural NTILE formulation: agreement is a two-formulation
    # differential proof of the rank identity.
    from ..operators.panels import prefix_panel

    vp = u.groupBy("browse").agg(F.count(F.lit(1)).alias("cnt"))
    pan = prefix_panel(vp, ["browse", "cnt"], ["cnt"])
    # users with browse STRICTLY GREATER = total - inclusive prefix (asc)
    offsets = pan.select(
        F.col("tot_cnt").alias("n_total"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l")),
                lambda i: F.struct(
                    F.element_at(F.col("l"), i)["browse"].alias("browse"),
                    (
                        F.col("tot_cnt") - F.element_at(F.col("pre_cnt"), i)
                    ).alias("before"),
                ),
            )
        ).alias("o"),
    ).select("n_total", F.col("o.browse").alias("browse"), F.col("o.before").alias("before"))
    wv = Window.partitionBy("browse").orderBy("user_id")
    ranked = u.join(F.broadcast(offsets), "browse").select(
        "converted",
        "n_total",
        (F.col("before") + F.row_number().over(wv)).alias("rank"),
    )
    # NTILE(k): the first N%k tiles get N//k+1 rows, the rest N//k
    base = (F.col("n_total") / F.lit(10)).cast("long")
    rem = F.col("n_total") % 10
    cut = rem * (base + 1)
    decile = F.when(
        F.col("rank") <= cut, (F.col("rank") - 1) / (base + 1)
    ).otherwise(rem + (F.col("rank") - 1 - cut) / base).cast("long") + 1
    per = ranked.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_converted")
    )
    # cumulative capture/lift via the 10-row panel fold (no global window)
    dp = prefix_panel(per, ["decile", "n_users", "n_converted"],
                      ["n_users", "n_converted"])
    rows = dp.select(
        F.col("tot_n_users").alias("all_users"),
        F.col("tot_n_converted").alias("all_converted"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l")),
                lambda i: F.struct(
                    F.element_at(F.col("l"), i)["decile"].alias("decile"),
                    F.element_at(F.col("l"), i)["n_users"].alias("n_users"),
                    F.element_at(F.col("l"), i)["n_converted"].alias("n_converted"),
                    F.element_at(F.col("pre_n_converted"), i).alias("cum_converted"),
                    F.element_at(F.col("pre_n_users"), i).alias("cum_users"),
                ),
            )
        ).alias("r"),
    )
    base_rate = F.col("all_converted").cast("double") / F.col("all_users")
    return rows.select(
        F.col("r.decile").alias("decile"),
        F.col("r.n_users").alias("n_users"),
        F.col("r.n_converted").alias("n_converted"),
        F.round(
            F.col("r.cum_converted").cast("double") / F.col("all_converted"), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("r.n_converted").cast("double") / F.col("r.n_users"))
            / base_rate,
            6,
        ).alias("lift"),
        F.round(
            (F.col("r.cum_converted").cast("double") / F.col("r.cum_users"))
            / base_rate,
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")
# ------------------------------------------------------- Pareto frontier
@register(
    "q_pareto_frontier",
    oracle="""
WITH cells AS (
  SELECT p_brand, p_retailprice AS price, CAST(p_size AS BIGINT) AS size,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(MIN(p_partkey) AS BIGINT) AS min_partkey
  FROM part GROUP BY 1, 2, 3),
flagged AS (
  SELECT *,
         MAX(size) OVER (PARTITION BY p_brand ORDER BY price, size DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_prev_size
  FROM cells)
SELECT p_brand, price, size, n_parts, min_partkey
FROM flagged
WHERE best_prev_size IS NULL OR best_prev_size < size
ORDER BY p_brand, price, size
""",
    doc="per-brand Pareto frontier (skyline query, Borzsony-Kossmann-"
    "Stocker 2001): the parts not dominated on (lower price, larger "
    "size) by any same-brand part — the multi-objective shortlist "
    "behind supplier selection and model-config sweeps.  The classic "
    "quadratic dominance self-join is replaced by the sort-based "
    "sweep: dedupe to distinct (price, size) cells, order cells by "
    "(price ASC, size DESC), and a cell is dominated iff the running "
    "MAX(size) over strictly-preceding cells reaches it — preceding "
    "cells have strictly lower price, or equal price with strictly "
    "larger size, so the single window test is EXACTLY the dominance "
    "predicate (equal-price-equal-size duplicates collapse into one "
    "cell and survive together).  Determinism: all integers/decimals, "
    "no floats.  Scale: one cell-keyed aggregate + one window "
    "PARTITIONED BY brand — never a global sort, never an all-pairs "
    "join; cells bound the window input regardless of part count.",
)
def q_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    cells = part.groupBy(
        "p_brand",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("price").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = cells.withColumn("best_prev_size", F.max("size").over(w))
    return (
        flagged.where(
            F.col("best_prev_size").isNull()
            | (F.col("best_prev_size") < F.col("size"))
        )
        .select("p_brand", "price", "size", "n_parts", "min_partkey")
        .orderBy("p_brand", "price", "size")
    )


# --------------------------------------------- market concentration (HHI)
@register(
    "q_hhi_concentration",
    oracle="""
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey AS firm,
         CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents DESC, firm) AS rk
  FROM spend),
agg AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_firms,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         SUM(CAST(cents AS HUGEINT) * cents) AS sumsq,
         CAST(SUM(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS BIGINT) AS top4_cents
  FROM ranked GROUP BY segment)
SELECT segment, n_firms, total_cents,
       ROUND(CAST(sumsq AS DOUBLE)
             / CAST(CAST(total_cents AS HUGEINT) * total_cents AS DOUBLE), 6) AS hhi,
       ROUND(CAST(CAST(total_cents AS HUGEINT) * total_cents AS DOUBLE)
             / CAST(sumsq AS DOUBLE), 4) AS effective_n,
       ROUND(top4_cents * 1.0 / total_cents, 6) AS cr4
FROM agg
ORDER BY segment
""",
    doc="market-concentration panel per market segment: Herfindahl-"
    "Hirschman index, effective competitor count (1/HHI, the "
    "'numbers-equivalent' of Adelman 1969), and the CR4 top-4 "
    "concentration ratio — the antitrust/marketplace-health readout "
    "over customer spend shares.  Exactness: HHI's Σ share² is NOT "
    "computed as a float sum of squared shares (order-dependent); both "
    "engines compute Σ cents² / (Σ cents)² with the numerator summed "
    "in decimal/HUGEINT space (a firm's squared cents already "
    "overflows int64 at scale), then ONE double division rounded at "
    "the end.  Scale: one (segment, firm) partial-agg'd shuffle, a "
    "segment-partitioned rank window for CR4, then a segment-keyed "
    "reduce — no global sort, no self-join.",
)
def q_hhi_concentration(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    spend = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey").alias("firm")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("cents"))
    )
    w = Window.partitionBy("segment").orderBy(F.col("cents").desc(), "firm")
    ranked = spend.select("segment", "cents", F.row_number().over(w).alias("rk"))
    dec = F.col("cents").cast("decimal(38,0)")
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_firms"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(dec * F.col("cents")).alias("sumsq"),
        F.sum(F.when(F.col("rk") <= 4, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("top4_cents"),
    )
    totsq = (F.col("total_cents").cast("decimal(38,0)") * F.col("total_cents")).cast(
        "double"
    )
    return agg.select(
        "segment",
        "n_firms",
        "total_cents",
        F.round(F.col("sumsq").cast("double") / totsq, 6).alias("hhi"),
        F.round(totsq / F.col("sumsq").cast("double"), 4).alias("effective_n"),
        F.round(F.col("top4_cents") * 1.0 / F.col("total_cents"), 6).alias("cr4"),
    ).orderBy("segment")


# ------------------------------------------ Bass diffusion moment fit
@register(
    "e_bass_diffusion",
    oracle="""
WITH fo AS (
  SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) AS m
  FROM orders GROUP BY o_custkey),
cells AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS a FROM fo GROUP BY m),
pan AS (SELECT list({'m': m, 'a': a} ORDER BY m) AS l FROM cells),
rows_ AS (
  SELECT l[i].a AS a,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, i - 1), j -> l[j].a)),
           (p, q) -> p + q) AS nprev
  FROM pan, UNNEST(generate_series(1, len(l))) AS t(i)),
mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS s0,
               SUM(CAST(nprev AS HUGEINT)) AS s1,
               SUM(CAST(nprev AS HUGEINT) * nprev) AS s2,
               SUM(CAST(nprev AS HUGEINT) * nprev * nprev) AS s3,
               SUM(CAST(nprev AS HUGEINT) * nprev * nprev * nprev) AS s4,
               SUM(CAST(a AS HUGEINT)) AS t0,
               SUM(CAST(a AS HUGEINT) * nprev) AS t1,
               SUM(CAST(a AS HUGEINT) * nprev * nprev) AS t2
        FROM rows_),
d AS (SELECT CAST(s0 AS DOUBLE) AS s0, CAST(s1 AS DOUBLE) AS s1,
             CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
             CAST(s4 AS DOUBLE) AS s4, CAST(t0 AS DOUBLE) AS t0,
             CAST(t1 AS DOUBLE) AS t1, CAST(t2 AS DOUBLE) AS t2
      FROM mom),
c AS (SELECT s0,
             (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)) AS det,
             (t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2)) AS d0,
             (s0*(t1*s4 - t2*s3) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2)) AS d1,
             (s0*(s2*t2 - s3*t1) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2)) AS d2
      FROM d),
coef AS (SELECT s0, d0 / det AS c0, d1 / det AS c1, d2 / det AS c2 FROM c),
fit AS (SELECT s0, c0, c1, c2,
               CASE WHEN c2 < 0 AND c1 * c1 - 4 * c2 * c0 >= 0 THEN
                 (-c1 - SQRT(c1 * c1 - 4 * c2 * c0)) / (2 * c2)
               END AS m_hat
        FROM coef)
SELECT CAST(s0 AS BIGINT) AS n_periods,
       FLOOR(c0 * 1000000 + 0.5) / 1000000 AS c0,
       FLOOR(c1 * 1000000 + 0.5) / 1000000 AS c1,
       FLOOR(c2 * 1000000000 + 0.5) / 1000000000 AS c2,
       FLOOR(m_hat * 100 + 0.5) / 100 AS m_hat,
       CASE WHEN m_hat IS NOT NULL THEN
         FLOOR(c0 / m_hat * 1000000 + 0.5) / 1000000 END AS p_innovation,
       CASE WHEN m_hat IS NOT NULL THEN
         FLOOR((c0 / m_hat + c1) * 1000000 + 0.5) / 1000000 END AS q_imitation
FROM fit
""",
    doc="Bass diffusion model fit (Bass 1969) by the standard discrete "
    "OLS analogy: monthly first-purchase adopters a_t regressed on "
    "cumulative prior adopters N and N² (a = pM + (q-p)N - (q/M)N²), "
    "then market potential M, innovation p and imitation q recovered "
    "from the quadratic's roots — the product-growth forecasting "
    "readout.  Determinism: adoption cells and exclusive prefix "
    "cumulatives are exact integers (prefix_panel); ALL seven moment "
    "sums (ΣN..ΣN⁴, Σa..ΣaN²) accumulate in decimal/HUGEINT space "
    "(N⁴ clears int64 far below production scale), and only the final "
    "3x3 Cramer solve runs in doubles — identical expression trees on "
    "both engines.  NULL fit when the quadratic has no admissible "
    "root (c2 >= 0): a non-diffusion-shaped curve must not yield a "
    "fake market size.  Scale: one customer-keyed first-order "
    "aggregate, <=B monthly cells in a 1-row panel, one global "
    "moment reduce — order volume never touches the cubic machinery.",
)
def e_bass_diffusion(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import prefix_panel

    o = load_table(spark, sf, "orders")
    fo = o.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("m")
    )
    cells = fo.groupBy("m").agg(F.count(F.lit(1)).alias("a"))
    pan = prefix_panel(cells, ["m", "a"], ["a"])
    rows = pan.select(
        F.explode(
            F.zip_with(
                F.col("l"),
                F.col("pre_a"),
                lambda c, pre: F.struct(
                    c["a"].alias("a"), (pre - c["a"]).alias("nprev")
                ),
            )
        ).alias("r")
    ).select(F.col("r.a").alias("a"), F.col("r.nprev").alias("nprev"))

    def dec(c):
        return c.cast("decimal(38,0)")

    mom = rows.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(dec(F.col("nprev"))).alias("s1"),
        F.sum(dec(F.col("nprev")) * F.col("nprev")).alias("s2"),
        F.sum(dec(F.col("nprev")) * F.col("nprev") * F.col("nprev")).alias("s3"),
        F.sum(
            dec(F.col("nprev")) * F.col("nprev") * F.col("nprev") * F.col("nprev")
        ).alias("s4"),
        F.sum(dec(F.col("a"))).alias("t0"),
        F.sum(dec(F.col("a")) * F.col("nprev")).alias("t1"),
        F.sum(dec(F.col("a")) * F.col("nprev") * F.col("nprev")).alias("t2"),
    )
    d = mom.select(
        *[
            F.col(c).cast("double").alias(c)
            for c in ("s0", "s1", "s2", "s3", "s4", "t0", "t1", "t2")
        ]
    )
    s0, s1, s2, s3, s4 = [F.col(c) for c in ("s0", "s1", "s2", "s3", "s4")]
    t0, t1, t2 = F.col("t0"), F.col("t1"), F.col("t2")
    c = d.select(
        "s0",
        (
            s0 * (s2 * s4 - s3 * s3)
            - s1 * (s1 * s4 - s3 * s2)
            + s2 * (s1 * s3 - s2 * s2)
        ).alias("det"),
        (
            t0 * (s2 * s4 - s3 * s3)
            - s1 * (t1 * s4 - s3 * t2)
            + s2 * (t1 * s3 - s2 * t2)
        ).alias("d0"),
        (
            s0 * (t1 * s4 - t2 * s3)
            - t0 * (s1 * s4 - s3 * s2)
            + s2 * (s1 * t2 - t1 * s2)
        ).alias("d1"),
        (
            s0 * (s2 * t2 - s3 * t1)
            - s1 * (s1 * t2 - t1 * s2)
            + t0 * (s1 * s3 - s2 * s2)
        ).alias("d2"),
    )
    coef = c.select(
        "s0",
        (F.col("d0") / F.col("det")).alias("c0"),
        (F.col("d1") / F.col("det")).alias("c1"),
        (F.col("d2") / F.col("det")).alias("c2"),
    )
    c0, c1, c2 = F.col("c0"), F.col("c1"), F.col("c2")
    disc = c1 * c1 - 4 * c2 * c0
    fit = coef.select(
        "s0",
        "c0",
        "c1",
        "c2",
        F.when((c2 < 0) & (disc >= 0), (-c1 - F.sqrt(disc)) / (2 * c2)).alias(
            "m_hat"
        ),
    )
    mh = F.col("m_hat")
    return fit.select(
        F.col("s0").cast("long").alias("n_periods"),
        (F.floor(c0 * 1000000 + 0.5) / 1000000).alias("c0"),
        (F.floor(c1 * 1000000 + 0.5) / 1000000).alias("c1"),
        (F.floor(c2 * 1000000000 + 0.5) / 1000000000).alias("c2"),
        (F.floor(mh * 100 + 0.5) / 100).alias("m_hat"),
        F.when(mh.isNotNull(), F.floor(c0 / mh * 1000000 + 0.5) / 1000000).alias(
            "p_innovation"
        ),
        F.when(
            mh.isNotNull(), F.floor((c0 / mh + c1) * 1000000 + 0.5) / 1000000
        ).alias("q_imitation"),
    )


# ------------------------------------------ capture-recapture estimate
@register(
    "q_capture_recapture",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE strftime(o_orderdate, '%Y') = '1995'),
b AS (SELECT DISTINCT o_custkey FROM orders
      WHERE strftime(o_orderdate, '%Y') = '1996'),
s AS (SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n1,
             CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n2,
             CAST((SELECT COUNT(*) FROM a JOIN b USING (o_custkey)) AS BIGINT) AS m)
SELECT n1, n2, m,
       FLOOR(n1 * 1.0 * n2 / m * 100 + 0.5) / 100 AS n_lincoln_petersen,
       FLOOR(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) * 100 + 0.5) / 100
         AS n_chapman,
       FLOOR(m * 1.0 / n1 * 1000000 + 0.5) / 1000000 AS recapture_rate
FROM s
""",
    doc="capture-recapture population estimate: customers active in 1995 "
    "(capture) vs 1996 (recapture) give the Lincoln-Petersen and the "
    "bias-corrected Chapman (1951) estimators of the total reachable "
    "customer base — the marketing/ecology answer to 'how many "
    "customers exist that we have not seen yet', and a useful "
    "completeness check on any entity-resolution pipeline (two "
    "independent match passes -> estimated true entity count).  "
    "Exact distinct counts and one closed-form division each; the "
    "Chapman +1 correction keeps the estimator finite even at m=0.  "
    "Scale: two distinct-aggregates and one key equi-join — the "
    "customer dimension never broadcasts anything data-sized.",
)
def q_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    yr = F.date_format("o_orderdate", "yyyy")
    a = o.where(yr == "1995").select("o_custkey").distinct()
    b = o.where(yr == "1996").select("o_custkey").distinct()
    s = (
        a.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).alias("n2"))))
        .crossJoin(
            F.broadcast(a.join(b, "o_custkey").agg(F.count(F.lit(1)).alias("m")))
        )
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    return s.select(
        "n1",
        "n2",
        "m",
        (F.floor(n1 * 1.0 * n2 / m * 100 + 0.5) / 100).alias("n_lincoln_petersen"),
        (
            F.floor(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) * 100 + 0.5) / 100
        ).alias("n_chapman"),
        (F.floor(m * 1.0 / n1 * 1000000 + 0.5) / 1000000).alias("recapture_rate"),
    )


# ------------------------------------- interrupted time series (segmented OLS)
_ITS_ORIGIN = "1995-01-01"
_ITS_BREAK_T = 1096  # days from origin to the 1998-01-01 intervention


@register(
    "q_interrupted_ts",
    oracle=f"""
WITH daily AS (
  SELECT CAST(DATEDIFF('day', DATE '{_ITS_ORIGIN}', CAST(o_orderdate AS DATE))
              AS BIGINT) AS t,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
seg AS (
  SELECT CASE WHEN t < {_ITS_BREAK_T} THEN 'pre' ELSE 'post' END AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(t AS HUGEINT)) AS st, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(t AS HUGEINT) * t) AS stt, SUM(CAST(t AS HUGEINT) * y) AS sty
  FROM daily GROUP BY 1),
w AS (SELECT
        MAX(CASE WHEN s = 'pre' THEN n END) AS n1,
        MAX(CASE WHEN s = 'pre' THEN st END) AS st1,
        MAX(CASE WHEN s = 'pre' THEN sy END) AS sy1,
        MAX(CASE WHEN s = 'pre' THEN stt END) AS stt1,
        MAX(CASE WHEN s = 'pre' THEN sty END) AS sty1,
        MAX(CASE WHEN s = 'post' THEN n END) AS n2,
        MAX(CASE WHEN s = 'post' THEN st END) AS st2,
        MAX(CASE WHEN s = 'post' THEN sy END) AS sy2,
        MAX(CASE WHEN s = 'post' THEN stt END) AS stt2,
        MAX(CASE WHEN s = 'post' THEN sty END) AS sty2
      FROM seg),
fit AS (SELECT n1, n2,
               CAST(n1 * sty1 - st1 * sy1 AS DOUBLE)
                 / CAST(n1 * stt1 - st1 * st1 AS DOUBLE) AS b1,
               CAST(n2 * sty2 - st2 * sy2 AS DOUBLE)
                 / CAST(n2 * stt2 - st2 * st2 AS DOUBLE) AS b2,
               CAST(st1 AS DOUBLE) AS st1d, CAST(sy1 AS DOUBLE) AS sy1d,
               CAST(st2 AS DOUBLE) AS st2d, CAST(sy2 AS DOUBLE) AS sy2d
        FROM w),
lvl AS (SELECT n1, n2, b1, b2,
               (sy1d - b1 * st1d) / n1 + b1 * {_ITS_BREAK_T} AS y1_at_t0,
               (sy2d - b2 * st2d) / n2 + b2 * {_ITS_BREAK_T} AS y2_at_t0
        FROM fit)
SELECT n1 AS n_days_pre, n2 AS n_days_post,
       FLOOR(b1 / 100 * 10000 + 0.5) / 10000 AS slope_pre,
       FLOOR(b2 / 100 * 10000 + 0.5) / 10000 AS slope_post,
       FLOOR(y1_at_t0 / 100 * 100 + 0.5) / 100 AS level_pre_t0,
       FLOOR(y2_at_t0 / 100 * 100 + 0.5) / 100 AS level_post_t0,
       FLOOR((y2_at_t0 - y1_at_t0) / 100 * 100 + 0.5) / 100 AS level_change,
       FLOOR((b2 - b1) / 100 * 10000 + 0.5) / 10000 AS slope_change
FROM lvl
""",
    doc="interrupted time series / segmented regression (the single-"
    "series causal readout; e.g. Wagner et al. 2002): separate OLS "
    "trend lines for daily revenue BEFORE and AFTER a fixed "
    "intervention day, both extrapolated TO the break point — "
    "level_change is the immediate jump, slope_change the trend break. "
    "Complements e_did_estimate/q_event_study (which need a control "
    "arm; ITS is what you run when there isn't one).  Exactness: day "
    "index and daily cents are exact ints, per-segment moment sums "
    "accumulate in HUGEINT/decimal, each slope/intercept/projection is "
    "one mirrored float tree.  The honest TPC-H readout is ~no break — "
    "uniform synthetic demand — which the near-zero deltas show.  "
    "Scale: one date-keyed partial agg to calendar-bounded daily "
    "cells, then a 2-cell conditional rollup; nothing re-scans the "
    "fact table.",
)
def q_interrupted_ts(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_ITS_ORIGIN).cast("date"))
        .cast("long")
        .alias("t")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
    seg = daily.groupBy(
        F.when(F.col("t") < _ITS_BREAK_T, "pre").otherwise("post").alias("s")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("t"))).alias("st"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("t")) * F.col("t")).alias("stt"),
        F.sum(dec(F.col("t")) * F.col("y")).alias("sty"),
    )
    pick = lambda sv, c: F.max(F.when(F.col("s") == sv, F.col(c)))  # noqa: E731
    w = seg.agg(
        pick("pre", "n").alias("n1"),
        pick("pre", "st").alias("st1"),
        pick("pre", "sy").alias("sy1"),
        pick("pre", "stt").alias("stt1"),
        pick("pre", "sty").alias("sty1"),
        pick("post", "n").alias("n2"),
        pick("post", "st").alias("st2"),
        pick("post", "sy").alias("sy2"),
        pick("post", "stt").alias("stt2"),
        pick("post", "sty").alias("sty2"),
    )
    n1d, n2d = F.col("n1").cast("decimal(38,0)"), F.col("n2").cast("decimal(38,0)")
    fit = w.select(
        "n1",
        "n2",
        (
            (n1d * F.col("sty1") - F.col("st1") * F.col("sy1")).cast("double")
            / (n1d * F.col("stt1") - F.col("st1") * F.col("st1")).cast("double")
        ).alias("b1"),
        (
            (n2d * F.col("sty2") - F.col("st2") * F.col("sy2")).cast("double")
            / (n2d * F.col("stt2") - F.col("st2") * F.col("st2")).cast("double")
        ).alias("b2"),
        F.col("st1").cast("double").alias("st1d"),
        F.col("sy1").cast("double").alias("sy1d"),
        F.col("st2").cast("double").alias("st2d"),
        F.col("sy2").cast("double").alias("sy2d"),
    )
    lvl = fit.select(
        "n1",
        "n2",
        "b1",
        "b2",
        (
            (F.col("sy1d") - F.col("b1") * F.col("st1d")) / F.col("n1")
            + F.col("b1") * _ITS_BREAK_T
        ).alias("y1_at_t0"),
        (
            (F.col("sy2d") - F.col("b2") * F.col("st2d")) / F.col("n2")
            + F.col("b2") * _ITS_BREAK_T
        ).alias("y2_at_t0"),
    )
    r4 = lambda c: F.floor(c / 100 * 10000 + 0.5) / 10000  # noqa: E731
    r2 = lambda c: F.floor(c / 100 * 100 + 0.5) / 100  # noqa: E731
    return lvl.select(
        F.col("n1").alias("n_days_pre"),
        F.col("n2").alias("n_days_post"),
        r4(F.col("b1")).alias("slope_pre"),
        r4(F.col("b2")).alias("slope_post"),
        r2(F.col("y1_at_t0")).alias("level_pre_t0"),
        r2(F.col("y2_at_t0")).alias("level_post_t0"),
        r2(F.col("y2_at_t0") - F.col("y1_at_t0")).alias("level_change"),
        r4(F.col("b2") - F.col("b1")).alias("slope_change"),
    )


# ------------------------------------------------ Granger causality (lag-1)
@register(
    "e_granger_causality",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1),
pairs AS (
  SELECT cur.y AS yt, prev.y AS z1, prev.x AS z2
  FROM daily cur JOIN daily prev ON cur.d = prev.d + INTERVAL 1 DAY),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(z1 AS HUGEINT)) AS s1, SUM(CAST(z2 AS HUGEINT)) AS s2,
             SUM(CAST(yt AS HUGEINT)) AS sy,
             SUM(CAST(z1 AS HUGEINT) * z1) AS s11,
             SUM(CAST(z2 AS HUGEINT) * z2) AS s22,
             SUM(CAST(z1 AS HUGEINT) * z2) AS s12,
             SUM(CAST(z1 AS HUGEINT) * yt) AS s1y,
             SUM(CAST(z2 AS HUGEINT) * yt) AS s2y,
             SUM(CAST(yt AS HUGEINT) * yt) AS syy
      FROM pairs),
c AS (SELECT n,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy
      FROM m),
fit AS (SELECT n, c1y, c2y, cyy,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2,
               c1y * c1y / c11 AS expl_r
        FROM c),
rss AS (SELECT n, b1, b2,
               cyy - expl_r AS rss_r,
               cyy - (b1 * c1y + b2 * c2y) AS rss_u
        FROM fit)
SELECT n AS n_samples,
       FLOOR(b1 * 1000000 + 0.5) / 1000000 AS coef_y_lag1,
       FLOOR(b2 * 1000000 + 0.5) / 1000000 AS coef_x_lag1,
       CAST(1 AS BIGINT) AS dof_num, n - 3 AS dof_den,
       FLOOR((rss_r - rss_u) * (n - 3) / rss_u * 1000000 + 0.5) / 1000000
         AS f_stat
FROM rss
""",
    doc="lag-1 Granger causality screen (Granger 1969): do yesterday's "
    "CLICKS improve today's PURCHASE forecast beyond yesterday's "
    "purchases alone?  Restricted (AR-1) vs unrestricted (AR-1 + "
    "exogenous lag) OLS on the daily panel, F = ((RSS_r - RSS_u)/1) / "
    "(RSS_u/(n-3)) — the time-series causality companion to "
    "e_cross_correlation (association only) and q_interrupted_ts/"
    "e_did_estimate (designed interventions).  The lag pairs come from "
    "a calendar self-join on d = prev_d + 1 (no global window "
    "anywhere); all moment sums are exact HUGEINT/decimal ints, "
    "centered second moments lift n-scaled, and the 2x2 normal "
    "equations solve in closed form with mirrored float trees.  "
    "Scale: one event-scan partial agg to calendar-bounded daily "
    "cells; the self-join and everything after run on that tiny "
    "relation.",
)
def e_granger_causality(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    prev = daily.select(
        F.date_add("d", 1).alias("d"), F.col("y").alias("z1"), F.col("x").alias("z2")
    )
    pairs = daily.select("d", F.col("y").alias("yt")).join(prev, "d")
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("z1"))).alias("s1"),
        F.sum(dec(F.col("z2"))).alias("s2"),
        F.sum(dec(F.col("yt"))).alias("sy"),
        F.sum(dec(F.col("z1")) * F.col("z1")).alias("s11"),
        F.sum(dec(F.col("z2")) * F.col("z2")).alias("s22"),
        F.sum(dec(F.col("z1")) * F.col("z2")).alias("s12"),
        F.sum(dec(F.col("z1")) * F.col("yt")).alias("s1y"),
        F.sum(dec(F.col("z2")) * F.col("yt")).alias("s2y"),
        F.sum(dec(F.col("yt")) * F.col("yt")).alias("syy"),
    )
    nD = F.col("n").cast("decimal(38,0)")
    c = m.select(
        "n",
        (nD * F.col("s11") - F.col("s1") * F.col("s1")).cast("double").alias("c11"),
        (nD * F.col("s22") - F.col("s2") * F.col("s2")).cast("double").alias("c22"),
        (nD * F.col("s12") - F.col("s1") * F.col("s2")).cast("double").alias("c12"),
        (nD * F.col("s1y") - F.col("s1") * F.col("sy")).cast("double").alias("c1y"),
        (nD * F.col("s2y") - F.col("s2") * F.col("sy")).cast("double").alias("c2y"),
        (nD * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    fit = c.select(
        "n",
        "c1y",
        "c2y",
        "cyy",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias("b2"),
        (F.col("c1y") * F.col("c1y") / F.col("c11")).alias("expl_r"),
    )
    rss = fit.select(
        "n",
        "b1",
        "b2",
        (F.col("cyy") - F.col("expl_r")).alias("rss_r"),
        (F.col("cyy") - (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))).alias(
            "rss_u"
        ),
    )
    r6 = lambda col: F.floor(col * 1000000 + 0.5) / 1000000  # noqa: E731
    return rss.select(
        F.col("n").alias("n_samples"),
        r6(F.col("b1")).alias("coef_y_lag1"),
        r6(F.col("b2")).alias("coef_x_lag1"),
        F.lit(1).cast("long").alias("dof_num"),
        (F.col("n") - 3).alias("dof_den"),
        r6((F.col("rss_r") - F.col("rss_u")) * (F.col("n") - 3) / F.col("rss_u")).alias(
            "f_stat"
        ),
    )
