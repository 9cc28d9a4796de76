"""Statistical tests / estimators / in-engine ML catalog queries.

Split from the round-3..6 stats_graph suite (round-7 verdict #6) — pure
mechanical move, registry names and oracles unchanged.  OLS (trend,
multi-feature, grouped quantile machinery), rank/distribution tests (KS,
Mann-Whitney, runs, chi-square, ANOVA, Benford, FDR), Gini/Wasserstein,
logistic GD, WoE/IV, conformal + calibration + isotonic, k-means step.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import load_table
from . import register

# ------------------------------------------------------ per-group OLS trend
@register(
    "q_ols_trend",
    oracle="""
WITH pts AS (
  SELECT n.n_name,
         CAST((EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
              + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS BIGINT) AS x,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey),
s AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
  FROM pts GROUP BY n_name),
m AS (
  SELECT n_name, n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) AS slope,
         CAST(sx AS DOUBLE) / n AS mx,
         CAST(sy AS DOUBLE) / n AS my
  FROM s)
SELECT n_name,
       n AS n_orders,
       FLOOR(slope / 100 * 10000 + 0.5) / 10000 AS slope_dollars_per_month,
       FLOOR((my - slope * mx) / 100 * 10000 + 0.5) / 10000 AS intercept_dollars
FROM m
ORDER BY n_name
""",
    doc="per-nation OLS trend of order revenue vs month index — the "
    "regr_slope/regr_intercept aggregate family re-derived from exact "
    "integer moment sums (cents as BIGINT, the one cross-term as "
    "DECIMAL(38,0)/HUGEINT so a 100 TB row count cannot overflow it).  "
    "Determinism: the five moments are exact integers, so partial-agg "
    "order cannot move them; slope/intercept derive in identical IEEE "
    "trees with explicit floor-rounding (the e_cuped_adjust recipe).  "
    "Scale: ONE nation-keyed partial-agg'd shuffle after broadcast dim "
    "joins — the fact table is scanned once, and per-group state is "
    "five numbers regardless of group size.",
)
def q_ols_trend(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    x = (
        (F.year("o_orderdate") - F.lit(1995)) * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    pts = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name"), x.alias("x"), y.alias("y"))
    )
    s = pts.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        # the cent sum rides DECIMAL(38): a 100 TB orders table times
        # ~5e7 max cents is past signed-64, and non-ANSI Spark would
        # wrap a long sum SILENTLY
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    nn = F.col("n")
    slope = (
        F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / nn
    ) / (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / nn
    )
    m = s.select(
        "n_name",
        nn.alias("n"),
        slope.alias("slope"),
        (F.col("sx").cast("double") / nn).alias("mx"),
        (F.col("sy").cast("double") / nn).alias("my"),
    )
    return m.select(
        "n_name",
        F.col("n").alias("n_orders"),
        (F.floor(F.col("slope") / 100 * 10000 + 0.5) / 10000).alias(
            "slope_dollars_per_month"
        ),
        (
            F.floor((F.col("my") - F.col("slope") * F.col("mx")) / 100 * 10000 + 0.5)
            / 10000
        ).alias("intercept_dollars"),
    ).orderBy("n_name")
# ------------------------------------------------------ k-means Lloyd step
_KM_K = 8
_KM_SCALE = 1_000_000  # micro-unit quantization -> exact integer geometry


@register(
    "v_kmeans_step",
    oracle=f"""
WITH e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * {_KM_SCALE} + 0.5) AS BIGINT)) AS v
  FROM embeddings),
seeds AS (
  SELECT vec_id AS cid, v AS c
  FROM e ORDER BY {portable_hash64_sql("CAST(vec_id AS VARCHAR)")}, vec_id
  LIMIT {_KM_K}),
ex AS (SELECT vec_id, unnest(v) AS x,
              unnest(generate_series(1, len(v))) AS pos FROM e),
cx AS (SELECT cid, unnest(c) AS cx,
              unnest(generate_series(1, len(c))) AS pos FROM seeds),
d AS (SELECT ex.vec_id, cx.cid,
             SUM(CAST((ex.x - cx.cx) * (ex.x - cx.cx) AS DECIMAL(38,0))) AS d2
      FROM ex JOIN cx ON ex.pos = cx.pos
      GROUP BY ex.vec_id, cx.cid),
assign AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
    FROM d) __r
  WHERE rk = 1),
upd AS (SELECT a.cid, ex.pos,
               CAST(SUM(ex.x) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS n
        FROM assign a JOIN ex ON a.vec_id = ex.vec_id
        GROUP BY a.cid, ex.pos),
shift AS (SELECT u.cid, MAX(u.n) AS n_assigned,
                 SUM(CAST(u.sx - u.n * c.cx AS HUGEINT)
                     * (u.sx - u.n * c.cx)) AS s2num
          FROM upd u JOIN cx c ON u.cid = c.cid AND u.pos = c.pos
          GROUP BY u.cid),
inert AS (SELECT cid, SUM(d2) AS inertia FROM assign GROUP BY cid)
SELECT s.cid AS cluster_id, s.n_assigned,
       FLOOR(CAST(i.inertia AS DOUBLE) / {_KM_SCALE * _KM_SCALE}
             * 1000000 + 0.5) / 1000000 AS inertia_unit2,
       FLOOR(sqrt(CAST(s.s2num AS DOUBLE)) / s.n_assigned / {_KM_SCALE}
             * 1000000 + 0.5) / 1000000 AS centroid_shift
FROM shift s JOIN inert i ON s.cid = i.cid
ORDER BY cluster_id
""",
    doc="one exactly-verified Lloyd iteration of k-means over the "
    "embeddings table: hash-gate TakeOrdered picks the 8 seed vectors, "
    "every vector is assigned to its nearest seed, and the centroid "
    "update + inertia + per-cluster centroid shift come out of the SAME "
    "query — the oracle-paired twin of the engine-specific KMeans/"
    "AutoKMeans operators (operators/similarity.py:78,94; reference "
    "src/spark_fuse/similarity/partitioners.py), turning the rows-only "
    "M5/M6 family member into a hash-checked one.  Determinism: "
    "components quantize to micro-unit BIGINTs up front, so distances, "
    "argmin (d2 then cid tie-break), centroid sums, and the shift "
    "numerator sum((sx - n*cx)^2) are ALL exact integers — no float "
    "fold anywhere before the final sqrt/divide, which both engines "
    "evaluate on identical inputs.  Scale: seeds ride a distributed "
    "TakeOrdered (per-partition top-8, never a global sort); the "
    "assignment join is a 512-row broadcast panel against the skinny "
    "(vec_id, pos, x) stream; every groupBy is partial-agg'd; no "
    "collect_list — per-group state is one integer per (cluster, dim).",
)
def v_kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * _KM_SCALE + 0.5).cast("long"),
        ).alias("v"),
    )
    seeds = (
        e.orderBy(portable_hash64(F.col("vec_id").cast("string")), "vec_id")
        .limit(_KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )
    ex = e.select("vec_id", F.posexplode("v").alias("pos", "x"))
    cx = seeds.select("cid", F.posexplode("c").alias("pos", "cx"))
    d = (
        ex.join(F.broadcast(cx), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                ((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).cast(
                    "decimal(38,0)"
                )
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    assign = (
        d.select("vec_id", "cid", "d2", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    upd = (
        assign.join(ex, "vec_id")
        .groupBy("cid", "pos")
        .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
    )
    diff = (F.col("sx") - F.col("n") * F.col("cx")).cast("decimal(38,0)")
    shift = (
        upd.join(F.broadcast(cx), ["cid", "pos"])
        .groupBy("cid")
        .agg(
            F.max("n").alias("n_assigned"),
            # the diff is cast to DECIMAL(38) BEFORE squaring — a big
            # cluster's (sx - n*cx) alone can near signed-64, and the
            # long square would wrap pre-cast
            F.sum(diff * diff).alias("s2num"),
        )
    )
    inert = assign.groupBy("cid").agg(F.sum("d2").alias("inertia"))
    return (
        shift.join(inert, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_assigned",
            (
                F.floor(
                    F.col("inertia").cast("double")
                    / (_KM_SCALE * _KM_SCALE)
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("inertia_unit2"),
            (
                F.floor(
                    F.sqrt(F.col("s2num").cast("double"))
                    / F.col("n_assigned")
                    / _KM_SCALE
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("centroid_shift"),
        )
        .orderBy("cluster_id")
    )
# --------------------------------------------------------- one-way ANOVA
@register(
    "q_anova_oneway",
    oracle="""
WITH pts AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders),
g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM pts GROUP BY grp),
pan AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(sy) AS DOUBLE) AS s, CAST(SUM(syy) AS DOUBLE) AS q,
         SUM(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) AS t
  FROM g)
SELECT k AS k_groups, nt AS n_total,
       FLOOR(((t - s * s / nt) / (k - 1)) / ((q - t) / (nt - k)) * 10000 + 0.5)
         / 10000 AS f_stat,
       FLOOR((t - s * s / nt) / (q - s * s / nt) * 1000000 + 0.5) / 1000000
         AS eta_sq
FROM pan
""",
    doc="one-way ANOVA over order totals by priority class (completes the "
    "hypothesis-test family next to the t/KS/Mann-Whitney/chi-square "
    "panels): F = (SSB/(k-1)) / (SSW/(N-k)) plus the eta-squared effect "
    "size, derived entirely from per-group exact integer moment sums "
    "(cents as BIGINT, sums lifted to DECIMAL(38) per the house rule so "
    "a 100 TB row count cannot overflow) — SSB = T - S^2/N and "
    "SSW = Q - T with T = sum(S_g^2/n_g) computed on the k-row panel.  "
    "Scale: ONE map-side-combined shuffle to k rows; per-group state is "
    "three numbers regardless of group size; panel math is k-row.",
)
def q_anova_oneway(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    pts = o.select(F.col("o_orderpriority").alias("grp"), y.alias("y"))
    g = pts.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    pan = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("sy").cast("double").alias("s"),
        F.sum("syy").cast("double").alias("q"),
        F.sum(
            F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("n")
        ).alias("t"),
    )
    ssb = F.col("t") - F.col("s") * F.col("s") / F.col("nt")
    ssw = F.col("q") - F.col("t")
    sst = F.col("q") - F.col("s") * F.col("s") / F.col("nt")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nt") - F.col("k")))
    return pan.select(
        F.col("k").alias("k_groups"),
        F.col("nt").alias("n_total"),
        (F.floor(f_stat * 10000 + 0.5) / 10000).alias("f_stat"),
        (F.floor(ssb / sst * 1000000 + 0.5) / 1000000).alias("eta_sq"),
    )
# --------------------------------------- per-group-span histogram quantiles
_BH_BINS = 64


@register(
    "q_brand_price_histogram",
    oracle=f"""
WITH span AS (
  SELECT p_brand, MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi
  FROM part GROUP BY p_brand),
b AS (
  SELECT p.p_brand,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE LEAST({_BH_BINS - 1},
                         CAST(FLOOR((p.p_retailprice - s.lo)
                                    / (s.hi - s.lo) * {_BH_BINS}) AS BIGINT))
         END AS bin
  FROM part p JOIN span s ON p.p_brand = s.p_brand),
h AS (SELECT p_brand, bin, COUNT(*) AS c FROM b GROUP BY p_brand, bin),
n AS (SELECT p_brand, SUM(c) AS n FROM h GROUP BY p_brand),
cum AS (
  SELECT h.p_brand, h.bin, h.c, n.n,
         SUM(h.c) OVER (PARTITION BY h.p_brand ORDER BY h.bin) AS cc
  FROM h JOIN n ON h.p_brand = n.p_brand),
qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.75)) v(q)),
hit AS (
  SELECT p_brand, q, bin,
         ROW_NUMBER() OVER (PARTITION BY p_brand, q ORDER BY bin) AS rk
  FROM cum CROSS JOIN qs WHERE cc >= q * n),
est AS (
  SELECT h.p_brand, h.q,
         s.lo + (h.bin + 0.5) * (s.hi - s.lo) / {_BH_BINS} AS est
  FROM hit h JOIN span s ON h.p_brand = s.p_brand WHERE h.rk = 1)
SELECT p_brand, q AS quantile, FLOOR(est * 100 + 0.5) / 100 AS est_price
FROM est
ORDER BY p_brand, quantile
""",
    doc="per-group-SPAN histogram quantiles (the second consumer of the "
    "promoted operators/histogram.py machinery): each brand's retail-"
    "price p25/p50/p75 estimated from a 64-bin equi-width histogram "
    "binned against that brand's OWN lo/hi — the right variant when "
    "group value ranges differ by orders of magnitude and a shared "
    "global span would collapse small-range groups into one bin.  "
    "Scale: identical mergeable-histogram shape as "
    "x_histogram_quantiles — one bounded (brand, bin) aggregate, all "
    "windows over <= 64 rows per (brand, q); the span join broadcasts "
    "a |brands|-row panel.",
)
def q_brand_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.histogram import (
        equi_width_histogram,
        histogram_quantiles,
        value_span,
    )

    p = load_table(spark, sf, "part")
    base = p.select("p_brand", "p_retailprice")
    span = value_span(base, "p_retailprice", ["p_brand"])
    h = equi_width_histogram(
        base,
        "p_retailprice",
        _BH_BINS,
        group_cols=["p_brand"],
        span=span,
        span_group_cols=["p_brand"],
    )
    est = histogram_quantiles(
        spark,
        h,
        span,
        [0.25, 0.5, 0.75],
        _BH_BINS,
        group_cols=["p_brand"],
        span_group_cols=["p_brand"],
    )
    return est.select(
        "p_brand",
        F.col("q").alias("quantile"),
        (F.floor(F.col("est") * 100 + 0.5) / 100).alias("est_price"),
    ).orderBy("p_brand", "quantile")
# ---------------------------------------------- chi-square independence
@register(
    "q_chi2_independence",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders GROUP BY o_orderpriority, o_orderstatus),
rowtot AS (SELECT r, CAST(SUM(obs) AS BIGINT) AS rt FROM cells GROUP BY r),
coltot AS (SELECT c, CAST(SUM(obs) AS BIGINT) AS ct FROM cells GROUP BY c),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
grid AS (SELECT rowtot.r, rowtot.rt, coltot.c, coltot.ct
         FROM rowtot CROSS JOIN coltot),
terms AS (
  SELECT COALESCE(cells.obs, 0) AS obs,
         CAST(grid.rt AS DOUBLE) * grid.ct / tot.n AS exp
  FROM grid LEFT JOIN cells ON grid.r = cells.r AND grid.c = cells.c
            CROSS JOIN tot),
panel AS (
  SELECT CAST(SUM((obs - exp) * (obs - exp) / exp) AS DOUBLE) AS chi2
  FROM terms),
dims AS (
  SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS r_levels,
         CAST(COUNT(DISTINCT c) AS BIGINT) AS c_levels
  FROM cells)
SELECT t.n AS n_rows,
       t.n_cells,
       d.r_levels,
       d.c_levels,
       (d.r_levels - 1) * (d.c_levels - 1) AS dof,
       FLOOR(p.chi2 * 10000 + 0.5) / 10000 AS chi2,
       FLOOR(SQRT(p.chi2 / (t.n * CAST(LEAST(d.r_levels, d.c_levels) - 1 AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS cramers_v
FROM panel p CROSS JOIN tot t CROSS JOIN dims d
""",
    doc="chi-square test of independence between order priority and "
    "order status, plus Cramér's V effect size — the categorical-drift "
    "check a data-quality gate runs between corpus snapshots.  Scale: "
    "ONE partial-aggregated shuffle reduces the fact table to the "
    "R x C contingency cells (structurally tiny: distinct priorities x "
    "statuses); margins, expected counts, the chi-square sum, and the "
    "dof/effect-size panel all derive from that cell table via "
    "broadcast joins of one-row panels — the fact is scanned once and "
    "nothing downstream grows with data volume.  The full R x C grid "
    "is rebuilt from the margins and left-joined to the observed "
    "cells, so combinations that never occur still contribute their "
    "expected count (the textbook statistic).  Determinism: observed "
    "counts and margins are exact integers; expected counts and the "
    "15-term chi-square sum are IEEE-identical expression trees on "
    "both engines, floor-rounded at the published grain.  The cell "
    "frame is localCheckpointed: four consumers (margins x2, total, "
    "dims) would otherwise each replicate the fact scan.",
)
def q_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    cells = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
        )
        .agg(F.count("*").alias("obs"))
        .localCheckpoint()
    )
    rowtot = cells.groupBy("r").agg(F.sum("obs").alias("rt"))
    coltot = cells.groupBy("c").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(
        F.sum("obs").alias("n"), F.count("*").alias("n_cells")
    )
    dims = cells.agg(
        F.countDistinct("r").alias("r_levels"),
        F.countDistinct("c").alias("c_levels"),
    )
    grid = rowtot.crossJoin(F.broadcast(coltot))
    terms = (
        grid.join(F.broadcast(cells), ["r", "c"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("exp"),
        )
    )
    panel = terms.agg(
        F.sum(
            (F.col("obs") - F.col("exp"))
            * (F.col("obs") - F.col("exp"))
            / F.col("exp")
        )
        .cast("double")
        .alias("chi2")
    )
    return (
        panel.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("n").alias("n_rows"),
            "n_cells",
            "r_levels",
            "c_levels",
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("dof"),
            (F.floor(F.col("chi2") * 10000 + 0.5) / 10000).alias("chi2"),
            (
                F.floor(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n")
                            * (F.least("r_levels", "c_levels") - 1).cast("double")
                        )
                    )
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("cramers_v"),
        )
    )
# ------------------------------------------------- correlation matrix
@register(
    "q_corr_matrix",
    oracle="""
WITH pts AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS z
  FROM lineitem),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
         SUM(CAST(z * z AS DECIMAL(38,0))) AS szz,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(x * z AS DECIMAL(38,0))) AS sxz,
         SUM(CAST(y * z AS DECIMAL(38,0))) AS syz
  FROM pts),
d AS (
  SELECT n,
         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         CAST(sz AS DOUBLE) AS sz, CAST(sxx AS DOUBLE) AS sxx,
         CAST(syy AS DOUBLE) AS syy, CAST(szz AS DOUBLE) AS szz,
         CAST(sxy AS DOUBLE) AS sxy, CAST(sxz AS DOUBLE) AS sxz,
         CAST(syz AS DOUBLE) AS syz
  FROM m)
SELECT pair, n AS n_rows,
       FLOOR(corr_r * 1000000 + 0.5) / 1000000 AS corr_r
FROM (
  SELECT 'quantity~extendedprice' AS pair, n,
         (n * sxy - sx * sy)
           / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_r
  FROM d
  UNION ALL
  SELECT 'quantity~discount', n,
         (n * sxz - sx * sz)
           / SQRT((n * sxx - sx * sx) * (n * szz - sz * sz))
  FROM d
  UNION ALL
  SELECT 'extendedprice~discount', n,
         (n * syz - sy * sz)
           / SQRT((n * syy - sy * sy) * (n * szz - sz * sz))
  FROM d) u
ORDER BY pair
""",
    doc="pairwise Pearson correlation matrix over lineitem's (quantity, "
    "extendedprice, discount), computed from ONE scan: all ten moment "
    "sums (n, three first moments, three squares, three cross products) "
    "reduce in a single partial-aggregated pass, then the three "
    "correlations derive from the one-row moment panel — the "
    "feature-screening primitive that must never rescan a 100 TB fact "
    "per pair.  Moments ride exact integers (values scaled to "
    "cents/basis points as BIGINT, every product widened to "
    "DECIMAL(38,0) so a 100 TB row count cannot overflow), which makes "
    "them invariant to partial-agg order; the correlation itself is an "
    "IEEE-identical double tree over the ten exact moments on both "
    "engines.  Scale: one scan, one reduce to a single row, and a "
    "3-row literal unpivot — nothing downstream of the scan grows "
    "with data.",
)
def q_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    pts = load_table(spark, sf, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("z"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum("z").alias("sz"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(38,0)")).alias("szz"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("z")).cast("decimal(38,0)")).alias("sxz"),
        F.sum((F.col("y") * F.col("z")).cast("decimal(38,0)")).alias("syz"),
    )
    d = m.select(
        "n",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz")
        ],
    )

    def corr(sab, sa, sb, saa, sbb):
        n = F.col("n")
        return (n * F.col(sab) - F.col(sa) * F.col(sb)) / F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa))
            * (n * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    rows = d.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("r_qty_price"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("r_qty_disc"),
        corr("syz", "sy", "sz", "syy", "szz").alias("r_price_disc"),
    ).selectExpr(
        """stack(3,
            'quantity~extendedprice', r_qty_price,
            'quantity~discount', r_qty_disc,
            'extendedprice~discount', r_price_disc) AS (pair, corr_raw)""",
        "n AS n_rows",
    )
    return rows.select(
        "pair",
        "n_rows",
        (F.floor(F.col("corr_raw") * 1000000 + 0.5) / 1000000).alias("corr_r"),
    ).orderBy("pair")
# ------------------------------------------- two-sample KS drift test
@register(
    "q_ks_2sample",
    oracle="""
WITH pop AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995 THEN 1 ELSE 0 END AS a
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)),
cells AS (
  SELECT v, CAST(SUM(a) AS BIGINT) AS a_cnt,
         CAST(COUNT(*) - SUM(a) AS BIGINT) AS b_cnt
  FROM pop GROUP BY v),
cum AS (
  SELECT v,
         SUM(a_cnt) OVER (ORDER BY v) AS ca,
         SUM(b_cnt) OVER (ORDER BY v) AS cb
  FROM cells),
panel AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a,
                 CAST(SUM(b_cnt) AS BIGINT) AS n_b FROM cells),
dmax AS (
  SELECT MAX(ABS(CAST(c.ca AS HUGEINT) * p.n_b
                 - CAST(c.cb AS HUGEINT) * p.n_a)) AS num
  FROM cum c CROSS JOIN panel p),
stat AS (
  SELECT p.n_a, p.n_b,
         CAST(d.num AS DOUBLE) / (CAST(p.n_a AS DOUBLE) * p.n_b) AS d_raw
  FROM dmax d CROSS JOIN panel p),
z AS (
  SELECT n_a, n_b, d_raw,
         SQRT(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) * d_raw AS z_raw
  FROM stat)
SELECT n_a, n_b,
       FLOOR(d_raw * 1000000 + 0.5) / 1000000 AS ks_d,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS ks_z,
       FLOOR(LEAST(1.0, 2 * EXP(-2 * z_raw * z_raw)) * 1000000 + 0.5)
         / 1000000 AS p_approx
FROM z
""",
    doc="exact two-sample Kolmogorov-Smirnov drift test between the "
    "1995 and 1996 order-value distributions — the distribution-drift "
    "gate a corpus pipeline runs between snapshots when a PSI bucket "
    "panel is too coarse.  D = sup|F_a - F_b| is computed EXACTLY: "
    "values reduce to per-distinct-value group counts, both empirical "
    "CDFs come from ONE two-phase distributed prefix-sum pass "
    "(operators/packing.with_prefix_sums: range partition + parallel "
    "local windows + bounded per-partition offsets — never a global "
    "single-task sort), and the sup is a max over the exact integer "
    "cross-difference |ca*n_b - cb*n_a| (widened past signed-64: "
    "DECIMAL(38,0) on Spark, HUGEINT in the oracle), so no float "
    "comparison can reorder the argmax.  The asymptotic p-value uses "
    "the one-term Kolmogorov tail 2*exp(-2z^2) (documented "
    "approximation, exact-identical trees on both engines).",
)
def q_ks_2sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sums

    o = load_table(spark, sf, "orders")
    pop = o.where(F.year("o_orderdate").isin(1995, 1996)).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.year("o_orderdate") == 1995, 1).otherwise(0).alias("a"),
    )
    cells = pop.groupBy("v").agg(
        F.sum("a").alias("a_cnt"),
        (F.count("*") - F.sum("a")).alias("b_cnt"),
    )
    cum = with_prefix_sums(
        cells, "v", {"a_cnt": "ca_ex", "b_cnt": "cb_ex"}
    ).select(
        "v",
        (F.col("ca_ex") + F.col("a_cnt")).alias("ca"),
        (F.col("cb_ex") + F.col("b_cnt")).alias("cb"),
    )
    panel = cells.agg(
        F.sum("a_cnt").alias("n_a"), F.sum("b_cnt").alias("n_b")
    )
    dmax = (
        cum.crossJoin(F.broadcast(panel))
        .select(
            F.abs(
                F.col("ca").cast("decimal(38,0)") * F.col("n_b")
                - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
            ).alias("num")
        )
        .agg(F.max("num").alias("num"))
    )
    stat = dmax.crossJoin(F.broadcast(panel)).select(
        "n_a",
        "n_b",
        (
            F.col("num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ).alias("d_raw"),
    )
    z = stat.select(
        "n_a",
        "n_b",
        "d_raw",
        (
            F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b")
                / (F.col("n_a") + F.col("n_b"))
            )
            * F.col("d_raw")
        ).alias("z_raw"),
    )
    return z.select(
        "n_a",
        "n_b",
        (F.floor(F.col("d_raw") * 1000000 + 0.5) / 1000000).alias("ks_d"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("ks_z"),
        (
            F.floor(
                F.least(
                    F.lit(1.0), 2 * F.exp(-2 * F.col("z_raw") * F.col("z_raw"))
                )
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("p_approx"),
    )
# --------------------------------------------- Mann-Whitney U rank test
@register(
    "q_mann_whitney",
    oracle="""
WITH pop AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995 THEN 1 ELSE 0 END AS a
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)),
cells AS (
  SELECT v, CAST(SUM(a) AS BIGINT) AS a_cnt,
         CAST(COUNT(*) AS BIGINT) AS t_cnt
  FROM pop GROUP BY v),
cum AS (
  SELECT v, a_cnt, t_cnt,
         CAST(COALESCE(SUM(t_cnt) OVER
              (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS cum_t
  FROM cells),
moments AS (
  SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a,
         CAST(SUM(t_cnt) - SUM(a_cnt) AS BIGINT) AS n_b,
         CAST(SUM(t_cnt) AS BIGINT) AS n,
         SUM(CAST(a_cnt AS HUGEINT) * (2 * cum_t + t_cnt + 1)) AS r2_a,
         SUM(CAST(t_cnt AS HUGEINT) * t_cnt * t_cnt - t_cnt) AS tie_t
  FROM cum),
stat AS (
  SELECT n_a, n_b, n,
         CAST(r2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2 AS u_a,
         CAST(n_a AS DOUBLE) * n_b / 12
           * ((n + 1) - CAST(tie_t AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
           AS var_u
  FROM moments),
z AS (
  SELECT n_a, n_b, u_a,
         (u_a - CAST(n_a AS DOUBLE) * n_b / 2) / SQRT(var_u) AS z_raw
  FROM stat)
SELECT n_a, n_b,
       FLOOR(u_a * 100 + 0.5) / 100 AS u_a,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR((1 / POW(1 + 0.278393 * ABS(z_raw) / SQRT(2)
                          + 0.230389 * ABS(z_raw) * ABS(z_raw) / 2
                          + 0.000972 * POW(ABS(z_raw) / SQRT(2), 3)
                          + 0.078108 * POW(ABS(z_raw) / SQRT(2), 4), 4))
             * 1000000 + 0.5) / 1000000 AS p_two_sided
FROM z
""",
    doc="tie-corrected Mann-Whitney U test between the 1995 and 1996 "
    "order-value samples — the nonparametric location-shift companion "
    "to q_ks_2sample's shape test.  Rank sums never materialize "
    "per-row ranks: values reduce to per-distinct-value counts, the "
    "shared midrank comes from the SAME two-phase prefix-sum pass the "
    "KS test uses (doubled ranks 2*cum+t+1 keep everything integer), "
    "and the rank sum is an exact widened-integer moment "
    "(HUGEINT/DECIMAL(38,0): a_cnt*rank2 and the tie term t^3-t both "
    "pass signed-64 at corpus scale).  The normal approximation uses "
    "the tie-corrected variance and the Abramowitz-Stegun 7.1.25 "
    "rational erfc bound for the two-sided p — an IEEE-identical "
    "polynomial on both engines (documented approximation, max abs "
    "error 5e-4 on the CDF).  Scale: one per-value partial-agg "
    "shuffle, one prefix pass, one one-row moment reduce.",
)
def q_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    o = load_table(spark, sf, "orders")
    pop = o.where(F.year("o_orderdate").isin(1995, 1996)).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.year("o_orderdate") == 1995, 1).otherwise(0).alias("a"),
    )
    cells = pop.groupBy("v").agg(
        F.sum("a").alias("a_cnt"), F.count("*").alias("t_cnt")
    )
    cum = with_prefix_sum(cells, "v", "t_cnt", out_col="cum_t")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    moments = cum.agg(
        F.sum("a_cnt").alias("n_a"),
        (F.sum("t_cnt") - F.sum("a_cnt")).alias("n_b"),
        F.sum("t_cnt").alias("n"),
        F.sum(
            dec(F.col("a_cnt"))
            * (2 * F.col("cum_t") + F.col("t_cnt") + 1)
        ).alias("r2_a"),
        F.sum(
            dec(F.col("t_cnt")) * F.col("t_cnt") * F.col("t_cnt") - F.col("t_cnt")
        ).alias("tie_t"),
    )
    stat = moments.select(
        "n_a",
        "n_b",
        "n",
        (
            (F.col("r2_a") - dec(F.col("n_a")) * (F.col("n_a") + 1)).cast("double")
            / 2
        ).alias("u_a"),
        (
            F.col("n_a").cast("double")
            * F.col("n_b")
            / 12
            * (
                (F.col("n") + 1)
                - F.col("tie_t").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1))
            )
        ).alias("var_u"),
    )
    z = stat.select(
        "n_a",
        "n_b",
        "u_a",
        (
            (F.col("u_a") - F.col("n_a").cast("double") * F.col("n_b") / 2)
            / F.sqrt(F.col("var_u"))
        ).alias("z_raw"),
    )
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    return z.select(
        "n_a",
        "n_b",
        (F.floor(F.col("u_a") * 100 + 0.5) / 100).alias("u_a"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (
            F.floor((1 / F.pow(denom, 4)) * 1000000 + 0.5) / 1000000
        ).alias("p_two_sided"),
    )
# ------------------------------------------------- Theil-Sen robust trend
@register(
    "q_theil_sen",
    oracle="""
WITH pts AS (
  SELECT n.n_name,
         CAST((EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
              + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS BIGINT) AS x,
         CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, x),
slopes AS (
  SELECT a.n_name,
         (CAST(b.y AS DOUBLE) - a.y) / (b.x - a.x) AS slope
  FROM pts a JOIN pts b ON a.n_name = b.n_name AND a.x < b.x)
SELECT n_name,
       CAST((SELECT COUNT(*) FROM pts p WHERE p.n_name = s.n_name) AS BIGINT)
         AS n_months,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       FLOOR(MEDIAN(slope) / 100 * 10000 + 0.5) / 10000 AS slope_dollars
FROM slopes s GROUP BY n_name
ORDER BY n_name
""",
    doc="Theil-Sen robust trend: the MEDIAN of all pairwise slopes of "
    "monthly revenue per nation — the 29%-breakdown-point companion to "
    "q_ols_trend's least-squares fit.  Slopes are exact-integer rises "
    "over integer runs (one double division each, IEEE-identical on "
    "both engines); the median is an order statistic of those identical "
    "doubles (both engines interpolate even counts as the midpoint "
    "mean), so no float accumulation ever crosses rows.  Scale: the "
    "pair self-join is keyed by nation and bounded by the month-count "
    "(≤84² pairs per group — a constant), never by row count; the "
    "monthly rollup is the only data-sized shuffle.",
)
def q_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
            ).cast("long").alias("x"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("y"))
        .localCheckpoint()  # feeds the self-join twice; pin one evaluation
    )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(
        b, (F.col("a.n_name") == F.col("b.n_name")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.n_name").alias("n_name"),
        (
            (F.col("b.y").cast("double") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    months = pts.groupBy("n_name").agg(F.count("*").alias("n_months"))
    agg = slopes.groupBy("n_name").agg(
        F.count("*").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("med"),
    )
    return (
        agg.join(F.broadcast(months), "n_name")
        .select(
            "n_name",
            "n_months",
            "n_pairs",
            (F.floor(F.col("med") / 100 * 10000 + 0.5) / 10000).alias("slope_dollars"),
        )
        .orderBy("n_name")
    )
# ---------------------------------------------------- Benford digit audit
@register(
    "q_benford_audit",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders),
counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders FROM digits GROUP BY digit),
total AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n FROM counts)
SELECT digit, n_orders,
       FLOOR(CAST(n_orders AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS obs_share,
       FLOOR(LOG10(1 + 1.0 / digit) * 1000000 + 0.5) / 1000000 AS benford_share,
       FLOOR(ABS(CAST(n_orders AS DOUBLE) / n - LOG10(1 + 1.0 / digit))
             * 1000000 + 0.5) / 1000000 AS abs_dev
FROM counts, total
ORDER BY digit
""",
    doc="Benford first-significant-digit audit of order totals — the "
    "classic anomaly screen for fabricated or truncated monetary data.  "
    "The digit is extracted through the integer-part STRING (never "
    "pow/log10 of the value, whose float boundary at exact powers of "
    "ten could disagree between engines); expected shares log10(1+1/d) "
    "are constant-folded identically on both sides.  Scale: one "
    "9-bucket map-side-combined groupBy over any row count.",
)
def q_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = o.select(digit).groupBy("digit").agg(F.count("*").alias("n_orders"))
    total = counts.agg(F.sum("n_orders").alias("n"))
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    obs = F.col("n_orders").cast("double") / F.col("n")
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            r6(obs).alias("obs_share"),
            r6(exp).alias("benford_share"),
            r6(F.abs(obs - exp)).alias("abs_dev"),
        )
        .orderBy("digit")
    )
# --------------------------------------------- exact weighted quantiles
@register(
    "q_weighted_deciles",
    oracle="""
WITH cells AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(SUM(l_quantity) AS BIGINT) AS w
  FROM lineitem GROUP BY v),
cum AS (
  SELECT v, w,
         CAST(SUM(w) OVER (ORDER BY v) AS BIGINT) AS cum_incl
  FROM cells),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM cells),
dec AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(q)),
hits AS (
  SELECT d.q, c.v, c.cum_incl, t.total_w
  FROM cum c CROSS JOIN tot t JOIN dec d
    ON c.cum_incl * 10 >= d.q * t.total_w
   AND (c.cum_incl - c.w) * 10 < d.q * t.total_w)
SELECT q AS decile,
       FLOOR(v / 100.0 * 100 + 0.5) / 100 AS price_dollars,
       cum_incl AS cum_weight, total_w AS total_weight
FROM hits ORDER BY decile
""",
    doc="exact type-1 weighted deciles of extended price weighted by "
    "quantity — no interpolation, no float: the crossing cell for each "
    "decile is the unique value whose inclusive cumulative weight "
    "crosses q·W/10 (compared via integer cross-multiplication, never "
    "division).  Spark computes the cumulative weight with the shared "
    "two-phase distributed prefix machinery (operators/packing."
    "with_prefix_sum — range partition + local windows + bounded "
    "offsets, NEVER a single-partition global window), then each "
    "value-cell meets the 9-row decile panel in a broadcast join.  "
    "Scale: per-value partial agg bounds the prefix input by the "
    "price domain, not the row count.",
)
def q_weighted_deciles(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    li = load_table(spark, sf, "lineitem")
    cells = li.groupBy(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    ).agg(F.sum("l_quantity").cast("long").alias("w"))
    cum = with_prefix_sum(cells, "v", "w", out_col="cum_excl")
    cum = cum.withColumn("cum_incl", F.col("cum_excl") + F.col("w"))
    tot = cum.agg(F.sum("w").alias("total_w"))
    dec = spark.range(1, 10).select(F.col("id").cast("int").alias("q"))
    hits = (
        cum.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(dec),
            (F.col("cum_incl") * 10 >= F.col("q") * F.col("total_w"))
            & (F.col("cum_excl") * 10 < F.col("q") * F.col("total_w")),
        )
    )
    return hits.select(
        F.col("q").alias("decile"),
        (F.floor(F.col("v") / 100.0 * 100 + 0.5) / 100).alias("price_dollars"),
        F.col("cum_incl").alias("cum_weight"),
        F.col("total_w").alias("total_weight"),
    ).orderBy("decile")
# --------------------------------------- multi-feature OLS (normal equations)
@register(
    "q_ols_multi",
    oracle="""
WITH items AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY l_orderkey),
pts AS (
  SELECT o.o_orderpriority,
         CAST((EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
              + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS BIGINT) AS x1,
         i.n_items AS x2,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
  FROM orders o JOIN items i ON o.o_orderkey = i.l_orderkey),
s AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1,
         CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x1 * y AS DECIMAL(38,0))) AS s1y,
         SUM(CAST(x2 * y AS DECIMAL(38,0))) AS s2y
  FROM pts GROUP BY o_orderpriority),
d AS (
  SELECT o_orderpriority, n,
         CAST(n AS DOUBLE) AS dn,
         CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
         CAST(s11 AS DOUBLE) AS d11, CAST(s12 AS DOUBLE) AS d12,
         CAST(s22 AS DOUBLE) AS d22,
         CAST(sy AS DOUBLE) AS dy,
         CAST(s1y AS DOUBLE) AS d1y, CAST(s2y AS DOUBLE) AS d2y
  FROM s),
m AS (
  SELECT o_orderpriority, n,
         dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
            + d2 * (d1 * d12 - d11 * d2) AS det,
         dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
            + d2 * (d1y * d12 - d11 * d2y) AS det0,
         dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
            + d2 * (d1 * d2y - d1y * d2) AS det1,
         dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
            + dy * (d1 * d12 - d11 * d2) AS det2
  FROM d)
SELECT o_orderpriority,
       n AS n_orders,
       FLOOR(det0 / det / 100 * 10000 + 0.5) / 10000 AS intercept_dollars,
       FLOOR(det1 / det / 100 * 10000 + 0.5) / 10000 AS month_coef_dollars,
       FLOOR(det2 / det / 100 * 10000 + 0.5) / 10000 AS item_coef_dollars
FROM m
ORDER BY o_orderpriority
""",
    doc="multi-feature OLS by normal equations: per order priority, "
    "regress order revenue on (month index, line-item count) — the "
    "distributed-ML primitive behind any closed-form linear model.  "
    "X'X and X'y reduce to NINE exact integer moments (small-int "
    "features stay BIGINT; every y cross-term rides DECIMAL(38)/"
    "HUGEINT), and the 3x3 solve is Cramer's rule written as one "
    "mirrored IEEE expression tree on both engines, floor-rounded at "
    "1e-4 — q_ols_trend generalized from 1 to 2 regressors without a "
    "single float entering the shuffle.  Scale: a lineitem partial-agg "
    "keyed by orderkey, one orderkey-keyed join, then a 5-group moment "
    "reduce; per-group state is 10 numbers regardless of group size, "
    "and the solve runs on a 5-row panel.",
)
def q_ols_multi(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    x1 = (
        (F.year("o_orderdate") - F.lit(1995)) * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    pts = o.join(items, o.o_orderkey == items.l_orderkey).select(
        "o_orderpriority", x1.alias("x1"), F.col("n_items").alias("x2"), y.alias("y")
    )
    dec38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(dec38(F.col("y"))).alias("sy"),
        F.sum(dec38(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec38(F.col("x2") * F.col("y"))).alias("s2y"),
    )
    d = s.select(
        "o_orderpriority",
        "n",
        F.col("n").cast("double").alias("dn"),
        F.col("s1").cast("double").alias("d1"),
        F.col("s2").cast("double").alias("d2"),
        F.col("s11").cast("double").alias("d11"),
        F.col("s12").cast("double").alias("d12"),
        F.col("s22").cast("double").alias("d22"),
        F.col("sy").cast("double").alias("dy"),
        F.col("s1y").cast("double").alias("d1y"),
        F.col("s2y").cast("double").alias("d2y"),
    )
    c = F.col
    det = (
        c("dn") * (c("d11") * c("d22") - c("d12") * c("d12"))
        - c("d1") * (c("d1") * c("d22") - c("d12") * c("d2"))
        + c("d2") * (c("d1") * c("d12") - c("d11") * c("d2"))
    )
    det0 = (
        c("dy") * (c("d11") * c("d22") - c("d12") * c("d12"))
        - c("d1") * (c("d1y") * c("d22") - c("d12") * c("d2y"))
        + c("d2") * (c("d1y") * c("d12") - c("d11") * c("d2y"))
    )
    det1 = (
        c("dn") * (c("d1y") * c("d22") - c("d12") * c("d2y"))
        - c("dy") * (c("d1") * c("d22") - c("d12") * c("d2"))
        + c("d2") * (c("d1") * c("d2y") - c("d1y") * c("d2"))
    )
    det2 = (
        c("dn") * (c("d11") * c("d2y") - c("d1y") * c("d12"))
        - c("d1") * (c("d1") * c("d2y") - c("d1y") * c("d2"))
        + c("dy") * (c("d1") * c("d12") - c("d11") * c("d2"))
    )
    rnd = lambda e: F.floor(e / 100 * 10000 + 0.5) / 10000  # noqa: E731
    m = d.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        rnd(det0 / det).alias("intercept_dollars"),
        rnd(det1 / det).alias("month_coef_dollars"),
        rnd(det2 / det).alias("item_coef_dollars"),
    )
    return m.orderBy("o_orderpriority")
# -------------------------------------------------- Wasserstein-1 drift
@register(
    "q_wasserstein_drift",
    oracle="""
WITH pop AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995 THEN 1 ELSE 0 END AS a
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)),
cells AS MATERIALIZED (
  SELECT v, CAST(SUM(a) AS BIGINT) AS a_cnt,
         CAST(COUNT(*) - SUM(a) AS BIGINT) AS b_cnt
  FROM pop GROUP BY v),
cum AS (
  SELECT v,
         SUM(a_cnt) OVER (ORDER BY v) - a_cnt AS ca_ex,
         SUM(b_cnt) OVER (ORDER BY v) - b_cnt AS cb_ex,
         LAG(v) OVER (ORDER BY v) AS prev_v
  FROM cells),
panel AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a,
                 CAST(SUM(b_cnt) AS BIGINT) AS n_b FROM cells),
num AS (
  SELECT SUM(ABS(CAST(c.ca_ex AS HUGEINT) * p.n_b
                 - CAST(c.cb_ex AS HUGEINT) * p.n_a)
             * (c.v - COALESCE(c.prev_v, c.v))) AS w1_num
  FROM cum c CROSS JOIN panel p)
SELECT p.n_a, p.n_b,
       CAST(n.w1_num * 10000 // (CAST(p.n_a AS HUGEINT) * p.n_b) AS BIGINT)
         AS w1_microdollars
FROM num n CROSS JOIN panel p
""",
    doc="exact two-sample Wasserstein-1 (earth mover's) distance "
    "between the 1995 and 1996 order-value distributions — the "
    "drift magnitude the KS test (q_ks_2sample) can't give: KS says "
    "WHETHER the distributions differ, W1 says by HOW MANY DOLLARS of "
    "mass-transport.  W1 = integral |F_a - F_b| dx over the piecewise- "
    "constant empirical CDFs, computed in EXACT integer arithmetic: "
    "per-distinct-value counts, exclusive prefix CDFs from the "
    "two-phase distributed prefix-sum pass, the previous distinct "
    "value from the matching two-phase lag "
    "(operators/packing.with_prev_value — range partition + local lag "
    "+ bounded carry panel, never a global sort), and the integral as "
    "sum of |ca*n_b - cb*n_a| * gap in DECIMAL(38,0)/HUGEINT.  Output "
    "in micro-dollars by integer floor division — no float anywhere.",
)
def q_wasserstein(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sums, with_prev_value

    o = load_table(spark, sf, "orders")
    pop = o.where(F.year("o_orderdate").isin(1995, 1996)).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.year("o_orderdate") == 1995, 1).otherwise(0).alias("a"),
    )
    cells = pop.groupBy("v").agg(
        F.sum("a").alias("a_cnt"),
        (F.count("*") - F.sum("a")).alias("b_cnt"),
    )
    cum = with_prefix_sums(cells, "v", {"a_cnt": "ca_ex", "b_cnt": "cb_ex"})
    cum = with_prev_value(cum, "v", out_col="prev_v")
    panel = cells.agg(F.sum("a_cnt").alias("n_a"), F.sum("b_cnt").alias("n_b"))
    dec = "decimal(38,0)"
    term = F.abs(
        F.col("ca_ex").cast(dec) * F.col("n_b") - F.col("cb_ex").cast(dec) * F.col("n_a")
    ) * (F.col("v") - F.coalesce(F.col("prev_v"), F.col("v"))).cast(dec)
    num = (
        cum.crossJoin(F.broadcast(panel))
        .select(term.alias("t"))
        .agg(F.sum("t").alias("w1_num"))
    )
    res = num.crossJoin(F.broadcast(panel))
    nm = F.col("w1_num") * F.lit(10_000).cast(dec)
    dn = F.col("n_a").cast(dec) * F.col("n_b").cast(dec)
    return res.select(
        "n_a",
        "n_b",
        ((nm - nm % dn) / dn).cast("long").alias("w1_microdollars"),
    )
# ------------------------------------------------------------ exact Gini
@register(
    "q_gini_spend",
    oracle="""
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1),
cells AS MATERIALIZED (
  SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c FROM spend GROUP BY 1),
cum AS (
  SELECT v, c, SUM(c) OVER (ORDER BY v) - c AS p FROM cells),
panel AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS total FROM cells),
num AS (
  SELECT SUM(CAST(cu.v AS HUGEINT) * cu.c * (2 * cu.p + cu.c - pa.n)) AS g_num
  FROM cum cu CROSS JOIN panel pa)
SELECT pa.n AS n_customers,
       CAST(pa.total AS BIGINT) AS total_cents,
       CAST(n.g_num * 1000000 // (CAST(pa.n AS HUGEINT) * pa.total) AS BIGINT)
         AS gini_micro
FROM num n CROSS JOIN panel pa
""",
    doc="exact Gini coefficient of per-customer spend — the scalar "
    "inequality statistic behind the Lorenz/Pareto panels "
    "(q_revenue_concentration gives the curve; this gives THE number), "
    "computed with zero floats and NO per-row global rank: group to "
    "per-distinct-value counts, take the exclusive cumulative count p "
    "from the two-phase distributed prefix-sum pass, and use the "
    "closed form sum(v*c*(2p + c - n)) / (n * sum(v*c)) — the "
    "rank-sum formula collapsed over ties, so the answer is "
    "permutation- and engine-independent.  Scale: two partial-agg'd "
    "groupBys + the range-partitioned prefix pass + 1-row panels; "
    "micro-unit output by integer floor division.",
)
def q_gini_spend(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    o = load_table(spark, sf, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    cells = spend.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).alias("c"))
    cum = with_prefix_sum(cells, "v", "c", out_col="p")
    dec = "decimal(38,0)"
    panel = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast(dec) * F.col("c")).alias("total"),
    )
    num = (
        cum.crossJoin(F.broadcast(panel))
        .select(
            (
                F.col("v").cast(dec)
                * F.col("c")
                * (2 * F.col("p") + F.col("c") - F.col("n"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("g_num"))
    )
    res = num.crossJoin(F.broadcast(panel))
    nm = F.col("g_num") * F.lit(1_000_000).cast(dec)
    dn = F.col("n").cast(dec) * F.col("total")
    return res.select(
        F.col("n").alias("n_customers"),
        F.col("total").cast("long").alias("total_cents"),
        ((nm - nm % dn) / dn).cast("long").alias("gini_micro"),
    )
# ------------------------------------------- multiple-testing BH-FDR panel
_FDR_ALPHA = 0.05
# A&S 7.1.25 rational erfc bound — same documented approximation (and the
# same written fold order) as q_mann_whitney's two-sided p.
_ERFC_SQL = (
    "1 / POW(1 + 0.278393 * {az} / SQRT(2) + 0.230389 * {az} * {az} / 2"
    " + 0.000972 * POW({az} / SQRT(2), 3)"
    " + 0.078108 * POW({az} / SQRT(2), 4), 4)"
)


@register(
    "q_fdr_bh",
    oracle=f"""
WITH hrs AS (SELECT UNNEST(generate_series(0, 23)) AS hour),
cnt AS (SELECT EXTRACT(HOUR FROM ts) AS hour, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
dense AS (SELECT CAST(h.hour AS BIGINT) AS hour, COALESCE(cnt.c, 0) AS c, tot.n
          FROM hrs h LEFT JOIN cnt ON cnt.hour = h.hour CROSS JOIN tot),
zt AS (SELECT hour, c, n,
              (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 24.0)
                / SQRT(CAST(n AS DOUBLE) * (1.0 / 24.0) * (23.0 / 24.0)) AS z_raw
       FROM dense),
pt AS (SELECT hour, c, z_raw,
              FLOOR({_ERFC_SQL.format(az="ABS(z_raw)")} * 1000000 + 0.5)
                / 1000000 AS p
       FROM zt),
rk AS (SELECT a.hour, a.c, a.z_raw, a.p,
              CAST(COUNT(*) AS BIGINT) AS p_rank
       FROM pt a JOIN pt b
         ON (b.p < a.p) OR (b.p = a.p AND b.hour <= a.hour)
       GROUP BY a.hour, a.c, a.z_raw, a.p),
ks AS (SELECT MAX(CASE WHEN p <= CAST(p_rank AS DOUBLE) * {_FDR_ALPHA!r} / 24.0
                       THEN p_rank ELSE 0 END) AS kstar
       FROM rk)
SELECT hour, c AS n_events,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       p AS p_two_sided, p_rank,
       FLOOR(CAST(p_rank AS DOUBLE) * {_FDR_ALPHA!r} / 24.0 * 1000000 + 0.5)
         / 1000000 AS bh_threshold,
       p_rank <= ks.kstar AS discovery
FROM rk CROSS JOIN ks
ORDER BY hour
""",
    doc="Benjamini-Hochberg FDR control over a 24-hypothesis panel: for "
    "each hour of day, a z-test of the event count against the uniform "
    "n/24 expectation (exact integer counts; the two-sided p uses the "
    "same A&S 7.1.25 rational erfc as q_mann_whitney), then the BH "
    "step-up — rank p ascending, find the largest k with p_(k) <= "
    "k/m*alpha, reject everything at or below it — the multiple-"
    "testing guardrail every metrics platform needs before reading 24 "
    "per-hour 'anomalies' off one dashboard.  Determinism: p is "
    "floor-rounded to millionths BEFORE ranking (identical IEEE "
    "expression trees on both engines make even the unrounded doubles "
    "bit-equal), ranks tie-break on the hour.  Scale: one map-side-"
    "combined groupBy to 24 cells; the rank self-join, the k* reduce "
    "and the verdict join all run on the constant 24-row panel.",
)
def q_fdr_bh(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cnt = ev.groupBy(F.hour("ts").alias("hour")).agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    hrs = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour")
    )
    dense = (
        hrs.join(cnt, "hour", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("hour").cast("long").alias("hour"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
            "n",
        )
    )
    z_raw = (F.col("c").cast("double") - F.col("n").cast("double") / 24.0) / F.sqrt(
        F.col("n").cast("double") * (1.0 / 24.0) * (23.0 / 24.0)
    )
    zt = dense.select("hour", "c", z_raw.alias("z_raw"))
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    pt = zt.select(
        "hour",
        "c",
        "z_raw",
        (F.floor((1 / F.pow(denom, 4)) * 1000000 + 0.5) / 1000000).alias("p"),
    ).localCheckpoint()  # 24-row panel feeds the rank self-join twice
    a, b = pt.alias("a"), pt.alias("b")
    rk = (
        a.join(
            F.broadcast(b),
            (F.col("b.p") < F.col("a.p"))
            | ((F.col("b.p") == F.col("a.p")) & (F.col("b.hour") <= F.col("a.hour"))),
        )
        .groupBy(
            F.col("a.hour").alias("hour"),
            F.col("a.c").alias("c"),
            F.col("a.z_raw").alias("z_raw"),
            F.col("a.p").alias("p"),
        )
        .agg(F.count("*").alias("p_rank"))
    )
    thr = F.col("p_rank").cast("double") * _FDR_ALPHA / 24.0
    ks = rk.agg(
        F.max(F.when(F.col("p") <= thr, F.col("p_rank")).otherwise(0)).alias("kstar")
    )
    return (
        rk.crossJoin(F.broadcast(ks))
        .select(
            "hour",
            F.col("c").alias("n_events"),
            (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
            F.col("p").alias("p_two_sided"),
            "p_rank",
            (F.floor(thr * 1000000 + 0.5) / 1000000).alias("bh_threshold"),
            (F.col("p_rank") <= F.col("kstar")).alias("discovery"),
        )
        .orderBy("hour")
    )
# --------------------------------------------------- Wald-Wolfowitz runs
@register(
    "q_runs_test",
    oracle=f"""
WITH monthly AS (
  SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
signs AS (
  SELECT a.m, CASE WHEN b.rev > a.rev THEN 1 ELSE -1 END AS s
  FROM monthly a JOIN monthly b ON b.m = a.m + 1
  WHERE b.rev <> a.rev),
nxt AS (
  SELECT a.m, a.s, MIN(b.m) AS nm
  FROM signs a JOIN signs b ON b.m > a.m
  GROUP BY a.m, a.s),
flips AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_flips
  FROM nxt JOIN signs c ON c.m = nxt.nm AND c.s <> nxt.s),
cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
  FROM signs),
stat AS (
  SELECT n, n_plus, n_minus, n_flips + 1 AS n_runs,
         2.0 * n_plus * n_minus / n + 1 AS mu,
         (2.0 * n_plus * n_minus * (2.0 * n_plus * n_minus - n))
           / (CAST(n AS DOUBLE) * n * (n - 1)) AS var_r
  FROM cnt CROSS JOIN flips),
z AS (
  SELECT n, n_plus, n_minus, n_runs,
         (CAST(n_runs AS DOUBLE) - mu) / SQRT(var_r) AS z_raw
  FROM stat)
SELECT n AS n_obs, n_plus, n_minus, CAST(n_runs AS BIGINT) AS n_runs,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR({_ERFC_SQL.format(az="ABS(z_raw)")} * 1000000 + 0.5) / 1000000
         AS p_two_sided,
       {_ERFC_SQL.format(az="ABS(z_raw)")} > 0.05 AS looks_random
FROM z
""",
    doc="Wald-Wolfowitz runs test for randomness of the month-over-month "
    "revenue DIRECTION sequence: up/down signs from exact integer-cent "
    "monthly totals (tie months drop, per the standard compacted-"
    "sequence definition), runs counted as flips between each sign and "
    "its NEXT SURVIVING sign (min-over-later-months join, so a dropped "
    "tie never severs the chain) + 1 — still no window, no sort over "
    "the calendar-bounded sign table — the normal approximation "
    "z = (R - mu)/sigma "
    "with the standard runs-test moments, and the A&S 7.1.25 erfc "
    "two-sided p — the sanity check that a 'trend' on the dashboard "
    "is not just coin flips.  Scale: one map-side-combined monthly "
    "rollup (calendar-bounded), two bounded equi-self-joins, one-row "
    "panels crossed into the single statistic row.",
)
def q_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev"))
    a, b = monthly.alias("a"), monthly.alias("b")
    signs = (
        a.join(b, F.col("b.m") == F.col("a.m") + 1)
        .where(F.col("b.rev") != F.col("a.rev"))
        .select(
            F.col("a.m").alias("m"),
            F.when(F.col("b.rev") > F.col("a.rev"), 1).otherwise(-1).alias("s"),
        )
        .localCheckpoint()  # feeds the flip join twice and the count panel
    )
    sa, sb = signs.alias("sa"), signs.alias("sb")
    nxt = (
        sa.join(sb, F.col("sb.m") > F.col("sa.m"))
        .groupBy(F.col("sa.m").alias("pm"), F.col("sa.s").alias("ps"))
        .agg(F.min("sb.m").alias("nm"))
    )
    flips = nxt.join(
        signs.alias("sc"),
        (F.col("sc.m") == F.col("nm")) & (F.col("sc.s") != F.col("ps")),
    ).agg(F.count(F.lit(1)).alias("n_flips"))
    cnt = signs.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n_minus"),
    )
    stat = cnt.crossJoin(F.broadcast(flips)).select(
        "n",
        "n_plus",
        "n_minus",
        (F.col("n_flips") + 1).alias("n_runs"),
        (2.0 * F.col("n_plus") * F.col("n_minus") / F.col("n") + 1).alias("mu"),
        (
            (2.0 * F.col("n_plus") * F.col("n_minus"))
            * (2.0 * F.col("n_plus") * F.col("n_minus") - F.col("n"))
            / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
        ).alias("var_r"),
    )
    z = stat.select(
        "n",
        "n_plus",
        "n_minus",
        "n_runs",
        ((F.col("n_runs").cast("double") - F.col("mu")) / F.sqrt(F.col("var_r"))).alias(
            "z_raw"
        ),
    )
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    p = 1 / F.pow(denom, 4)
    return z.select(
        F.col("n").alias("n_obs"),
        "n_plus",
        "n_minus",
        F.col("n_runs").cast("long").alias("n_runs"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (F.floor(p * 1000000 + 0.5) / 1000000).alias("p_two_sided"),
        (p > 0.05).alias("looks_random"),
    )
# --------------------------------------------- in-engine logistic GD
_LOGIT_ETA = 0.05
_LOGIT_STEPS = 2

# rational sigmoid surrogate: only +,*,/,abs — bit-identical IEEE on both
# engines (exp() differs by an ulp between libm implementations, which
# flips the micro-unit floor on ~1 row in 1e5 and corrupts the exact
# integer gradient; observed at sf0.01)
_SIG_SQL = "(0.5 + 0.5 * (({z}) / 2) / (1 + ABS(({z}) / 2)))"


def _logit_step_sql(prev: str, cur: str) -> str:
    z = f"(w.qb + w.qw * b.x) / 1000000.0"
    sig = _SIG_SQL.format(z=z)
    return f"""g_{cur} AS (
  SELECT w.n, w.s_y, w.qb, w.qw,
         CAST(SUM(CAST(FLOOR(({sig} - b.y) * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS rs_b,
         CAST(SUM(CAST(FLOOR(({sig} - b.y) * 1000000 + 0.5) AS BIGINT) * b.x)
              AS BIGINT) AS rs_w
  FROM base b CROSS JOIN {prev} w
  GROUP BY w.n, w.s_y, w.qb, w.qw),
{cur} AS (
  SELECT n, s_y,
         qb - CAST(FLOOR({_LOGIT_ETA!r} * rs_b / n + 0.5) AS BIGINT) AS qb,
         qw - CAST(FLOOR({_LOGIT_ETA!r} * rs_w / n + 0.5) AS BIGINT) AS qw
  FROM g_{cur})"""


def _logistic_oracle() -> str:
    steps = ",\n".join(
        _logit_step_sql(f"w{t}", f"w{t + 1}") for t in range(_LOGIT_STEPS)
    )
    return f"""
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(l_quantity AS BIGINT) - 25 AS x
  FROM lineitem),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s_y
  FROM base),
w0 AS (
  SELECT n, s_y,
         CAST(FLOOR(ln(CAST(s_y AS DOUBLE) / (n - s_y)) * 1000000 + 0.5)
              AS BIGINT) AS qb,
         CAST(0 AS BIGINT) AS qw
  FROM mo),
{steps},
acc AS (
  SELECT w.n, w.s_y, w.qb, w.qw,
         CAST(SUM(CASE WHEN (CASE WHEN w.qb + w.qw * b.x >= 0 THEN 1 ELSE 0 END)
                            = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM base b CROSS JOIN w{_LOGIT_STEPS} w
  GROUP BY w.n, w.s_y, w.qb, w.qw)
SELECT n AS n_rows, qb AS w_bias_micro, qw AS w_qty_micro,
       FLOOR(CAST(n_correct AS DOUBLE) / n * 1000000 + 0.5) / 1000000
         AS accuracy,
       FLOOR(CAST(GREATEST(s_y, n - s_y) AS DOUBLE) / n * 1000000 + 0.5)
         / 1000000 AS baseline_accuracy
FROM acc
"""


@register(
    "q_logistic_gd",
    oracle=_logistic_oracle(),
    doc="in-engine logistic regression predicting the return flag from "
    "centered quantity: warm-start the bias at the CLOSED-FORM base-"
    "rate logit (the zero-feature MLE), then two quantized gradient-"
    "descent passes — each pass computes per-row residuals with the "
    "RATIONAL sigmoid surrogate z/2/(1+|z/2|) (plus/times/divide/abs "
    "only, bit-identical across libm implementations, unlike exp) and "
    "quantizes them to integer micro-units BEFORE summation, so every "
    "cross-row aggregate is an exact integer and aggregation order "
    "cannot leak into the weights.  The accuracy readout is a pure "
    "integer sign test against the majority-class baseline — on TPC-H "
    "the return flag is date-determined, so the honest result is "
    "accuracy == baseline with a near-zero feature weight: the query "
    "demonstrates that the GLM machinery converges to 'no signal' "
    "rather than hallucinating one.  The quantized-gradient contract "
    "scales to any GLM: per-row nonlinearities stay per-row, cross-row "
    "state is integers.  Scale: one scan per GD pass + the accuracy "
    "scan, each a map-side-combined 1-row reduce against a broadcast "
    "weight panel.",
)
def q_logistic_gd(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.glm import logistic_gd_quantized

    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (F.col("l_quantity").cast("long") - 25).alias("x"),
    )
    return logistic_gd_quantized(
        base, "y", "x", steps=_LOGIT_STEPS, eta=_LOGIT_ETA
    ).withColumnRenamed("w_0_micro", "w_qty_micro")
# --------------------------------------------- WoE / IV feature audit
@register(
    "q_woe_iv",
    oracle="""
WITH base AS (
  SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // 10 AS BIGINT) AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
cells AS (
  SELECT bin, CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
  FROM base GROUP BY bin),
tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS t_pos,
               CAST(SUM(n_neg) AS BIGINT) AS t_neg FROM cells),
w AS (
  SELECT c.bin, c.n_pos, c.n_neg,
         ln(((CAST(c.n_pos AS DOUBLE) + 0.5) * t.t_neg)
            / ((CAST(c.n_neg AS DOUBLE) + 0.5) * t.t_pos)) AS woe_raw,
         ((CAST(c.n_pos AS DOUBLE) + 0.5) / t.t_pos
            - (CAST(c.n_neg AS DOUBLE) + 0.5) / t.t_neg)
           * ln(((CAST(c.n_pos AS DOUBLE) + 0.5) * t.t_neg)
                / ((CAST(c.n_neg AS DOUBLE) + 0.5) * t.t_pos)) AS iv_raw
  FROM cells c CROSS JOIN tot t)
SELECT bin, n_pos, n_neg,
       FLOOR(woe_raw * 1000000 + 0.5) / 1000000 AS woe,
       FLOOR(iv_raw * 1000000 + 0.5) / 1000000 AS iv_contrib
FROM w
ORDER BY bin
""",
    doc="weight-of-evidence / information-value audit of the quantity "
    "feature against the return flag — the risk-modeling screen run "
    "BEFORE fitting anything (q_logistic_gd's honest no-signal result "
    "is exactly what near-zero IV here predicts): per equal-width "
    "quantity bin, WoE = ln(pos-share/neg-share) on 0.5-Laplace-"
    "adjusted bin counts (the standard scorecard smoothing — a pure "
    "bin with n_neg=0 would otherwise hit ln(inf), where Spark floor() "
    "saturates to Long.MaxValue but DuckDB keeps inf: a latent cross-"
    "engine mismatch), computed from one cross-product ratio inside a "
    "single mirrored ln, and the IV contribution (adjusted-share gap "
    "x WoE).  Sum of iv_contrib < 0.02 "
    "reads 'useless feature' on the standard scorecard scale.  Scale: "
    "one map-side-combined bin rollup, a 1-row total panel crossed "
    "back, panel math on |bins| rows.",
)
def q_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.expr("(CAST(l_quantity AS BIGINT) - 1) div 10").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cells = base.groupBy("bin").agg(
        F.sum("y").alias("n_pos"),
        (F.count("*") - F.sum("y")).alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    ap = F.col("n_pos").cast("double") + 0.5
    an = F.col("n_neg").cast("double") + 0.5
    arg = (ap * F.col("t_neg")) / (an * F.col("t_pos"))
    woe = F.log(arg)
    iv = (ap / F.col("t_pos") - an / F.col("t_neg")) * F.log(arg)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_pos",
            "n_neg",
            (F.floor(woe * 1000000 + 0.5) / 1000000).alias("woe"),
            (F.floor(iv * 1000000 + 0.5) / 1000000).alias("iv_contrib"),
        )
        .orderBy("bin")
    )
# --------------------------------------------- split-conformal interval
_CONF_SPLIT_M = 90  # orders span 1995-01..2001-08 (months 36..115): calibrate on 1995-01..1999-06 (~53 residuals), score 1999-07+
_CONF_ALPHA = 0.2


@register(
    "q_conformal_interval",
    oracle=f"""
WITH monthly AS (
  SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
resid AS (
  SELECT t.m, ABS(t.rev - p.rev) AS r
  FROM monthly t JOIN monthly p ON p.m = t.m - 1),
cal AS (SELECT m, r FROM resid WHERE m < {_CONF_SPLIT_M}),
tst AS (SELECT m, r FROM resid WHERE m >= {_CONF_SPLIT_M}),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
              CAST(CEIL((COUNT(*) + 1) * {1 - _CONF_ALPHA}) AS BIGINT) AS k
       FROM cal),
ranked AS (
  SELECT a.m, a.r, CAST(COUNT(*) AS BIGINT) AS rk
  FROM cal a JOIN cal b ON (b.r < a.r) OR (b.r = a.r AND b.m <= a.m)
  GROUP BY a.m, a.r),
q AS (SELECT r AS q_hat FROM ranked JOIN nc ON ranked.rk = nc.k),
cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cov
        FROM tst t CROSS JOIN q)
SELECT nc.n_cal, cov.n_test, q.q_hat AS q_hat_cents,
       FLOOR(CAST(cov.n_cov AS DOUBLE) / cov.n_test * 1000000 + 0.5) / 1000000
         AS empirical_coverage,
       {1 - _CONF_ALPHA} AS nominal_coverage
FROM nc CROSS JOIN q CROSS JOIN cov
""",
    doc="split-conformal prediction interval for the naive monthly "
    "forecast (forecast = last month): absolute residuals in exact "
    "integer cents on the 1995-mid-1999 calibration window (the data's "
    "actual span), the conformal "
    "quantile q_hat = the ceil((n_cal+1)(1-alpha))-th order statistic "
    "(alpha=0.2) found by a lexicographic rank theta-join on the "
    "calendar-bounded residual panel (no window, no sort — the "
    "q_fdr_bh shape), then the distribution-free coverage claim "
    "'|actual - forecast| <= q_hat with prob >= 80%' is AUDITED on the "
    "1996+ holdout months.  This is the calibration harness a "
    "forecast-serving team runs before promising an interval to "
    "downstream consumers.  Scale: one map-side-combined monthly "
    "rollup (calendar-bounded), a <=48-row theta self-join, 1-row "
    "panels crossed into the single report row.",
)
def q_conformal_interval(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev"))
    t, p = monthly.alias("t"), monthly.alias("p")
    resid = (
        t.join(p, F.col("p.m") == F.col("t.m") - 1)
        .select(F.col("t.m").alias("m"), F.abs(F.col("t.rev") - F.col("p.rev")).alias("r"))
        .localCheckpoint()  # feeds cal (x3 consumers) and tst
    )
    cal = resid.where(F.col("m") < _CONF_SPLIT_M)
    tst = resid.where(F.col("m") >= _CONF_SPLIT_M)
    nc = cal.agg(
        F.count("*").cast("long").alias("n_cal"),
        F.ceil((F.count("*") + 1) * (1 - _CONF_ALPHA)).cast("long").alias("k"),
    )
    a, b = cal.alias("a"), cal.alias("b")
    ranked = (
        a.join(
            b,
            (F.col("b.r") < F.col("a.r"))
            | ((F.col("b.r") == F.col("a.r")) & (F.col("b.m") <= F.col("a.m"))),
        )
        .groupBy(F.col("a.m").alias("m"), F.col("a.r").alias("r"))
        .agg(F.count("*").cast("long").alias("rk"))
    )
    q = ranked.join(F.broadcast(nc), F.col("rk") == F.col("k")).select(
        "n_cal", F.col("r").alias("q_hat")
    )
    cov = tst.crossJoin(F.broadcast(q)).agg(
        F.first("n_cal").alias("n_cal"),
        F.first("q_hat").alias("q_hat"),
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.when(F.col("r") <= F.col("q_hat"), 1).otherwise(0))
        .cast("long")
        .alias("n_cov"),
    )
    return cov.select(
        "n_cal",
        "n_test",
        F.col("q_hat").alias("q_hat_cents"),
        (
            F.floor(F.col("n_cov").cast("double") / F.col("n_test") * 1000000 + 0.5)
            / 1000000
        ).alias("empirical_coverage"),
        F.lit(1 - _CONF_ALPHA).alias("nominal_coverage"),
    )
# --------------------------------------------- calibration reliability
def _calibration_oracle() -> str:
    steps = ",\n".join(
        _logit_step_sql(f"w{t}", f"w{t + 1}") for t in range(_LOGIT_STEPS)
    )
    sig = _SIG_SQL.format(z="(w.qb + w.qw * b.x) / 1000000.0")
    return f"""
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(l_quantity AS BIGINT) - 25 AS x
  FROM lineitem),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s_y
  FROM base),
w0 AS (
  SELECT n, s_y,
         CAST(FLOOR(ln(CAST(s_y AS DOUBLE) / (n - s_y)) * 1000000 + 0.5)
              AS BIGINT) AS qb,
         CAST(0 AS BIGINT) AS qw
  FROM mo),
{steps},
scored AS (
  SELECT b.y,
         LEAST(9, CAST(FLOOR({sig} * 10) AS INT)) AS bin,
         CAST(FLOOR({sig} * 1000000 + 0.5) AS BIGINT) AS p_micro
  FROM base b CROSS JOIN w{_LOGIT_STEPS} w)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       FLOOR(CAST(SUM(p_micro) AS DOUBLE) / COUNT(*) / 1000000 * 1000000 + 0.5)
         / 1000000 AS avg_pred,
       FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
         AS obs_rate,
       FLOOR(ABS(CAST(SUM(p_micro) AS DOUBLE) / COUNT(*) / 1000000
                 - CAST(SUM(y) AS DOUBLE) / COUNT(*)) * 1000000 + 0.5) / 1000000
         AS calibration_gap
FROM scored
GROUP BY bin
ORDER BY bin
""".replace("FROM base b CROSS JOIN w", "FROM base b CROSS JOIN w")


@register(
    "q_calibration_bins",
    oracle=_calibration_oracle(),
    doc="reliability diagram for the fitted GLM (q_logistic_gd's weights, "
    "re-derived through the identical quantized-gradient chain): every "
    "row's predicted probability from the rational sigmoid surrogate, "
    "micro-quantized per row BEFORE any sum so the per-bin mean "
    "prediction is an exact integer ratio, bucketed into ten "
    "probability bins against the observed positive rate — the "
    "calibration audit a model-serving team runs before trusting "
    "scores as probabilities (per-bin |avg_pred - obs_rate| is the ECE "
    "integrand).  Scale: the GD passes are the q_logistic_gd shape "
    "(1-row broadcast weight panel per scan); the scoring pass is one "
    "more scan into a map-side-combined <=10-row bin rollup.",
)
def q_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.glm import logistic_gd_weights, with_logit_probability

    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (F.col("l_quantity").cast("long") - 25).alias("x"),
    )
    w = logistic_gd_weights(base, "y", "x", steps=_LOGIT_STEPS, eta=_LOGIT_ETA).select(
        "qb", "qw_0"
    )
    sig = F.col("p_sig")
    scored = with_logit_probability(base, w, "x").select(
        "y",
        F.least(F.lit(9), F.floor(sig * 10).cast("int")).alias("bin"),
        F.floor(sig * 1000000 + 0.5).cast("long").alias("p_micro"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("p_micro").alias("sp"),
            F.sum("y").alias("sy"),
        )
        .select(
            "bin",
            "n_rows",
            (
                F.floor(F.col("sp").cast("double") / F.col("n_rows") / 1000000 * 1000000 + 0.5)
                / 1000000
            ).alias("avg_pred"),
            (
                F.floor(F.col("sy").cast("double") / F.col("n_rows") * 1000000 + 0.5)
                / 1000000
            ).alias("obs_rate"),
            (
                F.floor(
                    F.abs(
                        F.col("sp").cast("double") / F.col("n_rows") / 1000000
                        - F.col("sy").cast("double") / F.col("n_rows")
                    )
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("calibration_gap"),
        )
        .orderBy("bin")
    )
# ------------------------------------------ two-feature logistic GD
def _logit2_step_sql(prev: str, cur: str) -> str:
    z = "(w.qb + w.qw0 * b.x0 + w.qw1 * b.x1) / 1000000.0"
    sig = _SIG_SQL.format(z=z)
    return f"""g_{cur} AS (
  SELECT w.n, w.s_y, w.qb, w.qw0, w.qw1,
         CAST(SUM(CAST(FLOOR(({sig} - b.y) * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS rs_b,
         CAST(SUM(CAST(FLOOR(({sig} - b.y) * 1000000 + 0.5) AS BIGINT) * b.x0)
              AS BIGINT) AS rs_0,
         CAST(SUM(CAST(FLOOR(({sig} - b.y) * 1000000 + 0.5) AS BIGINT) * b.x1)
              AS BIGINT) AS rs_1
  FROM base b CROSS JOIN {prev} w
  GROUP BY w.n, w.s_y, w.qb, w.qw0, w.qw1),
{cur} AS (
  SELECT n, s_y,
         qb - CAST(FLOOR({_LOGIT_ETA!r} * rs_b / n + 0.5) AS BIGINT) AS qb,
         qw0 - CAST(FLOOR({_LOGIT_ETA!r} * rs_0 / n + 0.5) AS BIGINT) AS qw0,
         qw1 - CAST(FLOOR({_LOGIT_ETA!r} * rs_1 / n + 0.5) AS BIGINT) AS qw1
  FROM g_{cur})"""


def _logistic2_oracle() -> str:
    steps = ",\n".join(
        _logit2_step_sql(f"w{t}", f"w{t + 1}") for t in range(_LOGIT_STEPS)
    )
    return f"""
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(l_quantity AS BIGINT) - 25 AS x0,
         CAST(ROUND(l_discount * 100) AS BIGINT) - 5 AS x1
  FROM lineitem),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s_y
  FROM base),
w0 AS (
  SELECT n, s_y,
         CAST(FLOOR(ln(CAST(s_y AS DOUBLE) / (n - s_y)) * 1000000 + 0.5)
              AS BIGINT) AS qb,
         CAST(0 AS BIGINT) AS qw0, CAST(0 AS BIGINT) AS qw1
  FROM mo),
{steps},
acc AS (
  SELECT w.n, w.s_y, w.qb, w.qw0, w.qw1,
         CAST(SUM(CASE WHEN (CASE WHEN w.qb + w.qw0 * b.x0 + w.qw1 * b.x1 >= 0
                                  THEN 1 ELSE 0 END) = b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM base b CROSS JOIN w{_LOGIT_STEPS} w
  GROUP BY w.n, w.s_y, w.qb, w.qw0, w.qw1)
SELECT n AS n_rows, qb AS w_bias_micro, qw0 AS w_qty_micro, qw1 AS w_disc_micro,
       FLOOR(CAST(n_correct AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS accuracy,
       FLOOR(CAST(GREATEST(s_y, n - s_y) AS DOUBLE) / n * 1000000 + 0.5) / 1000000
         AS baseline_accuracy
FROM acc
"""


@register(
    "q_logistic_gd2",
    oracle=_logistic2_oracle(),
    doc="TWO-feature quantized-gradient logistic regression (centered "
    "quantity + centered integer discount points) — the proof that the "
    "q_logistic_gd contract generalizes: per-row nonlinearities stay "
    "per-row (rational sigmoid), cross-row state is K+1 integer "
    "micro-unit weights in one broadcast panel, gradients are "
    "order-independent integer sums per feature, and the oracle "
    "replays the full multi-weight trajectory.  Same honest-no-signal "
    "readout as the single-feature fit.  Scale: one scan per GD pass + "
    "the accuracy scan; the panel grows by one long per feature, "
    "nothing else changes.",
)
def q_logistic_gd2(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.glm import logistic_gd_quantized

    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (F.col("l_quantity").cast("long") - 25).alias("x0"),
        (F.round(F.col("l_discount") * 100).cast("long") - 5).alias("x1"),
    )
    return (
        logistic_gd_quantized(base, "y", ["x0", "x1"], steps=_LOGIT_STEPS, eta=_LOGIT_ETA)
        .withColumnRenamed("w_0_micro", "w_qty_micro")
        .withColumnRenamed("w_1_micro", "w_disc_micro")
    )
# --------------------------------------------- grouped exact quantiles
@register(
    "q_grouped_quantiles",
    oracle="""
WITH q AS (
  SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
         quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, n,
       FLOOR(qs[1] * 100 + 0.5) / 100 AS p25,
       FLOOR(qs[2] * 100 + 0.5) / 100 AS p50,
       FLOOR(qs[3] * 100 + 0.5) / 100 AS p75,
       FLOOR((qs[3] - qs[1]) * 100 + 0.5) / 100 AS iqr
FROM q
ORDER BY l_returnflag, l_linestatus
""",
    doc="EXACT per-group quantiles via the engine's sort-based "
    "percentile aggregate (linear interpolation on order statistics — "
    "Spark percentile() and DuckDB quantile_cont share the definition "
    "bit-for-bit, probed before pairing): p25/median/p75 + IQR of "
    "extended price per (return flag, line status) cell.  Complements the sketch/prefix "
    "paths: q_percentiles holds the approx-vs-exact contrast, "
    "q_weighted_deciles the shuffle-free two-phase GLOBAL quantiles — "
    "this is the right tool when the GROUP count is bounded (each "
    "group's sort is partition-local after the hash shuffle) and "
    "exactness is non-negotiable, e.g. SLA percentiles per class.  "
    "Scale: one hash shuffle on the group key; per-group sort cost "
    "lives inside the aggregate, so skewed groups are the thing to "
    "watch — for corpus-sized groups switch to the prefix-sum path.",
)
def q_grouped_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    q = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("qs"),
    )
    c2 = lambda c: F.floor(c * 100 + 0.5) / 100  # noqa: E731
    return q.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        c2(F.expr("qs[0]")).alias("p25"),
        c2(F.expr("qs[1]")).alias("p50"),
        c2(F.expr("qs[2]")).alias("p75"),
        c2(F.expr("qs[2] - qs[0]")).alias("iqr"),
    ).orderBy("l_returnflag", "l_linestatus")
# ------------------------------------------------- isotonic regression (PAVA)
@register(
    "q_isotonic_calibration",
    oracle="""
WITH bins AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM lineitem GROUP BY 1),
panel AS (SELECT list({'q': q, 'n': n, 'pos': pos} ORDER BY q) AS l,
                 CAST(len(list(q)) AS BIGINT) AS b
          FROM bins),
pre AS (
  SELECT l, b,
         list_transform(range(1, b + 1), i ->
           list_reduce(list_transform(list_slice(l, 1, i), x -> x.n),
                       (p, s) -> p + s)) AS pn,
         list_transform(range(1, b + 1), i ->
           list_reduce(list_transform(list_slice(l, 1, i), x -> x.pos),
                       (p, s) -> p + s)) AS pp
  FROM panel),
iso AS (
  SELECT l, b, pn, pp,
         list_transform(range(1, b + 1), i ->
           list_aggregate(list_transform(range(1, i + 1), j ->
             list_aggregate(list_transform(range(i, b + 1), k ->
               CAST(pp[k] - CASE WHEN j > 1 THEN pp[j - 1] ELSE 0 END AS DOUBLE)
               / (pn[k] - CASE WHEN j > 1 THEN pn[j - 1] ELSE 0 END)),
             'min')),
           'max')) AS fit
  FROM pre),
out AS (
  SELECT UNNEST(l) AS s, UNNEST(fit) AS iso_rate FROM iso)
SELECT s.q AS quantity, s.n, s.pos,
       ROUND(CAST(s.pos AS DOUBLE) / s.n, 6) AS raw_rate,
       ROUND(iso_rate, 6) AS iso_rate
FROM out ORDER BY quantity
""",
    doc="isotonic regression (pool-adjacent-violators fit) of the return "
    "rate against quantity: the monotone recalibration map behind "
    "score-calibration (Zadrozny & Elkan 2002) and monotone-constraint "
    "audits, computed through the minimax characterization "
    "iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) — closed form, no "
    "iterative pooling loop, so both engines replay it exactly.  "
    "Determinism: prefix sums are exact integers, each block mean is "
    "ONE integer/integer IEEE division, min/max over doubles are "
    "exact.  Scale: one quantity-keyed partial-agg shuffle builds the "
    "bounded bin panel (50 distinct quantities); the O(B^3) minimax "
    "fold runs in a SINGLE row — the corpus never sees the cubic term.  "
    "The raw reliability curve (raw_rate) rides along for the "
    "monotonicity-violation readout.",
)
def q_isotonic_calibration(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import prefix_panel

    li = load_table(spark, sf, "lineitem")
    bins = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("pos"),
    )
    pre = prefix_panel(bins, ["q", "n", "pos"], ["n", "pos"]).select(
        "l",
        F.size("l").cast("long").alias("b"),
        F.col("pre_n").alias("pn"),
        F.col("pre_pos").alias("pp"),
    )

    def block_mean(j, k):
        ji, ki = j.cast("int"), k.cast("int")
        top = F.element_at(F.col("pp"), ki) - F.when(
            j > 1, F.element_at(F.col("pp"), ji - 1)
        ).otherwise(F.lit(0).cast("long"))
        bot = F.element_at(F.col("pn"), ki) - F.when(
            j > 1, F.element_at(F.col("pn"), ji - 1)
        ).otherwise(F.lit(0).cast("long"))
        return top.cast("double") / bot

    fit = F.transform(
        F.sequence(F.lit(1), F.col("b")),
        lambda i: F.array_max(
            F.transform(
                F.sequence(F.lit(1), i),
                lambda j: F.array_min(
                    F.transform(
                        F.sequence(i, F.col("b")),
                        lambda k: block_mean(j, k),
                    )
                ),
            )
        ),
    )
    # lazy barrier: fused with the explode, the O(B^3) minimax fold would
    # re-evaluate once per OUTPUT row (B x B^3) — the Generate
    # re-evaluation class; the checkpoint materializes the 1-row panel once
    iso = pre.select("l", fit.alias("fit")).localCheckpoint(eager=False)
    out = iso.select(F.arrays_zip("l", "fit").alias("z")).select(
        F.explode("z").alias("r")
    )
    return out.select(
        F.col("r.l.q").alias("quantity"),
        F.col("r.l.n").alias("n"),
        F.col("r.l.pos").alias("pos"),
        F.round(F.col("r.l.pos").cast("double") / F.col("r.l.n"), 6).alias(
            "raw_rate"
        ),
        F.round(F.col("r.fit"), 6).alias("iso_rate"),
    ).orderBy("quantity")


# --------------------------------------------- Cohen's kappa agreement
@register(
    "q_cohens_kappa",
    oracle="""
WITH r AS (
  SELECT CASE WHEN n_chars < 250 THEN 'short'
              WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS ra,
         CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 < 42 THEN 'short'
              WHEN length(text) - length(replace(text, ' ', '')) + 1 < 66 THEN 'mid'
              ELSE 'long' END AS rb
  FROM documents),
cells AS (SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY ra, rb),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
        FROM cells),
ma AS (SELECT ra AS cls, CAST(SUM(c) AS BIGINT) AS na FROM cells GROUP BY ra),
mb AS (SELECT rb AS cls, CAST(SUM(c) AS BIGINT) AS nb FROM cells GROUP BY rb),
pe AS (SELECT CAST(SUM(ma.na * mb.nb) AS BIGINT) AS chance_pairs
       FROM ma JOIN mb ON ma.cls = mb.cls)
SELECT t.n, t.agree,
       ROUND(t.agree * 1.0 / t.n, 6) AS po,
       ROUND(p.chance_pairs * 1.0 / (t.n * t.n), 6) AS pe,
       ROUND((t.agree * 1.0 / t.n - p.chance_pairs * 1.0 / (t.n * t.n))
             / (1.0 - p.chance_pairs * 1.0 / (t.n * t.n)), 6) AS kappa
FROM tot t CROSS JOIN pe p
""",
    doc="Cohen's kappa inter-rater agreement (Cohen 1960) between two "
    "deterministic document labelers — the chars-based length bucket vs "
    "the whitespace-token bucket (the label-QA shape: how much do two "
    "heuristic annotators agree beyond chance before you trust either "
    "for training labels?).  All contingency machinery is exact "
    "bigints (diagonal count, marginal products); po/pe/kappa are "
    "single IEEE divisions rounded at the end, so both engines agree "
    "bit-for-bit.  Scale: one corpus-keyed aggregate to <=9 cells, "
    "then 3-row broadcast marginal joins — corpus never re-scanned.",
)
def q_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    r = d.select(
        F.when(F.col("n_chars") < 250, "short")
        .when(F.col("n_chars") < 400, "mid")
        .otherwise("long")
        .alias("ra"),
        F.when(words < 42, "short").when(words < 66, "mid").otherwise("long").alias("rb"),
    )
    cells = r.groupBy("ra", "rb").agg(F.count(F.lit(1)).alias("c"))
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0)).alias(
            "agree"
        ),
    )
    ma = cells.groupBy(F.col("ra").alias("cls")).agg(F.sum("c").alias("na"))
    mb = cells.groupBy(F.col("rb").alias("cls")).agg(F.sum("c").alias("nb"))
    pe = (
        ma.join(F.broadcast(mb), "cls")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("chance_pairs"))
    )
    po_c = F.col("agree") * 1.0 / F.col("n")
    pe_c = F.col("chance_pairs") * 1.0 / (F.col("n") * F.col("n"))
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            "n",
            "agree",
            F.round(po_c, 6).alias("po"),
            F.round(pe_c, 6).alias("pe"),
            F.round((po_c - pe_c) / (F.lit(1.0) - pe_c), 6).alias("kappa"),
        )
    )


# --------------------------------------------- Kendall tau-b rank correlation
@register(
    "q_kendall_tau",
    oracle="""
WITH cells AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1),
pairs AS (
  SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                         OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                         OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM cells a JOIN cells b ON a.m < b.m)
SELECT n0, c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
       CASE WHEN n0 > tx AND n0 > ty THEN
         ROUND((c - d) / (SQRT(CAST(n0 - tx AS DOUBLE)) * SQRT(CAST(n0 - ty AS DOUBLE))), 6)
       END AS tau_b
FROM pairs
""",
    doc="Kendall tau-b rank correlation (Kendall 1938; tau-b tie "
    "correction) between monthly revenue and monthly order count — the "
    "monotone-association test you reach for when Pearson (q_corr_matrix) "
    "is distorted by outliers and Theil-Sen (q_theil_sen) answers slope, "
    "not association strength.  The orders table reduces to <=B monthly "
    "cells (one partial-agg'd shuffle); the O(B^2) pair sweep then runs "
    "as a LEFT-TO-RIGHT nested fold inside a 1-row panel — exact integer "
    "concordant/discordant/tie counts, one IEEE sqrt at the end — while "
    "the DuckDB oracle keeps the natural quadratic self-join "
    "formulation, so agreement is a genuine two-formulation proof.  "
    "Scale: the corpus never sees the quadratic term; B months bound "
    "the panel regardless of order count (B=80 at sf0.1 -> 3160 pairs "
    "in one row).",
)
def q_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import prefix_panel

    o = load_table(spark, sf, "orders")
    cells = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    pan = prefix_panel(cells, ["m", "x", "y"], [])

    def pair_count(cond):
        # Σ_{i<j} [cond(l[i], l[j])] — left-to-right over the sorted cells
        return F.aggregate(
            F.sequence(F.lit(1), F.size("l") - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.aggregate(
                F.sequence(i + 1, F.size("l")),
                F.lit(0).cast("long"),
                lambda a, j: a
                + F.when(
                    cond(F.element_at(F.col("l"), i), F.element_at(F.col("l"), j)),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            ),
        )

    stat = pan.select(
        (F.size("l").cast("long") * (F.size("l") - 1) / 2).cast("long").alias("n0"),
        pair_count(
            lambda a, b: ((a["x"] < b["x"]) & (a["y"] < b["y"]))
            | ((a["x"] > b["x"]) & (a["y"] > b["y"]))
        ).alias("concordant"),
        pair_count(
            lambda a, b: ((a["x"] < b["x"]) & (a["y"] > b["y"]))
            | ((a["x"] > b["x"]) & (a["y"] < b["y"]))
        ).alias("discordant"),
        pair_count(lambda a, b: a["x"] == b["x"]).alias("ties_x"),
        pair_count(lambda a, b: a["y"] == b["y"]).alias("ties_y"),
    )
    return stat.select(
        "n0",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.when(
            (F.col("n0") > F.col("ties_x")) & (F.col("n0") > F.col("ties_y")),
            F.round(
                (F.col("concordant") - F.col("discordant"))
                / (
                    F.sqrt((F.col("n0") - F.col("ties_x")).cast("double"))
                    * F.sqrt((F.col("n0") - F.col("ties_y")).cast("double"))
                ),
                6,
            ),
        ).alias("tau_b"),  # NULL when a variable is constant (tau undefined)
    )


# --------------------------------------------- two-sample Poisson rate test
@register(
    "q_poisson_rate_test",
    oracle=f"""
WITH b AS (
  SELECT CASE WHEN ISODOW(ts) <= 5 THEN 'weekday' ELSE 'weekend' END AS bucket,
         CAST(ts AS DATE) AS d,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
  FROM events),
agg AS (
  SELECT bucket, CAST(SUM(hit) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT d) AS BIGINT) AS days
  FROM b GROUP BY bucket),
w AS (SELECT
        MAX(CASE WHEN bucket = 'weekday' THEN k END) AS k1,
        MAX(CASE WHEN bucket = 'weekday' THEN days END) AS t1,
        MAX(CASE WHEN bucket = 'weekend' THEN k END) AS k2,
        MAX(CASE WHEN bucket = 'weekend' THEN days END) AS t2
      FROM agg),
z AS (SELECT k1, t1, k2, t2,
             (k1 * 1.0 / t1 - k2 * 1.0 / t2)
             / SQRT(k1 * 1.0 / (t1 * t1) + k2 * 1.0 / (t2 * t2)) AS z_raw
      FROM w)
SELECT k1, t1, k2, t2,
       FLOOR((k1 * 1.0 / t1) * 10000 + 0.5) / 10000 AS rate_weekday,
       FLOOR((k2 * 1.0 / t2) * 10000 + 0.5) / 10000 AS rate_weekend,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR({{erfc}} * 1000000 + 0.5) / 1000000 AS p_two_sided
FROM z
""".replace("{erfc}", _ERFC_SQL.format(az="ABS(z_raw)")),
    doc="two-sample Poisson rate z-test (the unconditional Wald form, "
    "e.g. Krishnamoorthy & Thomson 2004): do purchases arrive at a "
    "different per-day rate on weekdays vs weekends?  Exposure is the "
    "observed distinct-day count per bucket (no calendar assumption), "
    "counts are exact bigints, and the two-sided p reuses the A&S "
    "7.1.25 rational erfc — the SAME documented approximation, written "
    "in the same fold order, as q_mann_whitney/q_fdr_bh, so both "
    "engines produce identical IEEE doubles.  Scale: one event-scan "
    "partial aggregate to two (bucket) cells; everything after is "
    "1-row arithmetic.",
)
def q_poisson_rate_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    b = ev.select(
        F.when(F.dayofweek("ts").isin(2, 3, 4, 5, 6), "weekday")
        .otherwise("weekend")
        .alias("bucket"),
        F.to_date("ts").alias("d"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
    )
    agg = b.groupBy("bucket").agg(
        F.sum("hit").cast("long").alias("k"),
        F.countDistinct("d").cast("long").alias("days"),
    )
    w = agg.agg(
        F.max(F.when(F.col("bucket") == "weekday", F.col("k"))).alias("k1"),
        F.max(F.when(F.col("bucket") == "weekday", F.col("days"))).alias("t1"),
        F.max(F.when(F.col("bucket") == "weekend", F.col("k"))).alias("k2"),
        F.max(F.when(F.col("bucket") == "weekend", F.col("days"))).alias("t2"),
    )
    r1 = F.col("k1") * 1.0 / F.col("t1")
    r2 = F.col("k2") * 1.0 / F.col("t2")
    z = w.select(
        "k1",
        "t1",
        "k2",
        "t2",
        (
            (r1 - r2)
            / F.sqrt(
                F.col("k1") * 1.0 / (F.col("t1") * F.col("t1"))
                + F.col("k2") * 1.0 / (F.col("t2") * F.col("t2"))
            )
        ).alias("z_raw"),
    )
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    return z.select(
        "k1",
        "t1",
        "k2",
        "t2",
        (F.floor((F.col("k1") * 1.0 / F.col("t1")) * 10000 + 0.5) / 10000).alias(
            "rate_weekday"
        ),
        (F.floor((F.col("k2") * 1.0 / F.col("t2")) * 10000 + 0.5) / 10000).alias(
            "rate_weekend"
        ),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (F.floor((1 / F.pow(denom, 4)) * 1000000 + 0.5) / 1000000).alias(
            "p_two_sided"
        ),
    )


# ------------------------------------------ Cochran-Armitage trend test
@register(
    "q_cochran_armitage",
    oracle=f"""
WITH c AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM orders GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(k) AS BIGINT) AS kk,
             CAST(SUM(w * k) AS BIGINT) AS swk,
             CAST(SUM(w * n) AS BIGINT) AS swn,
             CAST(SUM(w * w * n) AS BIGINT) AS swwn
      FROM c),
z AS (SELECT nn, kk,
             (swk - kk * 1.0 / nn * swn)
             / SQRT((kk * 1.0 / nn) * (1.0 - kk * 1.0 / nn)
                    * (swwn - swn * 1.0 * swn / nn)) AS z_raw
      FROM t)
SELECT nn AS n, kk AS successes,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR({{erfc}} * 1000000 + 0.5) / 1000000 AS p_two_sided
FROM z
""".replace("{erfc}", _ERFC_SQL.format(az="ABS(z_raw)")),
    doc="Cochran-Armitage trend test (Cochran 1954, Armitage 1955): is "
    "the fulfilled-order proportion monotonically associated with the "
    "ORDERED priority level (scores 1..5 parsed from the label)?  The "
    "categorical-trend companion to q_chi2_independence, which ignores "
    "category order.  Every moment (Σwn, Σwk, Σw²n) is an exact bigint "
    "from <=5 cells; the z statistic is one closed-form float "
    "expression and the two-sided p reuses the repo-standard A&S "
    "7.1.25 erfc, so both engines emit identical IEEE doubles.  "
    "Scale: one order-scan partial aggregate to 5 cells; everything "
    "after is 1-row arithmetic.",
)
def q_cochran_armitage(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    t = c.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("k").cast("long").alias("kk"),
        F.sum(F.col("w") * F.col("k")).cast("long").alias("swk"),
        F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).cast("long").alias("swwn"),
    )
    pbar = F.col("kk") * 1.0 / F.col("nn")
    z = t.select(
        "nn",
        "kk",
        (
            (F.col("swk") - pbar * F.col("swn"))
            / F.sqrt(
                pbar
                * (F.lit(1.0) - pbar)
                * (F.col("swwn") - F.col("swn") * 1.0 * F.col("swn") / F.col("nn"))
            )
        ).alias("z_raw"),
    )
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    return z.select(
        F.col("nn").alias("n"),
        F.col("kk").alias("successes"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (F.floor((1 / F.pow(denom, 4)) * 1000000 + 0.5) / 1000000).alias(
            "p_two_sided"
        ),
    )


# ------------------------------------------ Levene homogeneity screen
@register(
    "q_levene_test",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS grp, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
s AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM v GROUP BY grp),
z AS (SELECT v.grp, s.n, ABS(CAST(v.x AS HUGEINT) * s.n - s.sx) AS znum
      FROM v JOIN s ON v.grp = s.grp),
g AS (SELECT grp, MAX(n) AS n,
             SUM(znum) AS a,
             SUM(CAST(znum AS HUGEINT) * znum) AS b
      FROM z GROUP BY grp),
p AS (SELECT list({'grp': grp, 'n': n, 'a': a, 'b': b} ORDER BY grp) AS l FROM g),
m AS (SELECT l,
             len(l) AS k,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(l, c -> c.n)), (p, q) -> p + q) AS nn,
             list_reduce(list_prepend(0.0,
               list_transform(l, c -> CAST(c.a AS DOUBLE) / c.n)),
               (p, q) -> p + q) AS zsum
      FROM p),
w AS (SELECT k, nn,
             list_reduce(list_prepend(0.0,
               list_transform(l, c -> c.n * POW(CAST(c.a AS DOUBLE) / c.n / c.n
                                                - zsum / nn, 2))),
               (p, q) -> p + q) AS num,
             list_reduce(list_prepend(0.0,
               list_transform(l, c -> CAST(c.b AS DOUBLE) / POW(CAST(c.n AS DOUBLE), 2)
                                      - POW(CAST(c.a AS DOUBLE), 2)
                                        / POW(CAST(c.n AS DOUBLE), 3))),
               (p, q) -> p + q) AS den
      FROM m)
SELECT CAST(k AS BIGINT) AS k_groups, nn AS n,
       FLOOR((nn - k) * 1.0 / (k - 1) * num / den * 1000000 + 0.5) / 1000000
         AS levene_w
FROM w
""",
    doc="Levene homogeneity-of-variance screen (Levene 1960, "
    "mean-centered form) across order-priority groups — the check you "
    "run BEFORE trusting q_anova_oneway, whose F-test assumes equal "
    "group variances.  Exactness trick: per-row absolute deviations "
    "|x - mean_i| are scaled by n_i into |n_i*x - S_i| — exact "
    "HUGEINT/decimal integers (a cents value times a group count "
    "already clears int64 when squared) — so the per-group Σz and Σz² "
    "moments are exact; the W statistic assembles from the <=5-cell "
    "sorted panel with LEFT-TO-RIGHT float folds, identical trees on "
    "both engines.  Scale: one broadcast of the 5-row group-stats "
    "panel back onto the order scan, one partial-agg'd regroup, then "
    "1-row panel math — the corpus is read twice and shuffled to 5 "
    "cells, never sorted.",
)
def q_levene_test(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    s = v.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("long").alias("sx")
    )
    z = v.join(F.broadcast(s), "grp").select(
        "grp",
        "n",
        F.abs(F.col("x").cast("decimal(38,0)") * F.col("n") - F.col("sx")).alias(
            "znum"
        ),
    )
    g = z.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.sum("znum").alias("a"),
        F.sum(F.col("znum") * F.col("znum")).alias("b"),
    )
    pan = g.agg(F.sort_array(F.collect_list(F.struct("grp", "n", "a", "b"))).alias("l"))
    k = F.size("l")
    nn = F.aggregate(F.col("l"), F.lit(0).cast("long"), lambda p, c: p + c["n"])
    # grand z-mean is the POOLED mean Σz / N (c.a / n sums the group's z
    # values exactly), not the unweighted mean of group means — with
    # unequal group sizes the two differ (caught by the brute-force
    # property test)
    zsum = F.aggregate(
        F.col("l"),
        F.lit(0.0),
        lambda p, c: p + c["a"].cast("double") / c["n"],
    )
    m = pan.select("l", k.alias("k"), nn.alias("nn"), zsum.alias("zsum"))
    num = F.aggregate(
        F.col("l"),
        F.lit(0.0),
        lambda p, c: p
        + c["n"]
        * F.pow(
            c["a"].cast("double") / c["n"] / c["n"] - F.col("zsum") / F.col("nn"), 2
        ),
    )
    den = F.aggregate(
        F.col("l"),
        F.lit(0.0),
        lambda p, c: p
        + c["b"].cast("double") / F.pow(c["n"].cast("double"), 2)
        - F.pow(c["a"].cast("double"), 2) / F.pow(c["n"].cast("double"), 3),
    )
    w = m.select("k", "nn", num.alias("num"), den.alias("den"))
    return w.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").alias("n"),
        (
            F.floor(
                (F.col("nn") - F.col("k")) * 1.0 / (F.col("k") - 1)
                * F.col("num")
                / F.col("den")
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("levene_w"),
    )


# ------------------------------------------ overdispersion / NB moment fit
@register(
    "q_overdispersion_nb",
    oracle="""
WITH c AS (
  SELECT user_id, CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY user_id),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS s1,
             SUM(CAST(k AS HUGEINT) * k) AS s2
      FROM c),
d AS (SELECT n, s1,
             s1 * 1.0 / n AS mean,
             CAST(s2 AS DOUBLE) / n - (s1 * 1.0 / n) * (s1 * 1.0 / n) AS varp
      FROM m)
SELECT n, s1 AS total_events,
       FLOOR(mean * 1000000 + 0.5) / 1000000 AS mean,
       FLOOR(varp * 1000000 + 0.5) / 1000000 AS var_pop,
       FLOOR(varp / mean * 1000000 + 0.5) / 1000000 AS dispersion_index,
       CASE WHEN varp > mean THEN
         FLOOR(mean * mean / (varp - mean) * 1000000 + 0.5) / 1000000
       END AS nb_r,
       CASE WHEN varp > mean THEN
         FLOOR(mean / varp * 1000000 + 0.5) / 1000000
       END AS nb_p
FROM d
""",
    doc="overdispersion audit + negative-binomial method-of-moments fit "
    "over per-user click counts: dispersion index Var/mean (the "
    "Poisson-adequacy check every count model starts with), and when "
    "genuinely overdispersed the NB(r, p) moment estimates "
    "r = μ²/(σ²-μ), p = μ/σ² — NULL otherwise, because fitting NB to "
    "equi/underdispersed counts is statistically meaningless and a "
    "silent negative r would be a wrong answer.  Moments are exact "
    "integers (Σk, Σk² in HUGEINT/decimal); the estimates are closed-"
    "form float expressions evaluated once.  Scale: one user-keyed "
    "partial aggregate, one 1-row reduce.",
)
def q_overdispersion_nb(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("k")
    )
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("s1"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("s2"),
    )
    mean = F.col("s1") * 1.0 / F.col("n")
    varp = F.col("s2").cast("double") / F.col("n") - mean * mean
    d = m.select("n", "s1", mean.alias("mean"), varp.alias("varp"))
    mu, vp = F.col("mean"), F.col("varp")
    return d.select(
        "n",
        F.col("s1").alias("total_events"),
        (F.floor(mu * 1000000 + 0.5) / 1000000).alias("mean"),
        (F.floor(vp * 1000000 + 0.5) / 1000000).alias("var_pop"),
        (F.floor(vp / mu * 1000000 + 0.5) / 1000000).alias("dispersion_index"),
        F.when(vp > mu, F.floor(mu * mu / (vp - mu) * 1000000 + 0.5) / 1000000).alias(
            "nb_r"
        ),
        F.when(vp > mu, F.floor(mu / vp * 1000000 + 0.5) / 1000000).alias("nb_p"),
    )


# ------------------------------------------------- Jarque-Bera normality test
@register(
    "q_jarque_bera",
    oracle="""
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x FROM orders),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s1,
             SUM(CAST(x AS HUGEINT) * x) AS s2,
             SUM(CAST(x AS HUGEINT) * x * x) AS s3,
             SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
      FROM c),
d AS (SELECT n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM m),
cm AS (SELECT n, mu,
              r2 - mu * mu AS m2,
              r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
              r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu AS m4
       FROM d),
s AS (SELECT n, m3 / POWER(m2, 1.5) AS skew, m4 / (m2 * m2) - 3.0 AS exkurt
      FROM cm)
SELECT n,
       FLOOR(skew * 1000000 + 0.5) / 1000000 AS skewness,
       FLOOR(exkurt * 1000000 + 0.5) / 1000000 AS kurtosis_excess,
       FLOOR(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0) * 1000000 + 0.5)
         / 1000000 AS jb_stat
FROM s
""",
    doc="Jarque-Bera normality test (Jarque & Bera 1980) on order totals: "
    "skewness and excess kurtosis from EXACT raw moment sums "
    "(Sigma x..Sigma x^4 in decimal(38)/HUGEINT cents — a total's 4th "
    "power is ~1e30, far past int64), central moments and the JB "
    "statistic as one closed-form double expression evaluated once per "
    "engine with mirrored trees.  This is the pre-flight check before "
    "any z-test/CI in the suite assumes normal-ish tails.  Scale: one "
    "map-side-combined 1-row aggregate; nothing downstream of the four "
    "scalars touches the corpus.",
)
def q_jarque_bera(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("x"))
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("s1"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("s2"),
        F.sum(dec(F.col("x")) * F.col("x") * F.col("x")).alias("s3"),
        F.sum(dec(F.col("x")) * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    d = m.select("n", mu.alias("mu"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
    mu_, r2_, r3_, r4_ = F.col("mu"), F.col("r2"), F.col("r3"), F.col("r4")
    cm = d.select(
        "n",
        "mu",
        (r2_ - mu_ * mu_).alias("m2"),
        (r3_ - F.lit(3) * mu_ * r2_ + F.lit(2) * mu_ * mu_ * mu_).alias("m3"),
        (
            r4_
            - F.lit(4) * mu_ * r3_
            + F.lit(6) * mu_ * mu_ * r2_
            - F.lit(3) * mu_ * mu_ * mu_ * mu_
        ).alias("m4"),
    )
    s = cm.select(
        "n",
        (F.col("m3") / F.pow(F.col("m2"), F.lit(1.5))).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0)).alias("exkurt"),
    )
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return s.select(
        "n",
        r6(F.col("skew")).alias("skewness"),
        r6(F.col("exkurt")).alias("kurtosis_excess"),
        r6(
            F.col("n")
            / F.lit(6.0)
            * (
                F.col("skew") * F.col("skew")
                + F.col("exkurt") * F.col("exkurt") / F.lit(4.0)
            )
        ).alias("jb_stat"),
    )


# --------------------------------------------- Spearman rank correlation
@register(
    "q_spearman_corr",
    oracle="""
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sp
  FROM orders GROUP BY o_custkey),
base AS (
  SELECT c.c_custkey AS ck,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal,
         COALESCE(s.sp, 0) AS sp
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.ck),
va AS (SELECT bal AS v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY bal),
ra AS (SELECT v,
              2 * CAST(COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                + c + 1 AS r2
       FROM va),
vb AS (SELECT sp AS v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY sp),
rb AS (SELECT v,
              2 * CAST(COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                + c + 1 AS r2
       FROM vb),
rr AS (SELECT ra.r2 AS x, rb.r2 AS y
       FROM base JOIN ra ON base.bal = ra.v JOIN rb ON base.sp = rb.v),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM rr)
SELECT n,
       FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000 + 0.5)
         / 1000000 AS rho_spearman
FROM m
""",
    doc="Spearman rank correlation (Spearman 1904) between customer "
    "account balance and lifetime spend — the monotone-association "
    "complement to Kendall tau-b (q_kendall_tau) that survives on "
    "row-scale inputs: tau-b's pair sweep needs a bounded cell panel, "
    "Spearman just needs RANKS.  Average ranks with tie handling are "
    "computed in HALF-UNITS as exact integers (2*rank = 2*count_below "
    "+ ties + 1) from per-distinct-value counts run through the "
    "two-phase distributed prefix sum (operators/packing "
    ".with_prefix_sum — NEVER a single-partition global window; the "
    "oracle replays it with a plain window over distinct values), then "
    "Pearson on the integer ranks from decimal/HUGEINT moment sums — "
    "one IEEE sqrt at the end.  Customers without orders tie at spend "
    "0, exercising the tie path.  Scale: two distinct-value prefix "
    "passes + two value-keyed joins; no data-sized single task "
    "anywhere.",
)
def q_spearman_corr(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sp")
    )
    base = (
        c.select(
            F.col("c_custkey").alias("ck"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
        )
        .join(spend, "ck", "left")
        .select("ck", "bal", F.coalesce("sp", F.lit(0)).alias("sp"))
    )

    def rank2(col: str):
        vals = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        pref = with_prefix_sum(vals, "v", "c", out_col="below")
        return pref.select(
            "v", (2 * F.col("below") + F.col("c") + 1).cast("long").alias("r2")
        )

    ra, rb = rank2("bal"), rank2("sp")
    rr = (
        base.join(ra.withColumnRenamed("v", "bal"), "bal")
        .withColumnRenamed("r2", "x")
        .join(rb.withColumnRenamed("v", "sp"), "sp")
        .withColumnRenamed("r2", "y")
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    m = rr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "n",
        (F.floor(num / den * 1000000 + 0.5) / 1000000).alias("rho_spearman"),
    )


# --------------------------------------------------- McNemar paired test
@register(
    "q_mcnemar",
    oracle="""
WITH r AS (
  SELECT n_chars >= 325 AS a,
         length(text) - length(replace(text, ' ', '')) + 1 >= 60 AS b
  FROM documents),
cells AS (
  SELECT CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS both_pos,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS both_neg
  FROM r)
SELECT both_pos, only_a, only_b, both_neg,
       both_pos + only_a + only_b + both_neg AS n,
       CASE WHEN only_a + only_b > 0 THEN
         FLOOR(CAST((only_a - only_b) * (only_a - only_b) AS DOUBLE)
               / (only_a + only_b) * 1000000 + 0.5) / 1000000 END AS mcnemar_chi2,
       CASE WHEN only_a + only_b > 0 THEN
         FLOOR(POWER(ABS(CAST(only_a - only_b AS DOUBLE)) - 1.0, 2)
               / (only_a + only_b) * 1000000 + 0.5) / 1000000 END AS mcnemar_cc
FROM cells
""",
    doc="McNemar's paired test (McNemar 1947) between two binary "
    "document gates on the SAME rows — long-by-chars vs long-by-words "
    "— the marginal-homogeneity check for replacing one production "
    "filter with another: only the DISCORDANT cells carry evidence, so "
    "the chi2 is (b-c)^2/(b+c) with Edwards' continuity-corrected "
    "variant alongside (the kappa query answers agreement STRENGTH; "
    "this answers whether the swap shifts the accept rate).  The 2x2 "
    "cells are exact bigints from one corpus aggregate; the two "
    "statistics are single mirrored float expressions, NULL when no "
    "discordant pairs exist.  Scale: one map-side-combined 1-row "
    "reduce; nothing else touches the corpus.",
)
def q_mcnemar(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    r = d.select(
        (F.col("n_chars") >= 325).alias("a"), (words >= 60).alias("b")
    )
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    cells = r.agg(
        one(F.col("a") & F.col("b")).alias("both_pos"),
        one(F.col("a") & ~F.col("b")).alias("only_a"),
        one(~F.col("a") & F.col("b")).alias("only_b"),
        one(~F.col("a") & ~F.col("b")).alias("both_neg"),
    )
    oa, ob = F.col("only_a"), F.col("only_b")
    disc = oa + ob
    return cells.select(
        "both_pos",
        "only_a",
        "only_b",
        "both_neg",
        (F.col("both_pos") + oa + ob + F.col("both_neg")).alias("n"),
        F.when(
            disc > 0,
            F.floor(((oa - ob) * (oa - ob)).cast("double") / disc * 1000000 + 0.5)
            / 1000000,
        ).alias("mcnemar_chi2"),
        F.when(
            disc > 0,
            F.floor(
                F.pow(F.abs((oa - ob).cast("double")) - F.lit(1.0), F.lit(2))
                / disc
                * 1000000
                + 0.5
            )
            / 1000000,
        ).alias("mcnemar_cc"),
    )


# ------------------------------------------- Mahalanobis outlier screen
@register(
    "q_mahalanobis_outliers",
    oracle="""
WITH cust AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY o_custkey),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM cust),
c AS (SELECT n,
             n * sxx - sx * sx AS cxx,
             n * syy - sy * sy AS cyy,
             n * sxy - sx * sy AS cxy,
             sx, sy
      FROM m),
d AS (SELECT cust.ck, cust.x, cust.y, c.n, c.cxx, c.cyy, c.cxy,
             c.n * cust.x - c.sx AS dx,
             c.n * cust.y - c.sy AS dy
      FROM cust CROSS JOIN c),
md AS (SELECT ck, x, y, n, cxx, cyy, cxy,
              cyy * (dx * dx) - 2 * ((dx * dy) * cxy) + cxx * (dy * dy) AS mnum
       FROM d)
SELECT ck AS custkey, x AS spend_dollars, y AS n_orders,
       FLOOR(CAST(n - 1 AS DOUBLE) / n * (CAST(mnum AS DOUBLE)
             / CAST(cxx * cyy - cxy * cxy AS DOUBLE)) * 1000000 + 0.5) / 1000000
         AS mahalanobis_d2
FROM md
ORDER BY mnum DESC, ck
LIMIT 20
""",
    doc="Mahalanobis-distance outlier screen (Mahalanobis 1936) over the "
    "per-customer (lifetime spend, order count) plane — the correlation-"
    "aware multivariate complement to e_anomaly_mad (univariate) and "
    "v_centroid_outliers (embedding-space): a customer can be "
    "unremarkable on each margin yet far off the joint spend-frequency "
    "ridge.  The 2x2 covariance inverts in closed form, and the WHOLE "
    "ranking stays exact: spend quantizes to whole dollars, Dx = n*x - "
    "Sx and the quadratic form cyy*Dx^2 - 2*cxy*Dx*Dy + cxx*Dy^2 "
    "accumulate in decimal(38)/HUGEINT (cents would clear 1e38 at "
    "sf1 — the quantization IS the overflow headroom), ties break on "
    "custkey, and the one float division per row happens only for the "
    "displayed d2.  Scale: one fact-table groupBy, a 1-row broadcast "
    "moment panel, per-row integer arithmetic, TakeOrdered top-20 — "
    "no global sort.",
)
def q_mahalanobis_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import attach_scalar_panel

    o = load_table(spark, sf, "orders")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    m = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
    )
    nD = F.col("n").cast("decimal(38,0)")
    c = m.select(
        "n",
        "sx",
        "sy",
        (nD * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
        (nD * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
        (nD * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
    )
    d = attach_scalar_panel(cust, c).select(
        "ck",
        "x",
        "y",
        "n",
        "cxx",
        "cyy",
        "cxy",
        (F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("sx")).alias("dx"),
        (F.col("n").cast("decimal(38,0)") * F.col("y") - F.col("sy")).alias("dy"),
    )
    mnum = (
        F.col("cyy") * (F.col("dx") * F.col("dx"))
        - 2 * ((F.col("dx") * F.col("dy")) * F.col("cxy"))
        + F.col("cxx") * (F.col("dy") * F.col("dy"))
    )
    md = d.select("ck", "x", "y", "n", "cxx", "cyy", "cxy", mnum.alias("mnum"))
    det = (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")).cast("double")
    return (
        md.orderBy(F.col("mnum").desc(), "ck")
        .limit(20)
        .select(
            F.col("ck").alias("custkey"),
            F.col("x").alias("spend_dollars"),
            F.col("y").alias("n_orders"),
            (
                F.floor(
                    (F.col("n") - 1).cast("double")
                    / F.col("n")
                    * (F.col("mnum").cast("double") / det)
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("mahalanobis_d2"),
        )
    )
