"""Round-3 statistics + graph suite: regression, triangle counting,
Bloom-style join pruning, and streaming-order smoothing — four shapes the
catalog did not yet cover.

* ``q_ols_trend`` — per-group ordinary-least-squares trend (slope /
  intercept of monthly order revenue), computed from exact integer
  moment sums so the fit is engine-portable (the ``regr_slope`` family
  re-derived on the repo's exact-cents convention).
* ``x_triangle_count`` — distributed triangle counting over the
  part-co-purchase graph with DEGREE ORIENTATION (Suri & Vassilvitskii
  2011 "Counting Triangles and the Curse of the Last Reducer"): every
  edge points low-degree → high-degree endpoint, bounding the wedge
  fan-out per node by O(sqrt(m)) so no reducer sees a hub's full
  neighborhood square.
* ``x_bloom_join_prune`` — Bloom-style pre-shuffle pruning audit: hash
  the dim-side keys into a fixed bucket space, semi-join the fact side
  on bucket membership BEFORE the expensive key shuffle, and report the
  false-positive overhead vs the true semi-join — the run-time-filter /
  dynamic-partition-pruning trade Spark's own runtime filters make.
* ``e_ewma_smooth`` — per-user exponentially-weighted moving average of
  click values as a bounded 8-tap FIR (alpha = 1/2, so every weight is
  an exactly-representable binary fraction), over a partitioned window
  — never a global sort.
* ``v_kmeans_step`` — one exactly-verified Lloyd iteration (micro-unit
  integer geometry end-to-end).
* ``x_bfs_levels`` — frontier BFS from hub seeds, recursive-CTE oracle.
* ``e_survival_curve`` — Kaplan-Meier product-limit estimator with an
  order-pinned factor fold.
* ``e_flow_conformance`` — funnel state machine folded per user; the
  oracle is an independent cumulative-window formulation.
* ``e_did_estimate`` — difference-in-differences 2x2 causal panel.
* ``x_histogram_quantiles`` — mergeable 256-bin quantiles with the
  exact-percentile error audit in the same query.
* ``e_rolling_retention`` — per-day 7-day return rate via a user-keyed
  banded self-join.
* ``e_power_analysis`` — experiment sizing from exact pre-period
  moments (16σ²/δ² rule).
* ``q_revenue_concentration`` — Lorenz-decile revenue shares on the
  two-phase distributed prefix rank.
* ``e_bootstrap_ci`` — Poisson-bootstrap confidence intervals: B
  deterministic hash-drawn Poisson(1) weights per record, replicate
  means by map-side partial aggregation (never a materialized
  resample).
* ``q_chi2_independence`` — chi-square independence test + Cramér's V
  from one contingency reduce.
* ``x_kmv_sketch`` — k-minimum-values distinct sketch per group with
  an in-query exact-count audit (salted two-phase bottom-k).
* ``q_corr_matrix`` — pairwise Pearson correlations from one scan's
  exact integer moment panel.
* ``q_ks_2sample`` — exact two-sample Kolmogorov-Smirnov drift test:
  both empirical CDFs from ONE two-phase distributed prefix-sum pass,
  sup-difference as an exact integer cross-product max.
* ``x_kmv_setops`` — KMV sketch set algebra (union / Jaccard /
  intersection estimates from merged bottom-k sketches) audited
  against exact counts in the same query.
* ``q_mann_whitney`` — tie-corrected Mann-Whitney U from per-value
  counts and the shared prefix-sum midranks (doubled-rank integers);
  A&S rational erfc for the two-sided p.
* ``x_modularity`` — Newman modularity decomposition of the LPA
  communities (exact intra-edge/degree integers, one mirrored float).
* ``e_holt_trend`` — Holt level+trend double smoothing as two bounded
  FIRs over one user-partitioned window; one-step forecast.
* ``q_fdr_bh`` — Benjamini-Hochberg step-up over a 24-hypothesis
  hour-of-day panel (A&S erfc p-values, rank via panel self-join).
* ``e_cross_correlation`` — lead-lag Pearson r between the daily click
  and purchase series at lags -3..+3 from exact widened moments.
* ``e_stickiness_dau_mau`` — monthly DAU/MAU engagement ratio with
  exact two-phase distinct counts.
* ``q_runs_test`` — Wald-Wolfowitz runs test on the monthly revenue
  direction sequence (adjacency via index-equi joins, never a sort).
* ``q_seasonal_decompose`` — additive trend/seasonal/residual split of
  monthly revenue; the 2x12 MA rides an exploded-offset equi-join and
  every numerator stays integer cents (x24).
* ``e_burst_velocity`` — per-user peak trailing-60s event burst via one
  partitioned RANGE window (the exact rate-limit primitive).
* ``q_kpi_decomposition`` — MoM revenue growth split into customers x
  frequency x AOV log-contributions with an in-row closure proof.
* ``q_new_vs_returning`` — acquisition-cohort revenue split via one
  customer-keyed first-month join.
* ``e_ab_conversion_test`` — pooled-variance two-proportion z between
  parity arms on the above-mean-purchaser flag (exact integer gate).
* ``q_logistic_gd`` — in-engine logistic regression: base-rate-logit
  warm start + quantized-gradient GD passes (rational sigmoid, integer
  micro-unit residual sums), integer sign-test accuracy readout.
* ``q_woe_iv`` — weight-of-evidence / information-value feature audit
  from one integer cross-product ratio per bin inside a mirrored ln.
* ``q_forecast_backtest`` — rolling-origin naive vs seasonal-naive MAE
  comparison in exact integer cents, with a per-month win rate.
* ``e_behavior_entropy`` — per-user event-mix Shannon entropy with
  micro-unit-quantized k*ln(k) terms (order-independent group sums).

No reference counterpart: these extend the curation/analytics surface
beyond `/root/reference` (which has no relational query layer at all);
they follow the same QuerySpec + DuckDB-oracle contract as the rest of
the catalog.
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


# ------------------------------------------------------ triangle counting
def _copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Support-2 part-co-purchase edge list (u < v), localCheckpointed.

    The edge list feeds many consumers (degree table, orientation, the
    closing-edge join, count panels, BFS frontiers); without lineage
    truncation Catalyst replicates the expensive pair self-join into
    every branch (measured: 72 FileScans / 147 Exchanges in the composed
    triangle plan).  localCheckpoint materializes it once — the same
    pattern the connected-components machinery uses (operators/graph.py).
    """
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    edges = (
        pairs.groupBy("u", "v").agg(F.count("*").alias("c")).where("c >= 2").drop("c")
    )
    return edges.localCheckpoint()


@register(
    "x_triangle_count",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) __n
        GROUP BY node),
oriented AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
okey AS (SELECT o.src, o.dst, d.deg AS dst_deg
         FROM oriented o JOIN deg d ON o.dst = d.node),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM okey e1 JOIN okey e2 ON e1.src = e2.src
  WHERE e1.dst_deg < e2.dst_deg OR (e1.dst_deg = e2.dst_deg AND e1.dst < e2.dst)),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        FROM wedges w JOIN oriented o ON w.b = o.src AND w.c = o.dst)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS wedges,
       (SELECT triangles FROM tri) AS triangles
""",
    doc="triangle count over the part-co-purchase graph (parts co-ordered "
    "in >= 2 distinct orders), via DEGREE-ORIENTED wedge closure (Suri & "
    "Vassilvitskii 2011): orient every edge from its (degree, id)-smaller "
    "endpoint, enumerate ordered out-wedges per source, and close them "
    "against the oriented edge list — each triangle is produced exactly "
    "once from its minimum vertex.  Scale: the support-2 HAVING filter "
    "is a partial-agg'd density control on the pair stream; orientation "
    "bounds per-node wedge fan-out by O(sqrt(m)) so hub parts cannot "
    "melt one reducer (the 'curse of the last reducer'); all joins are "
    "node-keyed equi-joins.",
)
def x_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    # oriented is likewise read three times (both wedge arms + closing).
    oriented = oriented.localCheckpoint()
    okey = oriented.join(
        deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dst_deg"), "dst"
    )
    e1 = okey.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dst_deg").alias("bd")
    )
    e2 = okey.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("dst_deg").alias("cd")
    )
    wedges = e1.join(e2, "a").where(
        (F.col("bd") < F.col("cd")) | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    ).select("a", "b", "c")
    closing = oriented.withColumnRenamed("src", "b").withColumnRenamed("dst", "c")
    tri = wedges.join(closing, ["b", "c"]).agg(F.count("*").alias("triangles"))
    counts = (
        deg.agg(F.count("*").alias("nodes"))
        .crossJoin(edges.agg(F.count("*").alias("edges")))
        .crossJoin(wedges.agg(F.count("*").alias("wedges")))
        .crossJoin(tri)
    )
    return counts.select("nodes", "edges", "wedges", "triangles")


# ------------------------------------------------------ Bloom-style pruning
_BLOOM_BUCKETS = 8192


@register(
    "x_bloom_join_prune",
    oracle=f"""
WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
buckets AS (SELECT DISTINCT
              {portable_hash64_sql("CAST(c_custkey AS VARCHAR)")} % {_BLOOM_BUCKETS} AS b
            FROM dim),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM orders),
cand AS (SELECT CAST(COUNT(*) AS BIGINT) AS candidate_rows FROM orders
         WHERE {portable_hash64_sql("CAST(o_custkey AS VARCHAR)")} % {_BLOOM_BUCKETS}
               IN (SELECT b FROM buckets)),
tru AS (SELECT CAST(COUNT(*) AS BIGINT) AS matched_rows FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM dim))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS dim_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM buckets) AS buckets_set,
       total_rows, candidate_rows, matched_rows,
       candidate_rows - matched_rows AS false_positive_rows,
       FLOOR(CAST(candidate_rows - matched_rows AS DOUBLE)
             / candidate_rows * 1000000 + 0.5) / 1000000 AS fp_rate,
       FLOOR((1.0 - CAST(candidate_rows AS DOUBLE) / total_rows) * 1000000 + 0.5)
         / 1000000 AS scan_reduction
FROM tot, cand, tru
""",
    doc="Bloom-style pre-shuffle pruning audit: project the BUILDING-"
    "segment customer keys into a fixed 8192-bucket hash space, prune "
    "the orders fact on bucket membership BEFORE any key shuffle, and "
    "compare against the true semi-join — reporting false-positive rate "
    "and scan reduction, i.e. exactly the trade Spark's runtime bloom "
    "filters / dynamic partition pruning make.  Scale: the bucket panel "
    "is at most 8192 values regardless of dim cardinality (broadcast, "
    "never shuffled); the fact side is scanned once per count with the "
    "membership test map-side; counts are partial-agg'd.",
)
def x_bloom_join_prune(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    dim = load_table(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    bucket_of = lambda col: portable_hash64(F.col(col).cast("string")) % _BLOOM_BUCKETS  # noqa: E731
    buckets = dim.select(bucket_of("c_custkey").alias("b")).distinct()
    cand = (
        orders.join(
            F.broadcast(buckets),
            bucket_of("o_custkey") == F.col("b"),
            "left_semi",
        ).agg(F.count("*").alias("candidate_rows"))
    )
    tru = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
    ).agg(F.count("*").alias("matched_rows"))
    panel = (
        dim.agg(F.count("*").alias("dim_keys"))
        .crossJoin(buckets.agg(F.count("*").alias("buckets_set")))
        .crossJoin(orders.agg(F.count("*").alias("total_rows")))
        .crossJoin(cand)
        .crossJoin(tru)
    )
    fp = F.col("candidate_rows") - F.col("matched_rows")
    return panel.select(
        "dim_keys",
        "buckets_set",
        "total_rows",
        "candidate_rows",
        "matched_rows",
        fp.alias("false_positive_rows"),
        (
            F.floor(fp.cast("double") / F.col("candidate_rows") * 1000000 + 0.5)
            / 1000000
        ).alias("fp_rate"),
        (
            F.floor(
                (1.0 - F.col("candidate_rows").cast("double") / F.col("total_rows"))
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("scan_reduction"),
    )


# ------------------------------------------------------ EWMA smoothing
_EWMA_TAPS = 8  # alpha = 1/2 -> weights 2^-j, exactly representable doubles


@register(
    "e_ewma_smooth",
    oracle=f"""
WITH c AS (
  SELECT event_id, user_id, value,
         {", ".join(f"lag(value, {j}) OVER w AS v{j}" for j in range(1, _EWMA_TAPS))}
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, value,
       FLOOR((value * 1.0{"".join(f" + COALESCE(v{j}, 0.0) * {0.5 ** j!r}" for j in range(1, _EWMA_TAPS))})
             / (1.0{"".join(f" + CASE WHEN v{j} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END" for j in range(1, _EWMA_TAPS))})
             * 1000000 + 0.5) / 1000000 AS ewma
FROM c
ORDER BY event_id
""",
    doc="per-user exponentially-weighted moving average of click values "
    "as a bounded 8-tap FIR (alpha = 1/2): ewma_t = sum(2^-j * x_(t-j)) "
    "/ sum(2^-j) over the taps that exist — the truncated form of the "
    "recursive EWMA, chosen because the infinite recursion is order-"
    "serial and unbounded state while the FIR is a fixed-width lag "
    "window.  Determinism: every weight 2^-j is an exactly-representable "
    "binary double and both engines fold the taps in the same written "
    "order, so the quotient is bit-identical before floor-rounding.  "
    "Scale: ONE user-partitioned window (never a global sort); state per "
    "row is 7 lags.",
)
def e_ewma_smooth(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    clicks = load_table(spark, sf, "events").where(F.col("event_type") == "click")
    lagged = clicks.select(
        "event_id",
        "user_id",
        "value",
        *[F.lag("value", j).over(w).alias(f"v{j}") for j in range(1, _EWMA_TAPS)],
    )
    num = F.col("value") * F.lit(1.0)
    den = F.lit(1.0)
    for j in range(1, _EWMA_TAPS):
        num = num + F.coalesce(F.col(f"v{j}"), F.lit(0.0)) * F.lit(0.5**j)
        den = den + F.when(F.col(f"v{j}").isNull(), F.lit(0.0)).otherwise(F.lit(0.5**j))
    return lagged.select(
        "event_id",
        "user_id",
        "value",
        (F.floor(num / den * 1000000 + 0.5) / 1000000).alias("ewma"),
    ).orderBy("event_id")


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


# ------------------------------------------------------ BFS reach levels
_EDGES_CTE = """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2)"""

_BFS_DEPTH = 3
_BFS_SEEDS = 4


@register(
    "x_bfs_levels",
    oracle=f"""
WITH RECURSIVE {_EDGES_CTE},
adj AS (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM adj GROUP BY src),
seeds AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT {_BFS_SEEDS}),
walk(node, lvl) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT a.dst, w.lvl + 1
  FROM walk w JOIN adj a ON w.node = a.src
  WHERE w.lvl < {_BFS_DEPTH}),
reached AS (SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl FROM walk GROUP BY node)
SELECT lvl AS level,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS node_checksum
FROM reached GROUP BY lvl ORDER BY level
""",
    doc="breadth-first reach levels from the 4 highest-degree hub parts "
    "over the support-2 co-purchase graph, depth 3 — the 'blast radius' "
    "walk behind recall/contamination spread audits.  Spark runs true "
    "frontier BFS (per-level distinct + left-anti against the visited "
    "set, localCheckpoint per level, one bounded loop); the oracle is a "
    "recursive CTE whose MIN(lvl) aggregation recovers the identical "
    "first-reached-level semantics.  Scale: each level is one equi-join "
    "on the frontier + one distinct + one anti-join — all partial-agg'd "
    "node-keyed shuffles; the visited set stays key-only; depth bounds "
    "the loop, and per-level checkpoints keep lineage O(1).",
)
def x_bfs_levels(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf)
    adj = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint()
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    seeds = (
        deg.orderBy(F.col("deg").desc(), "node").limit(_BFS_SEEDS).select("node")
    )
    visited = seeds.select("node", F.lit(0).alias("lvl")).localCheckpoint()
    frontier = visited.select("node")
    for lvl in range(1, _BFS_DEPTH + 1):
        frontier = (
            frontier.join(adj, frontier.node == adj.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        # visited is a union of already-checkpointed frontiers — its
        # lineage stays depth-bounded without another materialization
        visited = visited.unionAll(frontier.select("node", F.lit(lvl).alias("lvl")))
    return (
        visited.groupBy(F.col("lvl").cast("long").alias("level"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("level")
    )


# ------------------------------------------------------ Kaplan-Meier survival
_KM_CUT_US = 86_400_000_000  # censor users still active in the last 24h
_HOUR_US = 3_600_000_000


# shared by e_survival_curve (directly) and e_weibull_fit (as a subquery)
_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // {_HOUR_US} AS dur,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id),
cut AS (SELECT MAX(epoch_us(ts)) - {_KM_CUT_US} AS cutoff FROM events),
subj AS (SELECT u.dur, CASE WHEN u.last_us < cut.cutoff THEN 1 ELSE 0 END AS churned
         FROM u, cut),
steps AS (SELECT dur AS t, CAST(SUM(churned) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS ended
          FROM subj GROUP BY dur),
panel AS (SELECT list({{'t': t, 'd': d, 'ended': ended}} ORDER BY t) AS lst FROM steps),
arrs AS (
  SELECT lst,
         CAST(list_sum(list_transform(lst, x -> x.ended)) AS BIGINT) AS total,
         list_transform(lst, (x, i) ->
           CAST(list_sum(list_transform(lst, (y, j) ->
             CASE WHEN j < i THEN y.ended ELSE 0 END)) AS BIGINT)) AS before_i
  FROM panel),
arrs2 AS (
  SELECT lst, total, before_i,
         list_transform(lst, (x, i) ->
           CASE WHEN x.d > 0
                THEN 1.0 - CAST(x.d AS DOUBLE) / (total - before_i[i])
                ELSE 1.0 END) AS factors
  FROM arrs),
km AS (SELECT lst, total, before_i, factors,
              generate_subscripts(lst, 1) AS i FROM arrs2)
SELECT lst[i].t AS duration_hours,
       total - before_i[i] AS n_risk,
       lst[i].d AS n_churned,
       FLOOR(list_reduce(list_slice(factors, 1, i), (a, b) -> a * b)
             * 1000000 + 0.5) / 1000000 AS survival
FROM km
WHERE lst[i].d > 0
ORDER BY duration_hours
"""


@register(
    "e_survival_curve",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier survival curve over user lifetimes (hours between "
    "first and last event; users still active in the final 24 h are "
    "right-censored): S(t) = prod over churn times <= t of (1 - d/n) — "
    "the product-limit estimator (Kaplan & Meier 1958) behind every "
    "churn/retention duration model.  Determinism: lifetimes are exact "
    "integer micros div hours; d/ended/n are exact integers; the factor "
    "product folds LEFT-TO-RIGHT over the duration-sorted step list on "
    "both engines (F.aggregate vs list_reduce — same pairwise multiply "
    "sequence), so the double is bit-identical before floor-rounding.  "
    "Scale: one user-keyed partial-agg'd shuffle, then the step panel "
    "(bounded by distinct lifetime hours) folds in a SINGLE row — no "
    "global window, no per-subject state beyond the grouped agg.  The "
    "prefix computation is O(k^2) in the panel size k; at hour grain "
    "k stays in the thousands for year-long spans — coarsen the "
    "duration grain (days/weeks) as observation spans grow so the "
    "panel, not the corpus, stays the bounded object.",
)
def e_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    # product-limit machinery promoted to operators/survival.py (round 6);
    # this oracle-paired query pins it bit-for-bit
    from ..operators.panels import attach_scalar_panel
    from ..operators.survival import km_survival

    ev = load_table(spark, sf, "events")
    # ts may surface as TIMESTAMP or TIMESTAMP_NTZ depending on the
    # session's parquet nanos handling; the NTZ->TIMESTAMP cast applies a
    # constant session-tz shift that cancels in every expression below
    # (durations and the cutoff comparison are pure differences).
    us = F.expr("unix_micros(cast(ts as timestamp))")
    u = ev.groupBy("user_id").agg(
        F.expr(
            "(max(unix_micros(cast(ts as timestamp)))"
            f" - min(unix_micros(cast(ts as timestamp)))) div {_HOUR_US}"
        ).alias("dur"),
        F.max(us).alias("last_us"),
    )
    cut = ev.agg((F.max(us) - F.lit(_KM_CUT_US)).alias("cutoff"))
    subj = attach_scalar_panel(u, cut).select(
        "dur", F.when(F.col("last_us") < F.col("cutoff"), 1).otherwise(0).alias("churned")
    )
    return km_survival(subj, "dur", "churned").select(
        F.col("duration").alias("duration_hours"),
        "n_risk",
        F.col("n_events").alias("n_churned"),
        "survival",
    )


# ------------------------------------------------ parametric survival fit
@register(
    "e_weibull_fit",
    oracle=f"""
WITH km_out AS ({_KM_ORACLE}),
pts AS (
  SELECT list({{'x': ln(duration_hours), 'y': ln(-ln(survival))}}
              ORDER BY duration_hours) AS l
  FROM km_out
  WHERE duration_hours > 0 AND survival > 0 AND survival < 1),
s AS (
  SELECT CAST(len(l) AS BIGINT) AS n,
         list_reduce(list_transform(l, p -> p.x), (a, b) -> a + b) AS sx,
         list_reduce(list_transform(l, p -> p.y), (a, b) -> a + b) AS sy,
         list_reduce(list_transform(l, p -> p.x * p.x), (a, b) -> a + b) AS sxx,
         list_reduce(list_transform(l, p -> p.x * p.y), (a, b) -> a + b) AS sxy,
         list_reduce(list_transform(l, p -> p.y * p.y), (a, b) -> a + b) AS syy
  FROM pts),
fit AS (
  SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k, sx, sy,
         (n * sxy - sx * sy) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
  FROM s WHERE n >= 3)
SELECT n AS n_points,
       FLOOR(k * 1000000 + 0.5) / 1000000 AS shape_k,
       FLOOR(exp(-((sy - k * sx) / n) / k) * 100 + 0.5) / 100 AS scale_hours,
       FLOOR(r2 * 1000000 + 0.5) / 1000000 AS r2
FROM fit
""",
    doc="parametric Weibull fit of the Kaplan-Meier survival curve (the "
    "e_survival_curve output consumed downstream — same composition a "
    "reliability team runs): the product-limit S(t) linearizes as "
    "ln(-ln S) = k*ln t - k*ln lambda, so shape k and scale lambda come "
    "from a closed-form OLS over the (bounded) churn-step panel, with "
    "r^2 as the Weibull-ness diagnostic (k<1 infant-mortality churn, "
    "k=1 memoryless/exponential, k>1 wear-out).  Determinism: the "
    "regression consumes the ROUNDED survival values (already proven "
    "bit-identical cross-engine), the points list is duration-sorted, "
    "and every moment is a LEFT fold over that list on both engines "
    "(F.aggregate vs list_reduce — same pairwise sequence), so the "
    "doubles match before the final floor-rounding.  Scale: inherits "
    "the K-M shape (one user-keyed shuffle + single-row panel fold); "
    "the regression adds panel-only math.",
)
def e_weibull_fit(spark: SparkSession, sf: str) -> DataFrame:
    # linearized-OLS fit promoted to operators/survival.py (round 6);
    # degenerate panels (fewer than 3 usable churn steps at tiny SFs)
    # yield no fit row on BOTH engines rather than a divide-by-zero
    from ..operators.survival import weibull_from_km

    km = e_survival_curve(spark, sf)
    fit = weibull_from_km(km, "duration_hours", "survival")
    return fit.select(
        "n_points", "shape_k", F.col("scale").alias("scale_hours"), "r2"
    )


# ------------------------------------------------- event-flow conformance
@register(
    "e_flow_conformance",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS prior_browse
  FROM events),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND COALESCE(prior_browse, 0) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS valid_purchases,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND COALESCE(prior_browse, 0) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_browse,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_signup,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM ev GROUP BY user_id)
SELECT user_id, n_events,
       CASE WHEN valid_purchases > 0 THEN 'converted'
            WHEN n_browse > 0 THEN 'browsing'
            WHEN n_signup > 0 THEN 'registered'
            ELSE 'inactive' END AS final_state,
       n_violations, n_errors
FROM per_user
ORDER BY user_id
""",
    doc="per-user event-flow conformance: a monotone funnel state machine "
    "(inactive -> registered -> browsing -> converted) folded over each "
    "user's time-ordered event sequence; a purchase with NO prior "
    "view/click is a conformance violation (it does not convert).  The "
    "Spark side runs the REAL operator shape — an ordered higher-order "
    "aggregate fold carrying (state, violations, errors) — while the "
    "oracle derives the identical answer from a declarative cumulative-"
    "window formulation; their agreement is a two-formulation "
    "differential proof, not a translation.  Determinism: the fold order "
    "is the total (ts, event_id) order; all counters are exact integers.  "
    "Scale: ONE user-keyed shuffle; the fold state is 3 counters.  The "
    "collect_list is bounded by per-user history length — for unbounded "
    "histories the streaming twin (sessionize_with_state / "
    "applyInPandasWithState, streaming/ops.py) is the right surface.",
)
def e_flow_conformance(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    # fold: acc = (state-rank 0..3, violations, errors); monotone ranks
    # inactive=0 registered=1 browsing=2 converted=3
    init = F.struct(
        F.lit(0).alias("st"), F.lit(0).cast("long").alias("viol"),
        F.lit(0).cast("long").alias("err"),
    )

    def step(acc, x):
        et = x["event_type"]
        st = acc["st"]
        new_st = (
            F.when((et == "purchase") & (st >= 2), F.lit(3))
            .when((et == "view") | (et == "click"), F.greatest(st, F.lit(2)))
            .when(et == "signup", F.greatest(st, F.lit(1)))
            .otherwise(st)
        )
        viol = acc["viol"] + F.when(
            (et == "purchase") & (st < 2), F.lit(1)
        ).otherwise(F.lit(0)).cast("long")
        err = acc["err"] + F.when(et == "error", F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        return F.struct(new_st.alias("st"), viol.alias("viol"), err.alias("err"))

    folded = per_user.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.aggregate(F.col("seq"), init, step).alias("acc"),
    )
    state_name = (
        F.when(F.col("acc.st") == 3, "converted")
        .when(F.col("acc.st") == 2, "browsing")
        .when(F.col("acc.st") == 1, "registered")
        .otherwise("inactive")
    )
    return folded.select(
        "user_id",
        "n_events",
        state_name.alias("final_state"),
        F.col("acc.viol").alias("n_violations"),
        F.col("acc.err").alias("n_errors"),
    ).orderBy("user_id")


# ------------------------------------------------ difference-in-differences
_DID_CUT = "2024-01-16 00:00:00"


@register(
    "e_did_estimate",
    oracle=f"""
WITH cells AS (
  SELECT {portable_hash64_sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END AS post,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
s AS (SELECT arm, post, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM cells GROUP BY arm, post),
m AS (SELECT
        MAX(CASE WHEN arm = 1 AND post = 1 THEN CAST(total AS DOUBLE) / n END) AS tp,
        MAX(CASE WHEN arm = 1 AND post = 0 THEN CAST(total AS DOUBLE) / n END) AS tr,
        MAX(CASE WHEN arm = 0 AND post = 1 THEN CAST(total AS DOUBLE) / n END) AS cp,
        MAX(CASE WHEN arm = 0 AND post = 0 THEN CAST(total AS DOUBLE) / n END) AS cr,
        CAST(SUM(n) AS BIGINT) AS n_events
      FROM s)
SELECT n_events,
       FLOOR(tp / 100 * 1000000 + 0.5) / 1000000 AS treat_post_mean,
       FLOOR(tr / 100 * 1000000 + 0.5) / 1000000 AS treat_pre_mean,
       FLOOR(cp / 100 * 1000000 + 0.5) / 1000000 AS ctrl_post_mean,
       FLOOR(cr / 100 * 1000000 + 0.5) / 1000000 AS ctrl_pre_mean,
       FLOOR(((tp - tr) - (cp - cr)) / 100 * 1000000 + 0.5) / 1000000 AS did_estimate
FROM m
""",
    doc="difference-in-differences estimate over the events stream: arms "
    "by portable user hash, pre/post split at the CUPED cut, DiD = "
    "(treat_post - treat_pre) - (ctrl_post - ctrl_pre) — the 2x2 causal "
    "panel (Card & Krueger 1994 design) next to the platform's CUPED/"
    "SRM guardrails.  Determinism: the four cell sums are exact cent "
    "integers; every mean and the DiD derive in identical IEEE trees "
    "with explicit floor-rounding.  Scale: one (arm, post)-keyed "
    "partial-agg'd shuffle to a 4-row panel — the stream is scanned "
    "once.",
)
def e_did_estimate(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cells = ev.select(
        (portable_hash64(F.col("user_id").cast("string")) % 2).alias("arm"),
        F.when(F.col("ts") >= _DID_CUT, 1).otherwise(0).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = cells.groupBy("arm", "post").agg(
        F.count("*").alias("n"),
        # DECIMAL(38) so a corpus-scale cell sum cannot wrap a long
        # silently under non-ANSI Spark (DuckDB's SUM already rides
        # HUGEINT internally)
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
    )
    mean = F.col("total").cast("double") / F.col("n")
    m = s.agg(
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 1), mean)).alias("tp"),
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 0), mean)).alias("tr"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 1), mean)).alias("cp"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 0), mean)).alias("cr"),
        F.sum("n").alias("n_events"),
    )
    r6 = lambda c: F.floor(c / 100 * 1000000 + 0.5) / 1000000  # noqa: E731
    return m.select(
        "n_events",
        r6(F.col("tp")).alias("treat_post_mean"),
        r6(F.col("tr")).alias("treat_pre_mean"),
        r6(F.col("cp")).alias("ctrl_post_mean"),
        r6(F.col("cr")).alias("ctrl_pre_mean"),
        r6((F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))).alias(
            "did_estimate"
        ),
    )


# ------------------------------------------- mergeable histogram quantiles
_HQ_BINS = 256


@register(
    "x_histogram_quantiles",
    oracle=f"""
WITH span AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
b AS (
  SELECT o_orderstatus AS status,
         LEAST({_HQ_BINS - 1},
               CAST(FLOOR((o_totalprice - span.lo) / (span.hi - span.lo)
                          * {_HQ_BINS}) AS BIGINT)) AS bin
  FROM orders, span),
h AS (SELECT status, bin, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY status, bin),
n AS (SELECT status, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY status),
cum AS (
  SELECT h.status, h.bin, h.c, n.n,
         CAST(SUM(h.c) OVER (PARTITION BY h.status ORDER BY h.bin) AS BIGINT) AS cc
  FROM h JOIN n ON h.status = n.status),
qs AS (SELECT * FROM (VALUES (0.5), (0.95)) v(q)),
hit AS (
  SELECT status, q, bin,
         ROW_NUMBER() OVER (PARTITION BY status, q ORDER BY bin) AS rk
  FROM cum CROSS JOIN qs WHERE cc >= q * n),
est AS (
  SELECT h.status, h.q,
         span.lo + (h.bin + 0.5) * (span.hi - span.lo) / {_HQ_BINS} AS est
  FROM hit h, span WHERE h.rk = 1),
exact AS (
  SELECT o_orderstatus AS status,
         ROUND(quantile_cont(o_totalprice, 0.5), 2) AS x50,
         ROUND(quantile_cont(o_totalprice, 0.95), 2) AS x95
  FROM orders GROUP BY o_orderstatus)
SELECT e.status, e.q AS quantile,
       FLOOR(e.est * 100 + 0.5) / 100 AS histogram_estimate,
       CASE WHEN e.q = 0.5 THEN x.x50 ELSE x.x95 END AS exact_value,
       FLOOR(ABS(e.est - CASE WHEN e.q = 0.5 THEN x.x50 ELSE x.x95 END)
             * 100 + 0.5) / 100 AS abs_err
FROM est e JOIN exact x ON e.status = x.status
ORDER BY e.status, e.q
""",
    doc="mergeable equi-width histogram quantiles WITH an in-engine error "
    "audit: one min/max panel, one (status, bin) partial-agg'd count "
    "table (256 bins — commutative, mergeable across shards/days, the "
    "way percentiles survive 100 TB without a global sort), bin-midpoint "
    "estimates for p50/p95, and the exact `percentile` twin computed in "
    "the SAME query so the approximation error is part of the audited "
    "output (the d_lsh_recall_audit pattern applied to quantiles).  All "
    "windows partition by (status[, q]) over <= 256 bin rows.",
)
def x_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.histogram import (
        equi_width_histogram,
        histogram_quantiles,
        value_span,
    )

    o = load_table(spark, sf, "orders")
    base = o.select(F.col("o_orderstatus").alias("status"), "o_totalprice")
    span = value_span(base, "o_totalprice")
    h = equi_width_histogram(
        base, "o_totalprice", _HQ_BINS, group_cols=["status"], span=span
    )
    est = histogram_quantiles(
        spark, h, span, [0.5, 0.95], _HQ_BINS, group_cols=["status"]
    )
    exact = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("x50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("x95"),
    )
    xval = F.when(F.col("q") == 0.5, F.col("x50")).otherwise(F.col("x95"))
    return (
        est.join(exact, "status")
        .select(
            "status",
            F.col("q").alias("quantile"),
            (F.floor(F.col("est") * 100 + 0.5) / 100).alias("histogram_estimate"),
            xval.alias("exact_value"),
            (F.floor(F.abs(F.col("est") - xval) * 100 + 0.5) / 100).alias("abs_err"),
        )
        .orderBy("status", "quantile")
    )


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


# ------------------------------------------------- rolling N-day retention
_RET_DAYS = 7


@register(
    "e_rolling_retention",
    oracle=f"""
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
ret AS (
  SELECT DISTINCT a.user_id, a.day
  FROM days a JOIN days b
    ON a.user_id = b.user_id
   AND b.day > a.day
   AND b.day <= a.day + INTERVAL {_RET_DAYS} DAY)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(COUNT(r.user_id) AS BIGINT) AS retained_users,
       FLOOR(CAST(COUNT(r.user_id) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
         / 1000000 AS retention_rate
FROM days d LEFT JOIN ret r ON d.user_id = r.user_id AND d.day = r.day
GROUP BY d.day
ORDER BY day
""",
    doc="rolling N-day retention: for every calendar day, the fraction of "
    "that day's active users who return within the next 7 days — the "
    "product-metric companion to cohort retention (e_retention tracks "
    "fixed signup cohorts; this tracks a sliding window over ALL active "
    "users).  Semantics via a user-keyed day self-join with a bounded "
    "date-range predicate — never a per-user window over unbounded "
    "history.  Determinism: day grain is exact; counts are integers; "
    "one floor-rounded division per output row.  Scale: distinct "
    "(user, day) is one partial-agg'd shuffle; the range self-join is "
    "user-keyed equi-join with a 7-day bounded band; final rollup is "
    "day-keyed.",
)
def e_rolling_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    a, b = days.alias("a"), days.alias("b")
    ret = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.day") > F.col("a.day"))
            & (F.col("b.day") <= F.date_add(F.col("a.day"), _RET_DAYS)),
        )
        .select(F.col("a.user_id").alias("user_id"), F.col("a.day").alias("day"))
        .distinct()
        .withColumn("retained", F.lit(1))
    )
    return (
        days.join(ret, ["user_id", "day"], "left")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").alias("active_users"),
            F.count("retained").alias("retained_users"),
        )
        .select(
            "day",
            "active_users",
            "retained_users",
            (
                F.floor(
                    F.col("retained_users").cast("double")
                    / F.col("active_users")
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("retention_rate"),
        )
        .orderBy("day")
    )


# ------------------------------------------------- experiment power panel
_PW_CUT = "2024-01-16 00:00:00"  # the CUPED pre-period cut


@register(
    "e_power_analysis",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PW_CUT}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM u),
m AS (SELECT n,
             CAST(sx AS DOUBLE) / n AS mean_c,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS var_c
      FROM s)
SELECT n AS n_users,
       FLOOR(mean_c / 100 * 10000 + 0.5) / 10000 AS mean_dollars,
       FLOOR(var_c / 10000 * 10000 + 0.5) / 10000 AS var_dollars2,
       FLOOR(mean_c * 0.05 / 100 * 10000 + 0.5) / 10000 AS mde_dollars,
       CAST(CEIL(16.0 * var_c / ((mean_c * 0.05) * (mean_c * 0.05))) AS BIGINT)
         AS n_required_per_arm,
       (CAST(CEIL(16.0 * var_c / ((mean_c * 0.05) * (mean_c * 0.05))) AS BIGINT)
          <= n / 2) AS adequately_powered
FROM m
""",
    doc="experiment power analysis from the pre-period spend panel: "
    "per-user exact cent sums -> sample variance -> required n per arm "
    "for a 5% MDE via the 16*sigma^2/delta^2 rule (two-sided alpha .05, "
    "power .8 — van Belle's rule of thumb), plus whether the current "
    "user base could power the test.  Completes the experimentation "
    "family (e_srm_check guards allocation, e_cuped_adjust shrinks "
    "variance, e_did_estimate reads the effect — this sizes the test "
    "BEFORE it runs).  Determinism: the two moments are exact integers; "
    "the IEEE tail is identical both engines with explicit rounding.  "
    "Scale: one user-keyed partial-agg'd shuffle to a 1-row panel.",
)
def e_power_analysis(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = F.round(F.col("value") * 100).cast("long")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < _PW_CUT, v).otherwise(F.lit(0))).alias("x")
    )
    s = u.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        # cast BEFORE the multiply: a whale user's squared cent sum can
        # pass signed-64 on its own, and long*long wraps pre-cast
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    mean_c = F.col("sx").cast("double") / n
    var_c = (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    ) / (n - 1)
    m = s.select(n.alias("n"), mean_c.alias("mean_c"), var_c.alias("var_c"))
    req = F.ceil(16.0 * F.col("var_c") / ((F.col("mean_c") * 0.05) * (F.col("mean_c") * 0.05))).cast("long")
    return m.select(
        F.col("n").alias("n_users"),
        (F.floor(F.col("mean_c") / 100 * 10000 + 0.5) / 10000).alias("mean_dollars"),
        (F.floor(F.col("var_c") / 10000 * 10000 + 0.5) / 10000).alias("var_dollars2"),
        (F.floor(F.col("mean_c") * 0.05 / 100 * 10000 + 0.5) / 10000).alias(
            "mde_dollars"
        ),
        req.alias("n_required_per_arm"),
        (req <= F.col("n") / 2).alias("adequately_powered"),
    )


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
    d1, d2 = dec.alias("d1"), dec.alias("d2")
    cum = (
        d1.join(F.broadcast(d2), F.col("d2.decile") <= F.col("d1.decile"))
        .groupBy(
            F.col("d1.decile").alias("decile"),
            F.col("d1.customers").alias("customers"),
            F.col("d1.revenue_cents").alias("revenue_cents"),
        )
        .agg(F.sum(F.col("d2.revenue_cents")).alias("cum_cents"))
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


# ------------------------------------------------- Poisson bootstrap CI
# Poisson(1) inverse-CDF thresholds on the portable 60-bit hash scale:
# _POIS_T[k] = floor(CDF(k) * 2^60), so `h < _POIS_T[k]` <=> `draw <= k`
# for a hash uniform on [0, 2^60).  Identical integer literals on both
# engines make the per-record bootstrap weights exactly reproducible.
_POIS_T = [
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
]
_BOOT_B = 32  # bootstrap replicates


def _pois_case_sql(h_expr: str) -> str:
    arms = "\n".join(
        f"       WHEN {h_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE\n{arms}\n       ELSE 8 END"


@register(
    "e_bootstrap_ci",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders),
reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
drawn AS (
  SELECT o_orderpriority, b, y,
         {_pois_case_sql(portable_hash64_sql(
             "CAST(o_orderkey AS VARCHAR) || '|' || CAST(b AS VARCHAR)"))} AS w
  FROM base CROSS JOIN reps),
rep_means AS (
  SELECT o_orderpriority, b,
         CAST(SUM(CAST(w * y AS DECIMAL(38,0))) AS DOUBLE)
           / CAST(SUM(w) AS BIGINT) AS mean_b
  FROM drawn GROUP BY o_orderpriority, b),
boot AS (
  SELECT o_orderpriority,
         AVG(mean_b) AS boot_mean,
         STDDEV_SAMP(mean_b) AS boot_se
  FROM rep_means GROUP BY o_orderpriority),
point AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS est
  FROM base GROUP BY o_orderpriority)
SELECT p.o_orderpriority,
       p.n_orders,
       FLOOR(p.est / 100 * 10000 + 0.5) / 10000 AS est_mean_dollars,
       FLOOR(b.boot_se / 100 * 10000 + 0.5) / 10000 AS boot_se_dollars,
       FLOOR((p.est - 1.96 * b.boot_se) / 100 * 10000 + 0.5) / 10000 AS ci_lo_dollars,
       FLOOR((p.est + 1.96 * b.boot_se) / 100 * 10000 + 0.5) / 10000 AS ci_hi_dollars
FROM point p JOIN boot b ON p.o_orderpriority = b.o_orderpriority
ORDER BY p.o_orderpriority
""",
    doc="Poisson-bootstrap confidence interval for mean order value per "
    "priority — THE resampling shape that scales: instead of "
    "materializing B resampled copies of the corpus, every record draws "
    "B independent Poisson(1) weights from a deterministic 60-bit hash "
    "of (orderkey, replicate) and contributes w*y to each replicate's "
    "weighted mean (Chamandy et al., 'Estimating Uncertainty for "
    "Massive Data Streams', Google 2012).  Scale: the x32 posexplode is "
    "map-side and immediately partial-aggregated, so the shuffle "
    "carries exactly B rows per (priority, partition) — never the "
    "corpus; replicate means are exact DECIMAL cent-sums over exact "
    "integer weights, so partial-agg order cannot move them; the final "
    "normal-approximation CI derives from 32-value panels.  "
    "Determinism: weights come from integer threshold compares on the "
    "portable hash (Poisson inverse-CDF thresholds pre-scaled to the "
    "hash range as integer literals), identical in DuckDB.",
)
def e_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    base = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    drawn = base.select(
        "o_orderpriority",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        F.col("o_orderkey"),
    )
    h = portable_hash64(
        F.concat_ws(
            "|", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
        )
    )
    w = F.lit(8)
    for k in range(len(_POIS_T) - 1, -1, -1):
        w = F.when(h < F.lit(_POIS_T[k]), F.lit(k)).otherwise(w)
    rep_means = (
        drawn.withColumn("w", w)
        .groupBy("o_orderpriority", "b")
        .agg(
            F.sum((F.col("w") * F.col("y")).cast("decimal(38,0)")).alias("swy"),
            F.sum("w").alias("sw"),
        )
        .select(
            "o_orderpriority",
            "b",
            (F.col("swy").cast("double") / F.col("sw")).alias("mean_b"),
        )
    )
    boot = rep_means.groupBy("o_orderpriority").agg(
        F.avg("mean_b").alias("boot_mean"),
        F.stddev_samp("mean_b").alias("boot_se"),
    )
    point = base.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.col("y").cast("decimal(38,0)")).cast("double") / F.count("*")).alias(
            "est"
        ),
    )
    dollars = lambda c: F.floor(c / 100 * 10000 + 0.5) / 10000  # noqa: E731
    return (
        point.join(F.broadcast(boot), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            dollars(F.col("est")).alias("est_mean_dollars"),
            dollars(F.col("boot_se")).alias("boot_se_dollars"),
            dollars(F.col("est") - 1.96 * F.col("boot_se")).alias("ci_lo_dollars"),
            dollars(F.col("est") + 1.96 * F.col("boot_se")).alias("ci_hi_dollars"),
        )
        .orderBy("o_orderpriority")
    )


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


# ------------------------------------------------- KMV distinct sketch
_KMV_K = 64
_KMV_SALT = 64
_HASH_SPACE = 1 << 60


@register(
    "x_kmv_sketch",
    oracle=f"""
WITH dist AS (
  SELECT DISTINCT o_orderpriority,
         {portable_hash64_sql("CAST(o_custkey AS VARCHAR)")} AS h
  FROM orders),
exact AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM dist GROUP BY o_orderpriority),
ranked AS (
  SELECT o_orderpriority, h,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM dist),
kth AS (
  SELECT o_orderpriority, h AS kth_min
  FROM ranked WHERE rn = {_KMV_K})
SELECT e.o_orderpriority,
       e.exact_distinct,
       CASE WHEN k.kth_min IS NULL THEN e.exact_distinct
            ELSE CAST(FLOOR({_KMV_K - 1}.0 * {_HASH_SPACE}.0 / k.kth_min)
                      AS BIGINT) END AS kmv_estimate,
       FLOOR(ABS(CAST(CASE WHEN k.kth_min IS NULL THEN e.exact_distinct
                           ELSE CAST(FLOOR({_KMV_K - 1}.0 * {_HASH_SPACE}.0
                                           / k.kth_min) AS BIGINT) END
                      AS DOUBLE) - e.exact_distinct)
             / e.exact_distinct * 10000 + 0.5) / 100 AS rel_err_pct
FROM exact e LEFT JOIN kth k ON e.o_orderpriority = k.o_orderpriority
ORDER BY e.o_orderpriority
""",
    doc="KMV (k-minimum-values) distinct-count sketch per order "
    "priority, audited against the exact count in the same query — the "
    "mergeable bottom-k sketch behind Theta/HLL-style cardinality "
    "pipelines (Bar-Yossef et al. 2002; estimate (k-1) * H / h_(k) on "
    "a 60-bit hash space).  Scale: the distinct (priority, hash) frame "
    "is a partial-aggregated dedup shuffle; the k smallest hashes per "
    "group are found with the salted two-phase top-k — a row_number "
    "window per (priority, hash mod 64) salt slice (each sees 1/64th "
    "of the group), then a second window over the <= 64*64-row "
    "candidate set — never one task per whole group.  The sketch is "
    "trivially mergeable (union of bottom-k sets -> bottom-k), which "
    "is what makes it the right cross-shard distinct estimator at "
    "100 TB.  Determinism: integer hashes, integer rank ties "
    "impossible (hashes are distinct by construction), and the "
    "estimate derives from exact integers through an IEEE-identical "
    "double tree.  Groups with fewer than k distinct values fall back "
    "to the exact count (the sketch holds them all), matching the "
    "textbook estimator.",
)
def x_kmv_sketch(spark: SparkSession, sf: str) -> DataFrame:
    dist = (
        load_table(spark, sf, "orders")
        .select(
            "o_orderpriority",
            portable_hash64(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        .localCheckpoint()
    )
    exact = dist.groupBy("o_orderpriority").agg(
        F.count("*").alias("exact_distinct")
    )
    w_salt = Window.partitionBy(
        "o_orderpriority", F.pmod(F.col("h"), F.lit(_KMV_SALT))
    ).orderBy("h")
    candidates = (
        dist.withColumn("rn1", F.row_number().over(w_salt))
        .where(F.col("rn1") <= _KMV_K)
        .drop("rn1")
    )
    w_group = Window.partitionBy("o_orderpriority").orderBy("h")
    kth = (
        candidates.withColumn("rn", F.row_number().over(w_group))
        .where(F.col("rn") == _KMV_K)
        .select("o_orderpriority", F.col("h").alias("kth_min"))
    )
    est = F.when(
        F.col("kth_min").isNull(), F.col("exact_distinct")
    ).otherwise(
        F.floor(
            F.lit(float(_KMV_K - 1)) * F.lit(float(_HASH_SPACE)) / F.col("kth_min")
        ).cast("long")
    )
    return (
        exact.join(F.broadcast(kth), "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "exact_distinct",
            est.alias("kmv_estimate"),
            (
                F.floor(
                    F.abs(est.cast("double") - F.col("exact_distinct"))
                    / F.col("exact_distinct")
                    * 10000
                    + 0.5
                )
                / 100
            ).alias("rel_err_pct"),
        )
        .orderBy("o_orderpriority")
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


# -------------------------------------------- KMV sketch set algebra
@register(
    "x_kmv_setops",
    oracle=f"""
WITH pop AS (
  SELECT DISTINCT
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995 THEN 'a' ELSE 'b' END AS label,
         {portable_hash64_sql("CAST(o_custkey AS VARCHAR)")} AS h
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)),
exact AS (
  SELECT CAST(COUNT(*) FILTER (WHERE in_a = 1) AS BIGINT) AS exact_a,
         CAST(COUNT(*) FILTER (WHERE in_b = 1) AS BIGINT) AS exact_b,
         CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(COUNT(*) FILTER (WHERE in_a = 1 AND in_b = 1) AS BIGINT)
           AS exact_intersect
  FROM (SELECT h,
               MAX(CASE WHEN label = 'a' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN label = 'b' THEN 1 ELSE 0 END) AS in_b
        FROM pop GROUP BY h) flags),
sketch AS (
  SELECT label, h,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY h) AS rn
  FROM pop QUALIFY rn <= {_KMV_K}),
per_label AS (
  SELECT s.label,
         CAST(COUNT(*) AS BIGINT) AS sz,
         MAX(CASE WHEN s.rn = {_KMV_K} THEN s.h END) AS kth
  FROM sketch s GROUP BY s.label),
ests AS (
  SELECT
    MAX(CASE WHEN label = 'a' THEN est END) AS est_a,
    MAX(CASE WHEN label = 'b' THEN est END) AS est_b
  FROM (SELECT label,
               CASE WHEN kth IS NULL THEN sz
                    ELSE CAST(FLOOR({_KMV_K - 1}.0 * {_HASH_SPACE}.0 / kth)
                              AS BIGINT) END AS est
        FROM per_label) e),
merged AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnm
  FROM (SELECT DISTINCT h FROM sketch) mh),
mpanel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_cnt,
         MAX(CASE WHEN rnm = {_KMV_K} THEN h END) AS kth_u
  FROM merged),
upanel AS (
  SELECT CASE WHEN kth_u IS NULL THEN m_cnt
              ELSE CAST(FLOOR({_KMV_K - 1}.0 * {_HASH_SPACE}.0 / kth_u)
                        AS BIGINT) END AS est_union,
         LEAST({_KMV_K}, m_cnt) AS denom
  FROM mpanel),
jpanel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS j_num
  FROM merged m
  WHERE m.rnm <= {_KMV_K}
    AND EXISTS (SELECT 1 FROM sketch sa WHERE sa.label = 'a' AND sa.h = m.h)
    AND EXISTS (SELECT 1 FROM sketch sb WHERE sb.label = 'b' AND sb.h = m.h))
SELECT x.exact_a, x.exact_b, x.exact_union, x.exact_intersect,
       e.est_a, e.est_b, u.est_union,
       CAST(FLOOR(CAST(j.j_num AS DOUBLE) / u.denom * u.est_union) AS BIGINT)
         AS est_intersect,
       FLOOR(CAST(x.exact_intersect AS DOUBLE) / x.exact_union * 1000000 + 0.5)
         / 1000000 AS jaccard_exact,
       FLOOR(CAST(j.j_num AS DOUBLE) / u.denom * 1000000 + 0.5)
         / 1000000 AS jaccard_est
FROM exact x CROSS JOIN ests e CROSS JOIN upanel u CROSS JOIN jpanel j
""",
    doc="KMV sketch SET ALGEBRA over the 1995 vs 1996 customer sets, "
    "audited against exact counts in the same query: per-set bottom-k "
    "sketches merge into the union sketch (union of bottom-k sets -> "
    "bottom-k — the mergeability that makes KMV the cross-shard "
    "distinct estimator), the union cardinality comes from the merged "
    "kth minimum, the Jaccard similarity from the fraction of the "
    "merged bottom-k present in BOTH sketches, and the intersection "
    "via |A∩B| = J * |A∪B| (Beyer et al., SIGMOD 2007).  Scale: the "
    "exact branch is the audit; the sketch path reduces each set to "
    "<= k=64 rows via the salted two-phase bottom-k (the x_kmv_sketch "
    "shape), after which every join/window touches <= 2k rows.  Sets "
    "smaller than k fall back to their exact sketch size, per the "
    "textbook estimator.  Determinism: integer hashes and counts; the "
    "estimates derive through IEEE-identical double trees.",
)
def x_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    pop = (
        o.where(F.year("o_orderdate").isin(1995, 1996))
        .select(
            F.when(F.year("o_orderdate") == 1995, "a").otherwise("b").alias("label"),
            portable_hash64(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        .localCheckpoint()
    )
    flags = pop.groupBy("h").agg(
        F.max(F.when(F.col("label") == "a", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("label") == "b", 1).otherwise(0)).alias("in_b"),
    )
    exact = flags.agg(
        F.sum("in_a").alias("exact_a"),
        F.sum("in_b").alias("exact_b"),
        F.count("*").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("exact_intersect"),
    )
    w_salt = Window.partitionBy(
        "label", F.pmod(F.col("h"), F.lit(_KMV_SALT))
    ).orderBy("h")
    candidates = (
        pop.withColumn("rn1", F.row_number().over(w_salt))
        .where(F.col("rn1") <= _KMV_K)
        .drop("rn1")
    )
    w_label = Window.partitionBy("label").orderBy("h")
    sketch = (
        candidates.withColumn("rn", F.row_number().over(w_label))
        .where(F.col("rn") <= _KMV_K)
        .localCheckpoint()
    )
    kmv_est = lambda kth, sz: F.when(kth.isNull(), sz).otherwise(  # noqa: E731
        F.floor(
            F.lit(float(_KMV_K - 1)) * F.lit(float(_HASH_SPACE)) / kth
        ).cast("long")
    )
    per_label = sketch.groupBy("label").agg(
        F.count("*").alias("sz"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
    )
    ests = per_label.select(
        "label", kmv_est(F.col("kth"), F.col("sz")).alias("est")
    ).agg(
        F.max(F.when(F.col("label") == "a", F.col("est"))).alias("est_a"),
        F.max(F.when(F.col("label") == "b", F.col("est"))).alias("est_b"),
    )
    w_merged = Window.orderBy("h")  # <= 2k rows by construction
    merged = (
        sketch.select("h")
        .distinct()
        .withColumn("rnm", F.row_number().over(w_merged))
        .localCheckpoint()
    )
    mpanel = merged.agg(
        F.count("*").alias("m_cnt"),
        F.max(F.when(F.col("rnm") == _KMV_K, F.col("h"))).alias("kth_u"),
    )
    upanel = mpanel.select(
        kmv_est(F.col("kth_u"), F.col("m_cnt")).alias("est_union"),
        F.least(F.lit(_KMV_K), F.col("m_cnt")).alias("denom"),
    )
    sk_a = sketch.where(F.col("label") == "a").select("h")
    sk_b = sketch.where(F.col("label") == "b").select("h")
    jpanel = (
        merged.where(F.col("rnm") <= _KMV_K)
        .join(sk_a, "h", "left_semi")
        .join(sk_b, "h", "left_semi")
        .agg(F.count("*").alias("j_num"))
    )
    return (
        exact.crossJoin(F.broadcast(ests))
        .crossJoin(F.broadcast(upanel))
        .crossJoin(F.broadcast(jpanel))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersect",
            "est_a",
            "est_b",
            "est_union",
            F.floor(
                F.col("j_num").cast("double") / F.col("denom") * F.col("est_union")
            )
            .cast("long")
            .alias("est_intersect"),
            (
                F.floor(
                    F.col("exact_intersect").cast("double")
                    / F.col("exact_union")
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("jaccard_exact"),
            (
                F.floor(
                    F.col("j_num").cast("double") / F.col("denom") * 1000000 + 0.5
                )
                / 1000000
            ).alias("jaccard_est"),
        )
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


# ------------------------------------------------ label propagation (LPA)
_LPA_ROUNDS = 3


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous min-label round as a chained CTE."""
    return (
        f"{cur} AS (SELECT a.src AS node, MIN(p.lbl) AS lbl "
        f"FROM adjp a JOIN {prev} p ON a.dst = p.node GROUP BY a.src)"
    )


@register(
    "x_label_propagation",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM adj),
adjp AS MATERIALIZED (SELECT src, dst FROM adj
         UNION ALL SELECT node, node FROM nodes),
l0 AS (SELECT node, node AS lbl FROM nodes),
{_lpa_round_sql('l0', 'l1')},
{_lpa_round_sql('l1', 'l2')},
{_lpa_round_sql('l2', 'l3')},
clusters AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz,
                    CAST(SUM(node) AS BIGINT) AS cks
             FROM l3 GROUP BY lbl)
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cks) AS BIGINT) AS node_checksum
FROM clusters GROUP BY sz ORDER BY cluster_size
""",
    doc="synchronous min-label propagation (3 rounds) over the support-2 "
    "co-purchase graph — the bounded-round community sketch that "
    "approaches connected components as rounds grow (labels reach "
    "distance-3 minima; operators/graph.py's star-contraction CC is the "
    "exact-fixpoint sibling).  Deterministic: min-label update has no "
    "tie-break ambiguity, so Spark and the chained-CTE oracle agree "
    "exactly.  Scale: each round is ONE node-keyed partial-agg'd "
    "shuffle (join labels to the self-looped adjacency, groupBy dst "
    "min), localCheckpoint per round keeps lineage O(1); rounds bound "
    "wall-clock, and the output is the cluster-size histogram, never "
    "per-node rows.",
)
def x_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf)
    labels = label_propagation(edges, rounds=_LPA_ROUNDS)
    clusters = labels.groupBy("lbl").agg(
        F.count("*").alias("sz"), F.sum("node").alias("cks")
    )
    return (
        clusters.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cks").alias("node_checksum"),
        )
        .orderBy("cluster_size")
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


# ------------------------------------------------ daily-revenue ACF
_ACF_MAX_LAG = 7


@register(
    "e_acf_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY d),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM daily),
lags AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) l(k)),
pairs AS (
  SELECT l.k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(a.x AS HUGEINT) * b.x) AS p,
         CAST(SUM(a.x) AS BIGINT) AS sa,
         CAST(SUM(b.x) AS BIGINT) AS sb
  FROM daily a JOIN lags l ON TRUE
  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
  GROUP BY l.k)
SELECT k AS lag, n_pairs,
       FLOOR(
         (CAST(p AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
          + n_pairs * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
         / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * CAST(s AS DOUBLE))
         * 1000000 + 0.5) / 1000000 AS acf
FROM pairs CROSS JOIN base
ORDER BY lag
""",
    doc="autocorrelation of the daily-revenue series at lags 1..7 — the "
    "seasonality screen behind the resample/forecast family.  The "
    "deviation products expand to EXACT widened-integer moments "
    "(Σxₜxₜ₊ₖ, pairwise-overlap sums, global Σx/Σx²) so no float "
    "crosses rows; the estimator is one mirrored scalar expression "
    "(full-series mean and variance, numerator over overlapping "
    "pairs).  Scale: one day-keyed rollup, a 7-way bounded lag "
    "explode joined day-to-day (calendar-sized, not row-sized), two "
    "1-row reduces.",
)
def e_acf_daily(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("x"))
        .localCheckpoint()  # feeds base + both join sides; pin one eval
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    pairs = (
        a.join(b, F.col("bd") == F.date_add(F.col("a.d"), F.col("k")))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(dec(F.col("a.x")) * F.col("bx")).alias("p"),
            F.sum("a.x").alias("sa"),
            F.sum("bx").alias("sb"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("s") / F.col("n")
    acf = (
        (d("p") - mean * (d("sa") + d("sb")) + F.col("n_pairs") * (mean * mean))
        / (d("q") - mean * d("s"))
    )
    return (
        pairs.crossJoin(F.broadcast(base))
        .select(
            F.col("k").alias("lag"),
            "n_pairs",
            (F.floor(acf * 1000000 + 0.5) / 1000000).alias("acf"),
        )
        .orderBy("lag")
    )


# ------------------------------------------- day-of-week seasonality
@register(
    "e_dow_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY d),
dw AS (
  SELECT (CAST(d AS DATE) - DATE '1970-01-05') % 7 AS dow, x FROM daily),
grp AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM dw GROUP BY dow),
tot AS (
  SELECT CAST(SUM(n_days) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS st,
         SUM(q) AS qt,
         SUM(CAST(s AS DOUBLE) * s / n_days) AS fit_ss
  FROM grp)
SELECT dow,
       n_days,
       FLOOR(CAST(s AS DOUBLE) / n_days / 100 * 100 + 0.5) / 100 AS mean_dollars,
       FLOOR((fit_ss - CAST(st AS DOUBLE) * st / n)
             / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
             * 1000000 + 0.5) / 1000000 AS r2_dow
FROM grp CROSS JOIN tot
ORDER BY dow
""",
    doc="day-of-week seasonality of daily revenue: per-dow mean plus the "
    "variance explained by the dow factor (R² of the one-way ANOVA fit, "
    "computed from exact integer group moments — between-group sum of "
    "squares over total, both expanded so no float crosses rows except "
    "the 7-term fit_ss fold).  Day-of-week is epoch-day arithmetic "
    "((d − 1970-01-05) % 7, 0=Monday), NEVER the engines' dayofweek "
    "builtins, whose numbering conventions differ.  Scale: one day "
    "rollup + one 7-group reduce.",
)
def e_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("x")
    )
    dw = daily.select(
        (F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")) % 7).alias("dow"),
        "x",
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grp = dw.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tot = grp.agg(
        F.sum("n_days").alias("n"),
        F.sum("s").alias("st"),
        F.sum("q").alias("qt"),
        F.sum(d("s") * F.col("s") / F.col("n_days")).alias("fit_ss"),
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            (F.floor(d("s") / F.col("n_days") / 100 * 100 + 0.5) / 100).alias(
                "mean_dollars"
            ),
            (
                F.floor(
                    (F.col("fit_ss") - d("st") * F.col("st") / F.col("n"))
                    / (d("qt") - d("st") * F.col("st") / F.col("n"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("r2_dow"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------- k-core peel
_KCORE_K = 3
_KCORE_ROUNDS = 5


def _kcore_round_sql(prev: str, cur: str) -> str:
    # AS MATERIALIZED: each round references the previous one TWICE, so
    # default CTE inlining is EXPONENTIAL in rounds (2^R copies of the
    # expensive pair self-join — observed as a DuckDB disk-spill blowup
    # at sf0.1); materialization makes the chain linear
    return (
        f"{cur} AS MATERIALIZED (SELECT a.src AS node FROM adj a "
        f"JOIN {prev} p1 ON a.src = p1.node "
        f"JOIN {prev} p2 ON a.dst = p2.node "
        f"GROUP BY a.src HAVING COUNT(*) >= {_KCORE_K})"
    )


@register(
    "x_kcore",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM adj),
{_kcore_round_sql('a0', 'a1')},
{_kcore_round_sql('a1', 'a2')},
{_kcore_round_sql('a2', 'a3')},
{_kcore_round_sql('a3', 'a4')},
{_kcore_round_sql('a4', 'a5')}
SELECT CAST((SELECT COUNT(*) FROM a5) AS BIGINT) AS n_core,
       CAST((SELECT COALESCE(SUM(node), 0) FROM a5) AS BIGINT) AS node_checksum,
       (SELECT COUNT(*) FROM a5) = (SELECT COUNT(*) FROM a4) AS converged
""",
    doc=f"{_KCORE_K}-core of the co-purchase graph by {_KCORE_ROUNDS}-round "
    "degree peeling: each round keeps nodes with ≥ k surviving "
    "neighbors.  BOTH engines run the identical FIXED round count (the "
    "chained-CTE oracle replays each peel exactly), and the output's "
    "`converged` flag certifies whether the last round was a fixpoint — "
    "honest bounded-round semantics rather than an unverifiable "
    "iterate-to-convergence claim.  Scale: each round is one "
    "node-keyed partial-agg'd shuffle over the alive-restricted edge "
    "list, localCheckpoint per round; round count bounds wall-clock "
    "exactly like the LPA sketch.",
)
def x_kcore(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint()
    )
    alive = adj.select(F.col("src").alias("node")).distinct().localCheckpoint()
    prev_n = None
    for _ in range(_KCORE_ROUNDS):
        prev = alive
        alive = (
            adj.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        prev_n = prev
    core = alive.agg(
        F.count("*").alias("n_core"),
        F.coalesce(F.sum("node"), F.lit(0)).alias("node_checksum"),
    )
    prev_count = prev_n.agg(F.count("*").alias("n_prev"))
    return core.crossJoin(F.broadcast(prev_count)).select(
        "n_core",
        "node_checksum",
        (F.col("n_core") == F.col("n_prev")).alias("converged"),
    )


# ------------------------------------------- degree assortativity
@register(
    "x_degree_assortativity",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
       FROM adj GROUP BY src),
ed AS (SELECT da.d AS dx, db.d AS dy
       FROM adj a JOIN deg da ON a.src = da.node
                  JOIN deg db ON a.dst = db.node),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
             SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
             SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
             SUM(CAST(dy AS HUGEINT) * dy) AS syy
      FROM ed)
SELECT n AS n_directed_edges,
       FLOOR((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
             * 1000000 + 0.5) / 1000000 AS assortativity
FROM m
""",
    doc="degree assortativity of the co-purchase graph: the Pearson "
    "correlation of endpoint degrees over the DIRECTED edge list "
    "(Newman 2002) — positive means hubs attach to hubs, the "
    "structural question behind skew-aware partitioning of a graph "
    "workload.  Five exact widened-integer moments in one reduce over "
    "the degree-joined edges; the statistic is a single mirrored float "
    "expression rounded at 1e-6.  Scale: one degree count + two "
    "node-keyed broadcast-able joins + a 1-row reduce; the symmetric "
    "edge list makes sx == sy, so r is symmetric by construction.",
)
def x_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint()
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    dx = deg.select(F.col("node").alias("src"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("dst"), F.col("d").alias("dy"))
    ed = adj.join(F.broadcast(dx), "src").join(F.broadcast(dy), "dst")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ed.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(dec(F.col("dx")) * F.col("dy")).alias("sxy"),
        F.sum(dec(F.col("dx")) * F.col("dx")).alias("sxx"),
        F.sum(dec(F.col("dy")) * F.col("dy")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * F.col("sy") / F.col("n")) / F.sqrt(
        (d("sxx") - d("sx") * F.col("sx") / F.col("n"))
        * (d("syy") - d("sy") * F.col("sy") / F.col("n"))
    )
    return m.select(
        F.col("n").alias("n_directed_edges"),
        (F.floor(r * 1000000 + 0.5) / 1000000).alias("assortativity"),
    )


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


# -------------------------------------------- Adamic-Adar link prediction
_AA_DEG_CAP = 64
_AA_TOPK = 20


@register(
    "x_adamic_adar",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
       FROM adj GROUP BY src),
ctr AS (SELECT node, CAST(FLOOR(1000000.0 / LN(d) + 0.5) AS BIGINT) AS w_micro
        FROM deg WHERE d BETWEEN 2 AND {_AA_DEG_CAP}),
wedge AS (SELECT n1.dst AS a, n2.dst AS b, c.w_micro
          FROM adj n1 JOIN adj n2 ON n1.src = n2.src AND n1.dst < n2.dst
          JOIN ctr c ON n1.src = c.node),
cand AS (SELECT a, b, CAST(SUM(w_micro) AS BIGINT) AS score_micro,
                CAST(COUNT(*) AS BIGINT) AS n_common
         FROM wedge GROUP BY a, b),
new_pairs AS (SELECT cand.* FROM cand
              ANTI JOIN edges e ON cand.a = e.u AND cand.b = e.v)
SELECT a AS u, b AS v, n_common,
       ROUND(score_micro / 1000000.0, 6) AS aa_score
FROM new_pairs
ORDER BY score_micro DESC, a, b
LIMIT {_AA_TOPK}
""",
    doc="Adamic-Adar link prediction on the co-purchase graph: for each "
    "non-adjacent pair, sum 1/ln(deg) over common neighbors and emit "
    "the top candidates — the classic 'parts bought together but never "
    "in one order yet' recommender primitive.  Determinism: each "
    "center's weight is floor-quantized to integer micro-units BEFORE "
    "the wedge sum, so aggregation order cannot move the score; the "
    "ranking breaks ties on (u, v).  Scale: wedge fan-out is bounded "
    f"by capping center degree at {_AA_DEG_CAP} (hub-mediated wedges "
    "carry the smallest weights and all-pairs-through-a-hub is the "
    "quadratic blowup — the cap is the documented production guard); "
    "candidates reduce keyed by (a, b) with map-side partials, "
    "existing edges leave via left_anti, and the final top-k is a "
    "distributed TakeOrdered, never a global single-partition sort.",
)
def x_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf).localCheckpoint()
    adj = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    ctr = deg.where((F.col("d") >= 2) & (F.col("d") <= _AA_DEG_CAP)).select(
        "node",
        F.floor(F.lit(1000000.0) / F.log(F.col("d")) + 0.5)
        .cast("long")
        .alias("w_micro"),
    )
    n1 = adj.select(F.col("src").alias("ctr_node"), F.col("dst").alias("a"))
    n2 = adj.select(F.col("src").alias("ctr_node"), F.col("dst").alias("b"))
    wedge = (
        n1.join(n2, "ctr_node")
        .where(F.col("a") < F.col("b"))
        .join(F.broadcast(ctr), F.col("ctr_node") == F.col("node"))
        .select("a", "b", "w_micro")
    )
    cand = wedge.groupBy("a", "b").agg(
        F.sum("w_micro").alias("score_micro"), F.count("*").alias("n_common")
    )
    new_pairs = cand.join(
        edges,
        (cand.a == edges.u) & (cand.b == edges.v),
        "left_anti",
    )
    return (
        new_pairs.orderBy(F.col("score_micro").desc(), "a", "b")
        .limit(_AA_TOPK)
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            "n_common",
            F.round(F.col("score_micro") / 1000000.0, 6).alias("aa_score"),
        )
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


# ------------------------------------------------- HITS hubs/authorities
_HITS_ROUNDS = 4
_HITS_TOPK = 10


def _hits_round_sql(i: int) -> str:
    """One unrolled HITS round: authority pull, max-renorm, hub pull,
    max-renorm — all in HUGEINT with floor division, the exact integer
    recurrence of operators/graph.hits."""
    return f""",
a{i}raw AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(h.s) AS HUGEINT) AS raw
  FROM edges e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1),
a{i}mx AS (SELECT MAX(raw) AS m FROM a{i}raw),
a{i} AS MATERIALIZED (
  SELECT node, (raw * 1000000) // m AS s FROM a{i}raw CROSS JOIN a{i}mx),
h{i}raw AS MATERIALIZED (
  SELECT e.src AS node, CAST(SUM(a.s) AS HUGEINT) AS raw
  FROM edges e JOIN a{i} a ON e.dst = a.node GROUP BY 1),
h{i}mx AS (SELECT MAX(raw) AS m FROM h{i}raw),
h{i} AS MATERIALIZED (
  SELECT node, (raw * 1000000) // m AS s FROM h{i}raw CROSS JOIN h{i}mx)"""


@register(
    "x_hits_suppliers",
    oracle=f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS HUGEINT) AS s FROM edges)
{"".join(_hits_round_sql(i) for i in range(1, _HITS_ROUNDS + 1))}
SELECT role, CAST(node AS BIGINT) AS node, CAST(score_micro AS BIGINT) AS score_micro
FROM (
  SELECT 'authority' AS role, node, s AS score_micro
  FROM a{_HITS_ROUNDS} ORDER BY s DESC, node LIMIT {_HITS_TOPK})
UNION ALL
SELECT role, CAST(node AS BIGINT), CAST(score_micro AS BIGINT)
FROM (
  SELECT 'hub' AS role, node, s AS score_micro
  FROM h{_HITS_ROUNDS} ORDER BY s DESC, node LIMIT {_HITS_TOPK})
ORDER BY role, score_micro DESC, node
""",
    doc="HITS hubs and authorities (Kleinberg 1999) over the distinct "
    "customer->supplier order graph: authority = suppliers the heavy "
    "buyers concentrate on, hub = customers whose purchases point at "
    "authoritative suppliers (operators/graph.hits).  Unlike the "
    "rows-only pagerank, this iterative query is FULLY oracle-checked: "
    "scores iterate in exact integer micro-units (decimal(38,0) sums, "
    "max-renormalization by exact integer floor division) so the "
    f"{_HITS_ROUNDS}-round recurrence replays bit-identically as "
    "unrolled HUGEINT SQL.  Scale: per half-round one score-onto-edges "
    "join + one partial-agg'd groupBy (the pagerank shuffle shape), a "
    "1-row broadcast max panel, per-round localCheckpoint lineage "
    "truncation; both top-k cuts are distributed TakeOrdered.",
)
def x_hits_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import hits

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    hubs, auths = hits(edges, iterations=_HITS_ROUNDS)
    top_a = (
        auths.orderBy(F.col("score_micro").desc(), "node")
        .limit(_HITS_TOPK)
        .select(F.lit("authority").alias("role"), "node", "score_micro")
    )
    top_h = (
        hubs.orderBy(F.col("score_micro").desc(), "node")
        .limit(_HITS_TOPK)
        .select(F.lit("hub").alias("role"), "node", "score_micro")
    )
    return (
        top_a.unionAll(top_h)
        .select(
            "role",
            F.col("node").cast("long").alias("node"),
            F.col("score_micro").cast("long").alias("score_micro"),
        )
        .orderBy("role", F.col("score_micro").desc(), "node")
    )


# ------------------------------------------- personalized PageRank (RWR)
_PPR_ROUNDS = 3
_PPR_TOPK = 10


def _ppr_round_sql(i: int) -> str:
    """One unrolled restart-walk round: per-edge floor-division push,
    inflow groupBy, full-outer with the seed restart panel — the exact
    integer recurrence of operators/graph.personalized_pagerank."""
    return f""",
in{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM((p.p * 85) // (100 * e.d)) AS HUGEINT) AS infl
  FROM edges e JOIN p{i - 1} p ON e.src = p.node GROUP BY 1),
p{i} AS MATERIALIZED (
  SELECT COALESCE(i.node, s.node) AS node,
         CAST(COALESCE(i.infl, 0)
              + CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END AS HUGEINT) AS p
  FROM in{i} i FULL OUTER JOIN seeds s ON i.node = s.node)"""


@register(
    "x_ppr_segment",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
edges0 AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM base
  UNION ALL SELECT s AS src, c AS dst FROM base),
edges AS MATERIALIZED (
  SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS d FROM edges0),
seeds AS MATERIALIZED (
  SELECT c_custkey AS node FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
p0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS p FROM seeds)
{"".join(_ppr_round_sql(i) for i in range(1, _PPR_ROUNDS + 1))}
SELECT CAST(node - 1000000 AS BIGINT) AS suppkey, CAST(p AS BIGINT) AS score_micro
FROM p{_PPR_ROUNDS} WHERE node > 1000000
ORDER BY p DESC, node LIMIT {_PPR_TOPK}
""",
    doc="Personalized PageRank / random walk with restart (Haveliwala, "
    "WWW 2002) from the AUTOMOBILE customer segment over the "
    "symmetrized customer<->supplier order graph: which suppliers sit "
    "closest to that segment's purchase neighborhood?  Like "
    "x_hits_suppliers — and unlike the rows-only float pagerank — the "
    "walk runs in exact integer micro-units (per-edge floor-division "
    "push, seed restart re-injection, dangling absorption), so the "
    f"{_PPR_ROUNDS}-round recurrence replays bit-identically as "
    "unrolled HUGEINT SQL.  Scale: the score table stays SPARSE (only "
    "the <=k-hop seed frontier holds rows); each round is one "
    "score-onto-edges join + one partial-agg'd inflow groupBy + a "
    "node-keyed full-outer with the seed panel, localCheckpoint-ed; "
    "the top-k cut is distributed TakeOrdered.  "
    "(operators/graph.personalized_pagerank)",
)
def x_ppr_segment(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import personalized_pagerank

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1_000_000).alias("s"),
        )
        .distinct()
    )
    edges = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        load_table(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("node"))
    )
    scores = personalized_pagerank(edges, seeds, iterations=_PPR_ROUNDS)
    return (
        scores.where(F.col("node") > 1_000_000)
        .orderBy(F.col("score_micro").desc(), "node")
        .limit(_PPR_TOPK)
        .select(
            (F.col("node") - 1_000_000).cast("long").alias("suppkey"),
            F.col("score_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "suppkey")
    )


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


# -------------------------------------------- local clustering coefficient
_CLUST_TOPK = 10


@register(
    "x_clustering_topk",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
edges AS MATERIALIZED (
  SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) __n
  GROUP BY node),
oriented AS MATERIALIZED (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
okey AS (SELECT o.src, o.dst, d.deg AS dst_deg
         FROM oriented o JOIN deg d ON o.dst = d.node),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM okey e1 JOIN okey e2 ON e1.src = e2.src
  WHERE e1.dst_deg < e2.dst_deg OR (e1.dst_deg = e2.dst_deg AND e1.dst < e2.dst)),
tri AS MATERIALIZED (
  SELECT w.a, w.b, w.c FROM wedges w
  JOIN oriented o ON w.b = o.src AND w.c = o.dst),
pernode AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_n
  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node)
SELECT CAST(node AS BIGINT) AS node, tri_n, deg,
       CAST(2 * tri_n * 1000000 // (deg * (deg - 1)) AS BIGINT) AS clustering_micro
FROM (
  SELECT d.node, COALESCE(p.tri_n, 0) AS tri_n, d.deg
  FROM deg d LEFT JOIN pernode p ON d.node = p.node
  WHERE d.deg >= 2)
ORDER BY clustering_micro DESC, tri_n DESC, node
LIMIT {_CLUST_TOPK}
""",
    doc="per-node local clustering coefficient (Watts & Strogatz 1998) "
    "over the part-co-purchase graph: 2*triangles(v) / (deg(v)*(deg(v)-1)) "
    "in exact integer micro-units, top-k most-clustered parts — the "
    "node-level sequel to x_triangle_count's global census.  Each "
    "triangle from the degree-oriented wedge closure credits all three "
    "vertices (one explode, one node-keyed partial-agg'd count), so "
    "hub fan-out stays O(sqrt(m)) exactly as in the global count.  "
    "Top-k is a distributed TakeOrdered on the integer coefficient "
    "with (tri, node) tie-breaks.",
)
def x_clustering_topk(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint()
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint()
    )
    okey = oriented.join(
        deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dst_deg"), "dst"
    )
    e1 = okey.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dst_deg").alias("bd")
    )
    e2 = okey.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("dst_deg").alias("cd")
    )
    wedges = (
        e1.join(e2, "a")
        .where(
            (F.col("bd") < F.col("cd"))
            | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
        )
        .select("a", "b", "c")
    )
    closing = oriented.withColumnRenamed("src", "b").withColumnRenamed("dst", "c")
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    pernode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_n"))
    )
    num = (
        2
        * F.coalesce("tri_n", F.lit(0)).cast("decimal(38,0)")
        * F.lit(1_000_000).cast("decimal(38,0)")
    )
    den = (F.col("deg") * (F.col("deg") - 1)).cast("decimal(38,0)")
    return (
        deg.join(pernode, "node", "left")
        .where(F.col("deg") >= 2)
        .select(
            F.col("node").cast("long").alias("node"),
            F.coalesce("tri_n", F.lit(0)).cast("long").alias("tri_n"),
            F.col("deg").cast("long").alias("deg"),
            ((num - num % den) / den).cast("long").alias("clustering_micro"),
        )
        .orderBy(F.col("clustering_micro").desc(), F.col("tri_n").desc(), "node")
        .limit(_CLUST_TOPK)
    )


# ----------------------------------------------- degree power-law (CCDF)
@register(
    "x_degree_powerlaw",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) __n
        GROUP BY node),
cells AS MATERIALIZED (
  SELECT deg AS k, CAST(COUNT(*) AS BIGINT) AS c FROM deg GROUP BY 1),
panel AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
ccdf AS (
  SELECT k, p.n - (SUM(c) OVER (ORDER BY k) - c) AS surv
  FROM cells CROSS JOIN panel p),
xy AS (SELECT ln(CAST(k AS DOUBLE)) AS x, ln(CAST(surv AS DOUBLE)) AS y FROM ccdf),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM xy)
SELECT (SELECT n FROM panel) AS n_nodes,
       m.n AS n_degrees,
       FLOOR((1 - (m.n * sxy - sx * sy) / (m.n * sxx - sx * sx)) * 10000 + 0.5)
         / 10000 AS powerlaw_alpha,
       FLOOR((m.n * sxy - sx * sy) * (m.n * sxy - sx * sy)
             / ((m.n * sxx - sx * sx) * (m.n * syy - sy * sy)) * 1000000 + 0.5)
         / 1000000 AS r2
FROM m
""",
    doc="graph-statistics law fit: the degree power-law exponent of the "
    "part-co-purchase graph, estimated from the empirical CCDF "
    "P(deg >= k) — ln-survival vs ln-degree OLS, alpha = 1 - slope "
    "(the CCDF estimator; it avoids the binning bias of raw histogram "
    "fits).  The survival counts are EXACT: per-degree cells, one "
    "ascending prefix (the two-phase distributed pass in the Spark "
    "plan, a window in the oracle), survival = n - exclusive prefix.  "
    "Scale: the graph reduces to per-degree cells (bounded by max "
    "degree) before any ordered pass; the OLS moment reduce follows "
    "the t_zipf_fit precision convention (mirrored ln, 1e-4/1e-6 "
    "rounding).",
)
def x_degree_powerlaw(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    edges = _copurchase_edges(spark, sf)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    cells = deg.groupBy(F.col("deg").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    panel = cells.agg(F.sum("c").cast("long").alias("n_nodes"))
    cum = with_prefix_sum(cells, "k", "c", out_col="cum_ex")
    xy = (
        cum.crossJoin(F.broadcast(panel))
        .select(
            F.log(F.col("k").cast("double")).alias("x"),
            F.log((F.col("n_nodes") - F.col("cum_ex")).cast("double")).alias("y"),
        )
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    r2 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return m.crossJoin(F.broadcast(panel)).select(
        "n_nodes",
        F.col("n").alias("n_degrees"),
        (F.floor((1 - slope) * 10000 + 0.5) / 10000).alias("powerlaw_alpha"),
        (F.floor(r2 * 1000000 + 0.5) / 1000000).alias("r2"),
    )


# ------------------------------------------------------ temporal edge churn
@register(
    "x_edge_churn",
    oracle="""
WITH e94 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1994),
e95 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995),
ret AS (SELECT CAST(COUNT(*) AS BIGINT) AS retained
        FROM e94 JOIN e95 ON e94.c = e95.c AND e94.s = e95.s),
n94 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e94),
n95 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e95)
SELECT n94.n AS edges_1994, n95.n AS edges_1995, ret.retained,
       n95.n - ret.retained AS new_edges,
       n94.n - ret.retained AS lost_edges,
       CAST(ret.retained * 1000000 // (n94.n + n95.n - ret.retained) AS BIGINT)
         AS jaccard_micro
FROM ret CROSS JOIN n94 CROSS JOIN n95
""",
    doc="temporal graph diff: year-over-year churn of the distinct "
    "customer->supplier purchase relationship — retained / newly-formed "
    "/ lost edges between 1994 and 1995 and the exact Jaccard "
    "stability of the edge sets, the relationship-retention KPI b2b "
    "analytics tracks (and, generically, the snapshot-to-snapshot "
    "set-churn shape any versioned dataset audit needs).  Scale: two "
    "year-pruned distinct aggregates co-partitioned on the SAME "
    "(custkey, suppkey) key, so the retained-count join is "
    "shuffle-free under AQE reuse; counts are 1-row panels.",
)
def x_edge_churn(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")

    def year_edges(y: int) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == y)
            .join(li, o.o_orderkey == li.l_orderkey)
            .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
            .distinct()
        )

    e94, e95 = year_edges(1994), year_edges(1995)
    ret = e94.join(e95, ["c", "s"]).agg(F.count(F.lit(1)).cast("long").alias("retained"))
    n94 = e94.agg(F.count(F.lit(1)).cast("long").alias("edges_1994"))
    n95 = e95.agg(F.count(F.lit(1)).cast("long").alias("edges_1995"))
    res = ret.crossJoin(F.broadcast(n94)).crossJoin(F.broadcast(n95))
    num = F.col("retained").cast("decimal(38,0)") * F.lit(1_000_000).cast("decimal(38,0)")
    den = (
        F.col("edges_1994") + F.col("edges_1995") - F.col("retained")
    ).cast("decimal(38,0)")
    return res.select(
        "edges_1994",
        "edges_1995",
        "retained",
        (F.col("edges_1995") - F.col("retained")).alias("new_edges"),
        (F.col("edges_1994") - F.col("retained")).alias("lost_edges"),
        ((num - num % den) / den).cast("long").alias("jaccard_micro"),
    )


# ------------------------------------------------- community modularity
@register(
    "x_modularity",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v AS src, u AS dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM adj),
adjp AS MATERIALIZED (SELECT src, dst FROM adj
         UNION ALL SELECT node, node FROM nodes),
l0 AS (SELECT node, node AS lbl FROM nodes),
{_lpa_round_sql('l0', 'l1')},
{_lpa_round_sql('l1', 'l2')},
{_lpa_round_sql('l2', 'l3')},
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY src),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
comm AS (SELECT l.lbl, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                CAST(SUM(deg.d) AS BIGINT) AS degree_sum
         FROM l3 l JOIN deg ON deg.node = l.node GROUP BY l.lbl),
intra AS (SELECT la.lbl, CAST(COUNT(*) AS BIGINT) AS ie
          FROM edges e
          JOIN l3 la ON e.u = la.node
          JOIN l3 lb ON e.v = lb.node AND la.lbl = lb.lbl
          GROUP BY la.lbl)
SELECT c.lbl AS community, c.n_nodes,
       CAST(COALESCE(i.ie, 0) AS BIGINT) AS internal_edges, c.degree_sum,
       FLOOR((CAST(COALESCE(i.ie, 0) AS DOUBLE) / mm.m
              - (CAST(c.degree_sum AS DOUBLE) / (2 * mm.m))
                * (CAST(c.degree_sum AS DOUBLE) / (2 * mm.m))) * 1000000 + 0.5)
         / 1000000 AS q_contrib
FROM comm c LEFT JOIN intra i ON i.lbl = c.lbl CROSS JOIN mm
ORDER BY community
""",
    doc="Newman modularity decomposition of the label-propagation "
    "communities over the support-2 co-purchase graph: per community, "
    "Q_c = e_c/m - (D_c/2m)^2 where e_c is the exact intra-community "
    "edge count, D_c the community degree sum, m the edge count — the "
    "quality audit that tells you whether the bounded-round LPA sketch "
    "found real structure (sum of q_contrib = global modularity Q; "
    "near 0 means the partition is no better than random wiring).  "
    "Determinism: communities replay the same synchronous min-label "
    "rounds as x_label_propagation; e_c, D_c, m are exact integers and "
    "the one float expression is a mirrored IEEE tree, floor-rounded.  "
    "Scale: degrees are one partial-agg'd shuffle over the edge list; "
    "intra-edges is a node-keyed double label join (edge-list sized, "
    "never all-pairs); the edge count rides a broadcast 1-row panel.",
)
def x_modularity(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf)
    labels = label_propagation(edges, rounds=_LPA_ROUNDS).localCheckpoint()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(F.count("*").alias("n_nodes"), F.sum("d").alias("degree_sum"))
    )
    la = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lbl_u"))
    lb = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lbl_v"))
    intra = (
        edges.join(la, "u")
        .join(lb, "v")
        .where(F.col("lbl_u") == F.col("lbl_v"))
        .groupBy(F.col("lbl_u").alias("lbl"))
        .agg(F.count("*").alias("ie"))
    )
    mm = edges.agg(F.count(F.lit(1)).alias("m"))
    half = F.col("degree_sum").cast("double") / (2 * F.col("m"))
    return (
        comm.join(intra, "lbl", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            F.col("lbl").alias("community"),
            "n_nodes",
            F.coalesce(F.col("ie"), F.lit(0)).cast("long").alias("internal_edges"),
            "degree_sum",
            (
                F.floor(
                    (
                        F.coalesce(F.col("ie"), F.lit(0)).cast("double") / F.col("m")
                        - half * half
                    )
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


# --------------------------------------------- Holt linear-trend smoothing
_HOLT_LEVEL_TAPS = 6  # lags 0..5 of the value
_HOLT_TREND_TAPS = 5  # lags 0..4 of the first difference


def _holt_oracle() -> str:
    lv_num = " + ".join(
        f"COALESCE(v{j}, 0.0) * {0.5 ** j!r}" if j else "v0 * 1.0"
        for j in range(_HOLT_LEVEL_TAPS)
    )
    lv_den = " + ".join(
        f"CASE WHEN v{j} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END" if j else "1.0"
        for j in range(_HOLT_LEVEL_TAPS)
    )
    tr_num = " + ".join(
        f"CASE WHEN v{j + 1} IS NULL THEN 0.0 ELSE (v{j} - v{j + 1}) * {0.5 ** j!r} END"
        for j in range(_HOLT_TREND_TAPS)
    )
    tr_den = " + ".join(
        f"CASE WHEN v{j + 1} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END"
        for j in range(_HOLT_TREND_TAPS)
    )
    lags = ", ".join(
        f"lag(value, {j}) OVER w AS v{j}" for j in range(1, _HOLT_LEVEL_TAPS)
    )
    return f"""
WITH c AS (
  SELECT user_id, value AS v0, {lags},
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, n_clicks,
         ({lv_num}) / ({lv_den}) AS level_raw,
         CASE WHEN ({tr_den}) = 0.0 THEN 0.0
              ELSE ({tr_num}) / ({tr_den}) END AS trend_raw
  FROM c WHERE rk = 1)
SELECT user_id, n_clicks,
       FLOOR(level_raw * 1000000 + 0.5) / 1000000 AS level,
       FLOOR(trend_raw * 1000000 + 0.5) / 1000000 AS trend,
       FLOOR((level_raw + trend_raw) * 1000000 + 0.5) / 1000000 AS forecast_next
FROM s
ORDER BY user_id
"""


@register(
    "e_holt_trend",
    oracle=_holt_oracle(),
    doc="Holt double-exponential smoothing (level + linear trend) per "
    "user over the click stream, as two bounded FIRs: the level is the "
    "6-tap alpha=1/2 EWMA of the value (same truncation argument as "
    "e_ewma_smooth — the infinite recursion is order-serial unbounded "
    "state, the FIR is a fixed lag window), the trend is the 5-tap "
    "beta=1/2 EWMA of the FIRST DIFFERENCE, and the one-step forecast "
    "is level + trend — the workhorse short-horizon forecaster one "
    "notch above q06_forecast_revenue's naive drift.  Determinism: "
    "every weight 2^-j is an exactly-representable binary double, both "
    "engines fold taps in written order, the quotients and the sum are "
    "single mirrored IEEE expressions, floor-rounded at the end.  "
    "Scale: ONE user-partitioned window pass (lags + count + the "
    "last-row rank share the partition key — never a global sort); "
    "output is one row per active user.",
)
def e_holt_trend(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wp = Window.partitionBy("user_id")
    clicks = load_table(spark, sf, "events").where(F.col("event_type") == "click")
    c = clicks.select(
        "user_id",
        F.col("value").alias("v0"),
        *[F.lag("value", j).over(w).alias(f"v{j}") for j in range(1, _HOLT_LEVEL_TAPS)],
        F.row_number().over(wd).alias("rk"),
        F.count("*").over(wp).alias("n_clicks"),
    ).where(F.col("rk") == 1)
    lv_num = F.col("v0") * 1.0
    lv_den = F.lit(1.0)
    for j in range(1, _HOLT_LEVEL_TAPS):
        lv_num = lv_num + F.coalesce(F.col(f"v{j}"), F.lit(0.0)) * F.lit(0.5 ** j)
        lv_den = lv_den + F.when(F.col(f"v{j}").isNull(), 0.0).otherwise(0.5 ** j)
    tr_num = F.lit(0.0)
    tr_den = F.lit(0.0)
    first = True
    for j in range(_HOLT_TREND_TAPS):
        term = F.when(F.col(f"v{j + 1}").isNull(), 0.0).otherwise(
            (F.col(f"v{j}") - F.col(f"v{j + 1}")) * F.lit(0.5 ** j)
        )
        den = F.when(F.col(f"v{j + 1}").isNull(), 0.0).otherwise(F.lit(0.5 ** j))
        tr_num = term if first else tr_num + term
        tr_den = den if first else tr_den + den
        first = False
    s = c.select(
        "user_id",
        "n_clicks",
        (lv_num / lv_den).alias("level_raw"),
        F.when(tr_den == 0.0, 0.0).otherwise(tr_num / tr_den).alias("trend_raw"),
    )
    r6 = lambda col: F.floor(col * 1000000 + 0.5) / 1000000  # noqa: E731
    return s.select(
        "user_id",
        "n_clicks",
        r6(F.col("level_raw")).alias("level"),
        r6(F.col("trend_raw")).alias("trend"),
        r6(F.col("level_raw") + F.col("trend_raw")).alias("forecast_next"),
    ).orderBy("user_id")


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


# --------------------------------------------- lead-lag cross-correlation
_XCORR_LAGS = 3


@register(
    "e_cross_correlation",
    oracle=f"""
WITH c AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
           FROM events WHERE event_type = 'click' GROUP BY 1),
p AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
lags AS (SELECT UNNEST(generate_series(-{_XCORR_LAGS}, {_XCORR_LAGS})) AS lag),
j AS (SELECT l.lag, c.x, p.y
      FROM c CROSS JOIN lags l JOIN p ON p.day = c.day + CAST(l.lag AS INT)),
mo AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
              SUM(CAST(x AS HUGEINT) * y) AS sxy,
              SUM(CAST(x AS HUGEINT) * x) AS sxx,
              SUM(CAST(y AS HUGEINT) * y) AS syy
       FROM j GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       FLOOR((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS xcorr
FROM mo
ORDER BY lag
""",
    doc="lead-lag cross-correlation between the daily click series and "
    "the daily purchase series at lags -3..+3 (does click volume LEAD "
    "purchase volume, and by how many days?) — the attribution-lag "
    "readout marketing teams run before e_attribution_linear assigns "
    "credit.  Pearson r per lag from exact widened-integer moments "
    "(counts, sums, cross products accumulate as integers; the one "
    "float expression is a mirrored IEEE tree, floor-rounded).  Scale: "
    "two map-side-combined daily rollups, a 7-row lag panel crossed "
    "over the calendar-sized click rollup, one date-keyed equi-join, "
    "one partial-agg'd moment reduce per lag.",
)
def e_cross_correlation(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("y"))
    )
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(-_XCORR_LAGS), F.lit(_XCORR_LAGS))).alias("lag")
    )
    j = (
        c.crossJoin(F.broadcast(lags))
        .join(
            p.withColumnRenamed("day", "p_day"),
            F.date_add(F.col("day"), F.col("lag")) == F.col("p_day"),
        )
        .select("lag", "x", "y")
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    mo = j.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
    )
    return mo.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        (F.floor(num / den * 1000000 + 0.5) / 1000000).alias("xcorr"),
    ).orderBy("lag")


# --------------------------------------------------- DAU/MAU stickiness
@register(
    "e_stickiness_dau_mau",
    oracle="""
WITH daily AS (
  SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS month, CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1, 2),
per_month AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM daily GROUP BY month),
mau_t AS (
  SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM events GROUP BY 1)
SELECT m.month, m.n_days, u.mau,
       FLOOR(CAST(m.sum_dau AS DOUBLE) / m.n_days * 100 + 0.5) / 100 AS dau_avg,
       FLOOR(CAST(m.sum_dau AS DOUBLE) / m.n_days / u.mau * 1000000 + 0.5)
         / 1000000 AS stickiness
FROM per_month m JOIN mau_t u ON u.month = m.month
ORDER BY m.month
""",
    doc="DAU/MAU stickiness per month: average daily active users over "
    "monthly active users — the engagement ratio every consumer product "
    "tracks (1.0 = every monthly user shows up daily).  Exact distinct "
    "counts at both granularities; the two ratios are mirrored IEEE "
    "divisions of exact integers, floor-rounded.  Scale: both rollups "
    "partial-agg on (period, user) before the distinct count — "
    "Catalyst's two-phase distinct — so the shuffle carries one row "
    "per active (day,user) / (month,user), never raw events; the "
    "month-keyed join is calendar-bounded.",
)
def e_stickiness_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    per_month = daily.groupBy("month").agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    mau = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_days")
    return (
        per_month.join(mau, "month")
        .select(
            "month",
            "n_days",
            "mau",
            (F.floor(avg_dau * 100 + 0.5) / 100).alias("dau_avg"),
            (F.floor(avg_dau / F.col("mau") * 1000000 + 0.5) / 1000000).alias(
                "stickiness"
            ),
        )
        .orderBy("month")
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


# ------------------------------------------------- burst-velocity check
@register(
    "e_burst_velocity",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(epoch(ts) AS BIGINT) AS sec, event_id FROM events),
burst AS (
  SELECT user_id, event_id,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_60s
  FROM ev),
peak AS (
  SELECT user_id, MAX(n_60s) AS peak_burst,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM burst GROUP BY user_id)
SELECT user_id, peak_burst, n_events
FROM peak
WHERE peak_burst >= 3
ORDER BY peak_burst DESC, user_id
""",
    doc="burst-velocity screen (the rate-limit / fraud-velocity check): "
    "for every user, the maximum number of events inside ANY trailing "
    "60-second window, flagging users whose peak burst >= 3 — the "
    "primitive behind 'more than N actions per minute' rules, done "
    "exactly rather than by bucketed approximation (a fixed 60 s "
    "tumbling bucket misses bursts straddling the boundary; the RANGE "
    "frame doesn't).  Determinism: the frame is keyed on integer epoch "
    "seconds, COUNT is tie-insensitive, and the per-user MAX collapses "
    "any intra-frame ordering ambiguity.  Scale: ONE user-partitioned "
    "range window + one partial-agg'd rollup; never a global sort.",
)
def e_burst_velocity(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-59, Window.currentRow)
    )
    burst = ev.select("user_id", F.count("*").over(w).alias("n_60s"))
    peak = burst.groupBy("user_id").agg(
        F.max("n_60s").alias("peak_burst"), F.count("*").alias("n_events")
    )
    return (
        peak.where(F.col("peak_burst") >= 3)
        .orderBy(F.col("peak_burst").desc(), "user_id")
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


# ------------------------------------------------- two-proportion A/B test
@register(
    "e_ab_conversion_test",
    oracle=f"""
WITH pc AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purch
  FROM events GROUP BY user_id),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n_purch) AS BIGINT) AS total_purch
        FROM pc),
u AS (
  SELECT pc.arm,
         CASE WHEN pc.n_purch * t.n_users > t.total_purch THEN 1 ELSE 0 END
           AS converted
  FROM pc CROSS JOIN tot t),
arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
  FROM u),
z AS (
  SELECT n_a, n_b, c_a, c_b,
         (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
           / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)) AS z_raw
  FROM arms)
SELECT n_a, n_b, c_a, c_b,
       FLOOR(CAST(c_a AS DOUBLE) / n_a * 1000000 + 0.5) / 1000000 AS rate_a,
       FLOOR(CAST(c_b AS DOUBLE) / n_b * 1000000 + 0.5) / 1000000 AS rate_b,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR({_ERFC_SQL.format(az="ABS(z_raw)")} * 1000000 + 0.5) / 1000000
         AS p_two_sided,
       {_ERFC_SQL.format(az="ABS(z_raw)")} < 0.05 AS significant
FROM z
""",
    doc="two-proportion test between deterministic user-parity arms on "
    "the above-mean-purchaser flag (converted iff the user's purchase "
    "count exceeds the per-user mean — the comparison n_purch * n_users "
    "> total stays EXACT integer, and unlike raw did-purchase it can't "
    "saturate to all-ones on dense fixtures): pooled-variance z, A&S "
    "erfc two-sided p, 5% verdict — the plain A/B readout between "
    "e_srm_check (validity) and e_cuped_adjust (variance reduction).  "
    "Scale: one user-keyed partial-agg rollup, a 1-row mean panel "
    "crossed back, one 4-cell reduce; statistics on a 1-row panel.",
)
def e_ab_conversion_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    pc = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purch"
        )
    ).select("user_id", (F.col("user_id") % 2).alias("arm"), "n_purch")
    tot = pc.agg(
        F.count("*").alias("n_users"), F.sum("n_purch").alias("total_purch")
    )
    u = pc.crossJoin(F.broadcast(tot)).select(
        "arm",
        F.when(
            F.col("n_purch") * F.col("n_users") > F.col("total_purch"), 1
        )
        .otherwise(0)
        .alias("converted"),
    )
    arms = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z_raw = (
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    ) / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = arms.select("n_a", "n_b", "c_a", "c_b", z_raw.alias("z_raw"))
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
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        (F.floor(F.col("c_a").cast("double") / F.col("n_a") * 1000000 + 0.5) / 1000000).alias("rate_a"),
        (F.floor(F.col("c_b").cast("double") / F.col("n_b") * 1000000 + 0.5) / 1000000).alias("rate_b"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (F.floor(p * 1000000 + 0.5) / 1000000).alias("p_two_sided"),
        (p < 0.05).alias("significant"),
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


# ------------------------------------------------- behavioral entropy
@register(
    "e_behavior_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id, CAST(SUM(k) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(FLOOR(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s_klnk_q
  FROM c GROUP BY user_id)
SELECT user_id, n AS n_events, n_types,
       FLOOR((ln(CAST(n AS DOUBLE)) - CAST(s_klnk_q AS DOUBLE) / 1000000 / n)
             * 1000000 + 0.5) / 1000000 AS entropy_nats
FROM u
ORDER BY user_id
""",
    doc="behavioral-diversity score per user: Shannon entropy of the "
    "user's event-type mix via the count identity H = ln(n) - "
    "(sum k*ln k)/n, with each per-type k*ln(k) term QUANTIZED to "
    "integer micro-units before the group sum (the catalog's standard "
    "order-independence convention — float addition is not "
    "associative, so raw double group-sums are not engine-portable "
    "even over 5 terms).  Low entropy = single-purpose "
    "users, high = browsers — the standard engagement-mix feature.  "
    "Scale: two map-side-combined rollups, no joins, no windows.",
)
def e_behavior_entropy(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    u = c.groupBy("user_id").agg(
        F.sum("k").alias("n"),
        F.count("*").alias("n_types"),
        F.sum(
            F.floor(
                F.col("k").cast("double") * F.log(F.col("k").cast("double")) * 1000000
                + 0.5
            ).cast("long")
        ).alias("s_klnk_q"),
    )
    return u.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        (
            F.floor(
                (
                    F.log(F.col("n").cast("double"))
                    - F.col("s_klnk_q").cast("double") / 1000000 / F.col("n")
                )
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("entropy_nats"),
    ).orderBy("user_id")


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


# --------------------------------------------- portable HLL sketch
def _bitlen54_sql(w: str) -> str:
    """Exact integer bit-length of a 54-bit value as a comparison chain —
    no float log2, so both engines agree bit-for-bit."""
    return "(" + " + ".join(
        f"(CASE WHEN {w} >= {1 << b} THEN 1 ELSE 0 END)" for b in range(54)
    ) + ")"


_HLL_M = 64
# alpha_64 * m^2 * 2^55 — ONE shared double literal, so both engines run
# the identical IEEE division against the exact integer register sum
_HLL_C = repr(0.7213 / (1 + 1.079 / 64) * 4096 * float(1 << 55))


@register(
    "x_hll_portable",
    oracle=f"""
WITH rows_h AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         user_id,
         {portable_hash64_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events),
reg_in AS (
  SELECT event_type, day, h % {_HLL_M} AS bucket,
         55 - {_bitlen54_sql(f"(h // {_HLL_M})")} AS rho
  FROM rows_h),
daily AS (
  SELECT event_type, day, bucket, MAX(rho) AS mj
  FROM reg_in GROUP BY 1, 2, 3),
merged AS (
  SELECT event_type, bucket, MAX(mj) AS mj FROM daily GROUP BY 1, 2),
direct AS (
  SELECT event_type, bucket, MAX(rho) AS mj FROM reg_in GROUP BY 1, 2),
est_m AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - mj AS INT)) AS BIGINT)
           + ({_HLL_M} - COUNT(*)) * {1 << 55} AS s,
         {_HLL_M} - CAST(COUNT(*) AS BIGINT) AS v
  FROM merged GROUP BY 1),
est_d AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - mj AS INT)) AS BIGINT)
           + ({_HLL_M} - COUNT(*)) * {1 << 55} AS s,
         {_HLL_M} - CAST(COUNT(*) AS BIGINT) AS v
  FROM direct GROUP BY 1),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1)
SELECT ex.event_type, ex.exact_users,
       FLOOR((CASE WHEN {_HLL_C} / d.s <= 160.0 AND d.v > 0
                   THEN 64.0 * ln(64.0 / d.v)
                   ELSE {_HLL_C} / d.s END) * 1000000 + 0.5) / 1000000
         AS hll_direct,
       FLOOR((CASE WHEN {_HLL_C} / m.s <= 160.0 AND m.v > 0
                   THEN 64.0 * ln(64.0 / m.v)
                   ELSE {_HLL_C} / m.s END) * 1000000 + 0.5) / 1000000
         AS hll_merged,
       FLOOR(ABS((CASE WHEN {_HLL_C} / d.s <= 160.0 AND d.v > 0
                       THEN 64.0 * ln(64.0 / d.v)
                       ELSE {_HLL_C} / d.s END) - ex.exact_users)
             / ex.exact_users * 10000 + 0.5) / 100 AS rel_err_pct
FROM ex JOIN est_d d ON d.event_type = ex.event_type
        JOIN est_m m ON m.event_type = ex.event_type
ORDER BY ex.event_type
""",
    doc="PORTABLE HyperLogLog distinct-user sketch per event type, fully "
    "oracle-paired (the q_hll_sketch twin: that query exercises Spark's "
    "built-in DataSketches HLL, whose registers are engine-specific and "
    "therefore rows-only; THIS one builds HLL from the engine-portable "
    "md5 hash so DuckDB replays it bit-for-bit).  Construction: 64 "
    "registers (low 6 hash bits), rho = leading-zero rank of the "
    "remaining 54 bits via an exact comparison-chain bit-length (no "
    "float log2), register algebra in exact integers — the harmonic "
    "denominator is SUM(2^(55-Mj)), an integer, so the only float ops "
    "are one shared-literal alpha*m^2*2^55 division and the standard "
    "linear-counting branch (64*ln(64/V) when E <= 2.5m and zeros "
    "remain).  Mergeability is PROVEN in-query: per-day partial "
    "registers max-merged equal the direct registers exactly (max is "
    "associative — unlike the DataSketches sparse->dense promotion, "
    "the portable sketch is bit-identical under any partitioning), so "
    "hll_direct == hll_merged down to the last decimal.  Scale: "
    "register build is a map-side-combined groupBy to <= groups x 64 "
    "cells; merges are max-folds over 64-row panels — the incremental "
    "rollup pattern that replaces exact count-distinct at 100 TB.  "
    "The exact count and relative error ride along as the audit.",
)
def x_hll_portable(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    h = portable_hash64(F.col("user_id").cast("string"))
    rows = ev.select(
        "event_type", F.to_date("ts").alias("day"), "user_id", h.alias("h")
    ).select(
        "event_type",
        "day",
        "user_id",
        F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
        F.expr(f"55 - {_bitlen54_sql(f'(h div {_HLL_M})')}").alias("rho"),
    )
    daily = rows.groupBy("event_type", "day", "bucket").agg(F.max("rho").alias("mj"))
    merged = daily.groupBy("event_type", "bucket").agg(F.max("mj").alias("mj"))
    direct = rows.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))

    def est_panel(regs: DataFrame, s_name: str, v_name: str) -> DataFrame:
        return regs.groupBy("event_type").agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))"))
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 55)
            )
            .cast("long")
            .alias(s_name),
            (F.lit(_HLL_M) - F.count("*")).cast("long").alias(v_name),
        )

    est_d = est_panel(direct, "sd", "vd")
    est_m = est_panel(merged, "sm", "vm")
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )

    def est_expr(s: str, v: str):
        raw = F.lit(float(_HLL_C)) / F.col(s)
        lc = F.lit(64.0) * F.log(F.lit(64.0) / F.col(v))
        return F.when((raw <= 160.0) & (F.col(v) > 0), lc).otherwise(raw)

    return (
        ex.join(est_d, "event_type")
        .join(est_m, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.floor(est_expr("sd", "vd") * 1000000 + 0.5) / 1000000).alias("hll_direct"),
            (F.floor(est_expr("sm", "vm") * 1000000 + 0.5) / 1000000).alias("hll_merged"),
            (
                F.floor(
                    F.abs(est_expr("sd", "vd") - F.col("exact_users"))
                    / F.col("exact_users")
                    * 10000
                    + 0.5
                )
                / 100
            ).alias("rel_err_pct"),
        )
        .orderBy("event_type")
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


# --------------------------------------------------- multi-touch attribution
@register(
    "e_attribution_credit",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS g
  FROM events),
t AS (SELECT * FROM e WHERE event_type IN ('view', 'click', 'signup')),
c AS (SELECT user_id, g FROM e WHERE event_type = 'purchase'),
a AS (SELECT t.user_id, t.g, t.event_type, t.ts, t.event_id
      FROM t JOIN c ON t.user_id = c.user_id AND t.g = c.g),
a2 AS (SELECT event_type,
              COUNT(*) OVER (PARTITION BY user_id, g) AS n_touch,
              ROW_NUMBER() OVER (PARTITION BY user_id, g
                                 ORDER BY ts, event_id) AS rn_asc,
              ROW_NUMBER() OVER (PARTITION BY user_id, g
                                 ORDER BY ts DESC, event_id DESC) AS rn_desc
       FROM a),
by_n AS (SELECT event_type AS channel, n_touch,
                CAST(SUM(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ft,
                CAST(SUM(CASE WHEN rn_desc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lt,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM a2 GROUP BY 1, 2),
fold AS (SELECT channel,
                CAST(SUM(ft) AS BIGINT) AS first_touch,
                CAST(SUM(lt) AS BIGINT) AS last_touch,
                list({'n': n_touch, 'c': cnt} ORDER BY n_touch) AS l
         FROM by_n GROUP BY channel)
SELECT channel, first_touch, last_touch,
       ROUND(list_reduce(list_transform(l, x -> CAST(x.c AS DOUBLE) / x.n),
                         (p, q) -> p + q), 6) AS linear_credit
FROM fold ORDER BY channel
""",
    doc="multi-touch conversion attribution over user journeys: each "
    "purchase closes a conversion window (touches since the user's "
    "previous purchase), and the view/click/signup touches inside it "
    "earn credit under the three standard models — first-touch, "
    "last-touch (one credit to the window's first/last touch) and "
    "linear (1/n_touch to every touch).  The window key is a cumulative "
    "count of PRIOR purchases per user, so grouping is one window "
    "function, not a per-conversion scan.  Determinism: window order is "
    "the total (ts, event_id) order; first/last are exact integers; "
    "linear credit is folded LEFT-TO-RIGHT over the (n_touch, count) "
    "panel sorted by n_touch — cross-engine identical doubles, never a "
    "float sum in engine-chosen row order.  Scale: one user-keyed "
    "window pass + one channel-keyed aggregate; the fold panel is "
    "bounded by DISTINCT window sizes, not by events.",
)
def e_attribution_credit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w_before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = F.coalesce(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            w_before
        ),
        F.lit(0),
    ).cast("long")
    e = ev.select("user_id", "ts", "event_id", "event_type", g.alias("g"))
    touches = e.where(F.col("event_type").isin("view", "click", "signup"))
    convs = e.where(F.col("event_type") == "purchase").select("user_id", "g")
    a = touches.join(convs, ["user_id", "g"])
    wg = Window.partitionBy("user_id", "g")
    a2 = a.select(
        "event_type",
        F.count(F.lit(1)).over(wg).alias("n_touch"),
        F.row_number()
        .over(Window.partitionBy("user_id", "g").orderBy("ts", "event_id"))
        .alias("rn_asc"),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "g").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        )
        .alias("rn_desc"),
    )
    by_n = a2.groupBy(F.col("event_type").alias("channel"), "n_touch").agg(
        F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0)).alias("ft"),
        F.sum(F.when(F.col("rn_desc") == 1, 1).otherwise(0)).alias("lt"),
        F.count(F.lit(1)).alias("cnt"),
    )
    fold = by_n.groupBy("channel").agg(
        F.sum("ft").alias("first_touch"),
        F.sum("lt").alias("last_touch"),
        F.sort_array(F.collect_list(F.struct("n_touch", "cnt"))).alias("l"),
    )
    linear = F.aggregate(
        F.transform(F.col("l"), lambda x: x["cnt"].cast("double") / x["n_touch"]),
        F.lit(0.0),
        lambda p, q: p + q,
    )
    return fold.select(
        "channel",
        "first_touch",
        "last_touch",
        F.round(linear, 6).alias("linear_credit"),
    ).orderBy("channel")


# ------------------------------------------------ sequential pattern mining
@register(
    "e_seq_patterns",
    oracle="""
WITH l AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type, 1) OVER w AS b1,
         LEAD(event_type, 2) OVER w AS b2,
         LEAD(event_type, 3) OVER w AS b3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (
  SELECT user_id, a, b1 AS b FROM l WHERE b1 IS NOT NULL
  UNION ALL SELECT user_id, a, b2 FROM l WHERE b2 IS NOT NULL
  UNION ALL SELECT user_id, a, b3 FROM l WHERE b3 IS NOT NULL)
SELECT a AS antecedent, b AS consequent,
       CAST(COUNT(*) AS BIGINT) AS occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_support
FROM p GROUP BY 1, 2
ORDER BY user_support DESC, occurrences DESC, antecedent, consequent
""",
    doc="gap-constrained sequential pattern mining (the length-2 "
    "GSP/PrefixSpan counting step): ordered event-type pairs 'a then b "
    "within the next 3 events' per user, with occurrence counts and "
    "distinct-user support — the sequence-rule complement of "
    "q_market_basket's unordered co-occurrence and e_markov_transitions' "
    "adjacent-only transitions.  The gap bound is the scale contract: "
    "pairs come from 3 LEAD columns in ONE user-keyed window pass "
    "(work O(gap x events), never the quadratic all-ordered-pairs "
    "blowup), then one pair-keyed aggregate; support is exact "
    "count-distinct.  All integers — no float determinism surface.",
)
def e_seq_patterns(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.select(
        "user_id",
        F.col("event_type").alias("a"),
        *[F.lead("event_type", d).over(w).alias(f"b{d}") for d in (1, 2, 3)],
    )
    p = None
    for d in (1, 2, 3):
        part = l.where(F.col(f"b{d}").isNotNull()).select(
            "user_id", "a", F.col(f"b{d}").alias("b")
        )
        p = part if p is None else p.unionAll(part)
    return (
        p.groupBy(F.col("a").alias("antecedent"), F.col("b").alias("consequent"))
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("user_id").alias("user_support"),
        )
        .orderBy(
            F.col("user_support").desc(),
            F.col("occurrences").desc(),
            "antecedent",
            "consequent",
        )
    )


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
    li = load_table(spark, sf, "lineitem")
    bins = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("pos"),
    )
    panel = bins.agg(
        F.sort_array(F.collect_list(F.struct("q", "n", "pos"))).alias("l")
    ).select("l", F.size("l").cast("long").alias("b"))

    def prefix(field: str):
        return F.transform(
            F.sequence(F.lit(1), F.col("b")),
            lambda i: F.aggregate(
                F.slice(F.col("l"), F.lit(1), i),
                F.lit(0).cast("long"),
                lambda p, s: p + s[field],
            ),
        )

    pre = panel.select(
        "l", "b", prefix("n").alias("pn"), prefix("pos").alias("pp")
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


# ----------------------------------------------- difference-in-differences
@register(
    "e_diff_in_diff",
    oracle=f"""
WITH span AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
              FROM events),
treated AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
p AS (
  SELECT e.user_id,
         CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
         CASE WHEN epoch_us(e.ts) >= span.mid THEN 1 ELSE 0 END AS post,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e
  LEFT JOIN treated t ON e.user_id = t.user_id
  CROSS JOIN span
  WHERE e.event_type = 'purchase'),
cells AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM p GROUP BY 1, 2),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(total_cents AS DOUBLE) / n END) AS t_pre,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(total_cents AS DOUBLE) / n END) AS t_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(total_cents AS DOUBLE) / n END) AS c_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(total_cents AS DOUBLE) / n END) AS c_post,
    CAST(SUM(n) AS BIGINT) AS n_purchases
  FROM cells)
SELECT n_purchases,
       ROUND(t_pre, 6) AS treated_pre,
       ROUND(t_post, 6) AS treated_post,
       ROUND(c_pre, 6) AS control_pre,
       ROUND(c_post, 6) AS control_post,
       ROUND((t_post - t_pre) - (c_post - c_pre), 6) AS did_cents
FROM wide
""",
    doc="difference-in-differences estimator: treated = users who ever "
    "signed up, periods split at the corpus time midpoint, outcome = "
    "mean purchase value (exact integer cents) — DiD = (treated_post - "
    "treated_pre) - (control_post - control_pre), the parallel-trends "
    "causal-effect workhorse (Card & Krueger 1994) that e_event_study "
    "(around-event windows) and e_cuped_adjust (variance reduction) "
    "bracket.  Determinism: every cell is an exact bigint (count, "
    "cent-sum); the four means are single integer/integer IEEE "
    "divisions folded into one closed-form expression.  Scale: one "
    "broadcast semi-join for treatment status (the signup key set is "
    "tiny), one 1-row time-span panel, one 4-cell aggregate — "
    "map-side-combined end to end, output is ONE row.",
)
def e_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import attach_scalar_panel

    ev = load_table(spark, sf, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    span = ev.agg(((F.min(us) + F.max(us)) / F.lit(2)).cast("long").alias("mid"))
    treated = ev.where(F.col("event_type") == "signup").select("user_id").distinct()
    purchases = ev.where(F.col("event_type") == "purchase")
    p = (
        attach_scalar_panel(purchases, span)
        .join(
            F.broadcast(treated.withColumn("__t", F.lit(1))), "user_id", "left"
        )
        .select(
            F.coalesce("__t", F.lit(0)).alias("treated"),
            F.when(us >= F.col("mid"), 1).otherwise(0).alias("post"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    cells = p.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents")
    )

    def cell(tr, po):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po),
                F.col("total_cents").cast("double") / F.col("n"),
            )
        )

    wide = cells.agg(
        cell(1, 0).alias("t_pre"),
        cell(1, 1).alias("t_post"),
        cell(0, 0).alias("c_pre"),
        cell(0, 1).alias("c_post"),
        F.sum("n").alias("n_purchases"),
    )
    return wide.select(
        "n_purchases",
        F.round("t_pre", 6).alias("treated_pre"),
        F.round("t_post", 6).alias("treated_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did_cents"),
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
    vp = u.groupBy("browse").agg(F.count(F.lit(1)).alias("cnt"))
    pan = vp.agg(F.sort_array(F.collect_list(F.struct("browse", "cnt"))).alias("l"))
    total = F.aggregate(
        F.col("l"), F.lit(0).cast("long"), lambda a, x: a + x["cnt"]
    )
    # users with browse STRICTLY GREATER = total - inclusive prefix (asc)
    offsets = pan.select(F.col("l"), total.alias("n_total")).select(
        "n_total",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l")),
                lambda i: F.struct(
                    F.element_at(F.col("l"), i)["browse"].alias("browse"),
                    (
                        F.col("n_total")
                        - F.aggregate(
                            F.slice(F.col("l"), F.lit(1), i),
                            F.lit(0).cast("long"),
                            lambda a, x: a + x["cnt"],
                        )
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
    dp = per.agg(
        F.sort_array(
            F.collect_list(F.struct("decile", "n_users", "n_converted"))
        ).alias("l")
    )

    def fold(field, i=None):
        src = F.col("l") if i is None else F.slice(F.col("l"), F.lit(1), i)
        return F.aggregate(
            src, F.lit(0).cast("long"), lambda a, x: a + x[field]
        )

    rows = dp.select(
        fold("n_users").alias("all_users"),
        fold("n_converted").alias("all_converted"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l")),
                lambda i: F.struct(
                    F.element_at(F.col("l"), i)["decile"].alias("decile"),
                    F.element_at(F.col("l"), i)["n_users"].alias("n_users"),
                    F.element_at(F.col("l"), i)["n_converted"].alias("n_converted"),
                    fold("n_converted", i).alias("cum_converted"),
                    fold("n_users", i).alias("cum_users"),
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
