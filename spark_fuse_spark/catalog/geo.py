"""Geospatial analytics: grid blocking, radius joins, haversine, Moran's I.

The synthetic tables carry no coordinates, so every query derives
deterministic positions from entity keys via the engine-portable 60-bit
md5 hash (`functions/hashing.py`): latitude microdegrees in
[40.0°, 50.0°) and longitude microdegrees in [70.0°, 80.0°).  Working in
INTEGER microdegrees keeps every distance filter, cell assignment, and
moment sum exact on both engines — floats appear only in final display
columns (haversine km, Moran's I), computed from exact integer inputs by
a single mirrored expression and rounded with the catalog's explicit
``floor(x*10^k + 0.5)/10^k`` convention.

Scale shapes (the point of the module):

* ``g_geo_cells`` — one partial-agg'd groupBy on the cell id; the grid
  is a pure per-row projection, so density profiling of 100 TB of
  points is a single map-side-combined shuffle.
* ``g_grid_neighbor_join`` — the canonical distributed spatial-radius
  join: cell size == radius, so the 3×3 neighborhood of a point's cell
  provably contains every point within R.  The build side explodes 9
  (dx,dy) offsets and equi-joins on the cell id — candidate count is
  O(points × local density), NEVER all-pairs.  The DuckDB oracle is the
  brute-force cross join, so the hash check doubles as a completeness
  proof for the blocking (any pair the grid missed would break parity).
* ``g_haversine_nearest`` — trig runs over ≤ |suppliers| nearest pairs
  (output of the blocked join), never over the candidate set.
* ``g_dbscan_core`` — DBSCAN core/border/noise density roles on the
  SAME blocked radius self-join (brute-force oracle = completeness
  proof), i.e. the density-clustering step before cluster expansion.
* ``g_moran_autocorr`` — global Moran's I from SIX exact integer
  moments (Σx, Σx², edge Σxᵢxⱼ, edge Σ(xᵢ+xⱼ), N, W) reduced in one
  pass over cells + one rook-adjacency self-join; the statistic itself
  is one scalar float expression over exact integers, so engines agree
  bit-for-bit before rounding.

No reference counterpart: `/root/reference` has no geospatial surface;
this extends the analytics catalog (closest kin: the LSH blocking in
``operators/dedup.py`` — same candidates-then-verify contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import load_table
from . import register

__all__ = [
    "g_point_in_polygon",
    "g_geo_cells",
    "g_grid_neighbor_join",
    "g_haversine_nearest",
    "g_moran_autocorr",
    "g_dbscan_core",
]

# Shared coordinate box: 10°×10° in integer microdegrees.
LAT0 = 40_000_000
LON0 = 70_000_000
SPAN = 10_000_000

# Radius for the neighbor join — also the blocking cell size, so a 3×3
# neighborhood is guaranteed to cover the radius.
R_MICRO = 250_000
R_SQ = R_MICRO * R_MICRO
# nearest-neighbor encoding: dist_sq * ENC + custkey stays far under
# signed-64 (6.25e10 * 1e7 + 1e7 < 2^63); custkey < 1e7 holds to ~sf60.
ENC = 10_000_000


def _coords(key_col: str, prefix: str):
    """lat/lon microdegree columns derived from ``key_col`` (Spark side)."""
    k = F.col(key_col).cast("string")
    lat = LAT0 + portable_hash64(F.concat(k, F.lit(f"{prefix}lat"))) % SPAN
    lon = LON0 + portable_hash64(F.concat(k, F.lit(f"{prefix}lon"))) % SPAN
    return lat.alias("lat_micro"), lon.alias("lon_micro")


def _coords_sql(key_expr: str, prefix: str) -> str:
    """The DuckDB twin of :func:`_coords` as a SELECT fragment."""
    k = f"CAST({key_expr} AS VARCHAR)"
    h_lat = portable_hash64_sql(f"{k} || '{prefix}lat'")
    h_lon = portable_hash64_sql(f"{k} || '{prefix}lon'")
    return (
        f"{LAT0} + {h_lat} % {SPAN} AS lat_micro, "
        f"{LON0} + {h_lon} % {SPAN} AS lon_micro"
    )


# ------------------------------------------------------------ grid cells
@register(
    "g_geo_cells",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
         {_coords_sql('c_custkey', 'c')}
  FROM customer),
cells AS (
  SELECT (lat_micro - {LAT0}) // 1000000 AS cell_y,
         (lon_micro - {LON0}) // 1000000 AS cell_x,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(bal_cents) AS BIGINT) AS balance_cents,
         CAST(SUM(lat_micro) // COUNT(*) AS BIGINT) AS centroid_lat,
         CAST(SUM(lon_micro) // COUNT(*) AS BIGINT) AS centroid_lon
  FROM pts GROUP BY 1, 2)
SELECT * FROM cells
ORDER BY n_customers DESC, cell_y, cell_x
LIMIT 20
""",
    doc="customer density over a 1° grid: deterministic hash coordinates, "
    "integer cell ids, exact integer-cent balance totals and floor-mean "
    "centroids; top-20 densest cells with a total tie-break.  Scale: the "
    "grid is a per-row projection, so this is ONE map-side-combined "
    "groupBy shuffle regardless of point count.",
)
def g_geo_cells(spark: SparkSession, sf: str) -> DataFrame:
    lat, lon = _coords("c_custkey", "c")
    pts = load_table(spark, sf, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        lat,
        lon,
    )
    cells = (
        pts.withColumn("cell_y", ((F.col("lat_micro") - LAT0) / 1_000_000).cast("long"))
        .withColumn("cell_x", ((F.col("lon_micro") - LON0) / 1_000_000).cast("long"))
        .groupBy("cell_y", "cell_x")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("bal_cents").alias("balance_cents"),
            F.floor(F.sum("lat_micro") / F.count("*")).alias("centroid_lat"),
            F.floor(F.sum("lon_micro") / F.count("*")).alias("centroid_lon"),
        )
        .select(
            "cell_y", "cell_x", "n_customers", "balance_cents",
            "centroid_lat", "centroid_lon",
        )
    )
    return cells.orderBy(
        F.col("n_customers").desc(), F.col("cell_y").asc(), F.col("cell_x").asc()
    ).limit(20)


# ------------------------------------------- blocked spatial radius join
def _supplier_pts(spark: SparkSession, sf: str) -> DataFrame:
    lat, lon = _coords("s_suppkey", "s")
    return load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey", lat, lon)


def _customer_pts(spark: SparkSession, sf: str) -> DataFrame:
    lat, lon = _coords("c_custkey", "c")
    return (
        load_table(spark, sf, "customer")
        .select("c_custkey", lat, lon)
        .withColumnRenamed("lat_micro", "c_lat")
        .withColumnRenamed("lon_micro", "c_lon")
    )


def _nearest_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Per-supplier nearest customer within R via 3×3 grid blocking.

    Columns: s_suppkey, s_nationkey, lat_micro, lon_micro, n_within,
    dist_sq, c_custkey.  Inner semantics: suppliers with no customer in
    radius are absent.
    """
    from ..operators.spatial import nearest_within, radius_join

    # suppliers probe (smaller side pays the 9× explode); customers build
    pairs = radius_join(
        _supplier_pts(spark, sf),
        _customer_pts(spark, sf),
        radius=R_MICRO,
        build_lat="c_lat",
        build_lon="c_lon",
    )
    return nearest_within(
        pairs,
        ["s_suppkey", "s_nationkey", "lat_micro", "lon_micro"],
        "c_custkey",
        id_bound=ENC,
    )


_BRUTE_PAIRS_SQL = f"""
sup AS (
  SELECT s_suppkey, s_nationkey, {_coords_sql('s_suppkey', 's')}
  FROM supplier),
cust AS (
  SELECT c_custkey,
         {LAT0} + {portable_hash64_sql("CAST(c_custkey AS VARCHAR) || 'clat'")} % {SPAN} AS c_lat,
         {LON0} + {portable_hash64_sql("CAST(c_custkey AS VARCHAR) || 'clon'")} % {SPAN} AS c_lon
  FROM customer),
pairs AS (
  SELECT s.*, c.c_custkey, c.c_lat, c.c_lon,
         (s.lat_micro - c.c_lat) * (s.lat_micro - c.c_lat)
         + (s.lon_micro - c.c_lon) * (s.lon_micro - c.c_lon) AS dist_sq
  FROM sup s CROSS JOIN cust c
  WHERE (s.lat_micro - c.c_lat) * (s.lat_micro - c.c_lat)
        + (s.lon_micro - c.c_lon) * (s.lon_micro - c.c_lon) <= {R_SQ}),
nearest AS (
  SELECT s_suppkey, s_nationkey, lat_micro, lon_micro,
         CAST(COUNT(*) AS BIGINT) AS n_within,
         MIN(dist_sq * {ENC} + c_custkey) AS enc
  FROM pairs GROUP BY 1, 2, 3, 4)
"""


@register(
    "g_grid_neighbor_join",
    oracle=f"""
WITH {_BRUTE_PAIRS_SQL}
SELECT s_suppkey, n_within,
       CAST(enc // {ENC} AS BIGINT) AS dist_sq,
       CAST(enc % {ENC} AS BIGINT) AS c_custkey
FROM nearest
ORDER BY s_suppkey
""",
    doc="spatial radius join (suppliers → customers within 0.25°) with "
    "per-supplier neighbor count and nearest customer.  Spark blocks on "
    "a radius-sized grid (3×3 neighborhood provably covers R) so the "
    "candidate set is O(points × local density); the DuckDB oracle is "
    "the BRUTE-FORCE cross join, making the hash check a completeness "
    "proof of the blocking.  All distance math is exact integer "
    "microdegrees; the nearest tie-break rides an exact "
    "dist_sq*1e7+custkey encoding (min over bigint).",
)
def g_grid_neighbor_join(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _nearest_pairs(spark, sf)
        .select("s_suppkey", "n_within", "dist_sq", "c_custkey")
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------- haversine nearest
_H_NEAREST_LAT = portable_hash64_sql(f"CAST(enc % {ENC} AS VARCHAR) || 'clat'")
_H_NEAREST_LON = portable_hash64_sql(f"CAST(enc % {ENC} AS VARCHAR) || 'clon'")

@register(
    "g_haversine_nearest",
    oracle=f"""
WITH {_BRUTE_PAIRS_SQL},
dec AS (
  SELECT s_nationkey,
         lat_micro * 1e-6 AS s_lat, lon_micro * 1e-6 AS s_lon,
         (enc // {ENC}) AS dist_sq,
         {LAT0} + {_H_NEAREST_LAT} % {SPAN} AS c_lat_m,
         {LON0} + {_H_NEAREST_LON} % {SPAN} AS c_lon_m
  FROM nearest),
hav AS (
  SELECT s_nationkey,
         12742.0 * ASIN(SQRT(
           SIN(RADIANS((c_lat_m * 1e-6 - s_lat) / 2)) * SIN(RADIANS((c_lat_m * 1e-6 - s_lat) / 2))
           + COS(RADIANS(s_lat)) * COS(RADIANS(c_lat_m * 1e-6))
             * SIN(RADIANS((c_lon_m * 1e-6 - s_lon) / 2)) * SIN(RADIANS((c_lon_m * 1e-6 - s_lon) / 2))
         )) AS km
  FROM dec)
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       FLOOR(AVG(km) * 10000 + 0.5) / 10000 AS avg_km,
       FLOOR(MIN(km) * 10000 + 0.5) / 10000 AS min_km,
       FLOOR(MAX(km) * 10000 + 0.5) / 10000 AS max_km
FROM hav GROUP BY s_nationkey
ORDER BY s_nationkey
""",
    doc="haversine distance (km, R⊕=6371) from each supplier to its "
    "nearest in-radius customer, aggregated per supplier nation.  Trig "
    "runs over ≤|suppliers| nearest pairs — the output of the blocked "
    "join — never over the candidate set; distances derive from exact "
    "integer microdegrees so both engines feed identical doubles into "
    "the same mirrored formula, rounded floor(x*1e4+0.5)/1e4.",
)
def g_haversine_nearest(spark: SparkSession, sf: str) -> DataFrame:
    near = _nearest_pairs(spark, sf)
    clat, clon = _coords("c_custkey", "c")
    near = near.select(
        "s_nationkey",
        (F.col("lat_micro") * 1e-6).alias("s_lat"),
        (F.col("lon_micro") * 1e-6).alias("s_lon"),
        (clat * 1e-6).alias("c_lat"),
        (clon * 1e-6).alias("c_lon"),
    )
    half_dlat = F.radians((F.col("c_lat") - F.col("s_lat")) / 2)
    half_dlon = F.radians((F.col("c_lon") - F.col("s_lon")) / 2)
    km = 12742.0 * F.asin(
        F.sqrt(
            F.sin(half_dlat) * F.sin(half_dlat)
            + F.cos(F.radians(F.col("s_lat")))
            * F.cos(F.radians(F.col("c_lat")))
            * F.sin(half_dlon)
            * F.sin(half_dlon)
        )
    )
    hav = near.select("s_nationkey", km.alias("km"))
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    return (
        hav.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            r4(F.avg("km")).alias("avg_km"),
            r4(F.min("km")).alias("min_km"),
            r4(F.max("km")).alias("max_km"),
        )
        .orderBy("s_nationkey")
    )


# ------------------------------------------------------- Moran's I
@register(
    "g_moran_autocorr",
    oracle=f"""
WITH pts AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
         {_coords_sql('c_custkey', 'c')}
  FROM customer),
cells AS (
  SELECT (lat_micro - {LAT0}) // 1000000 AS cy,
         (lon_micro - {LON0}) // 1000000 AS cx,
         CAST(SUM(bal_cents) AS BIGINT) AS x
  FROM pts GROUP BY 1, 2),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM cells),
edges AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS w,
         SUM(CAST(a.x AS HUGEINT) * b.x) AS e_xy,
         SUM(CAST(a.x AS HUGEINT) + b.x) AS e_s
  FROM cells a JOIN cells b
    ON (a.cy = b.cy AND ABS(a.cx - b.cx) = 1)
    OR (a.cx = b.cx AND ABS(a.cy - b.cy) = 1))
SELECT n, w,
       FLOOR(
         (CAST(n AS DOUBLE) / w)
         * (CAST(e_xy AS DOUBLE)
            - (CAST(s AS DOUBLE) / n) * CAST(e_s AS DOUBLE)
            + w * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
         / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * CAST(s AS DOUBLE))
         * 1000000 + 0.5) / 1000000 AS moran_i
FROM base, edges
""",
    doc="global Moran's I spatial autocorrelation of per-cell balance "
    "totals under rook adjacency.  Every moment is an EXACT widened "
    "integer (Σx, Σx², directed-edge Σxᵢxⱼ and Σ(xᵢ+xⱼ), N, W) — the "
    "deviation algebra (xᵢ−x̄)(xⱼ−x̄) expands to moments so no float "
    "accumulates across rows; the statistic is one scalar double "
    "expression mirrored on both engines.  Scale: one cell groupBy + "
    "one self-equi-join on neighbor cells (4 shifted copies), two "
    "1-row reduces.",
)
def g_moran_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    lat, lon = _coords("c_custkey", "c")
    pts = load_table(spark, sf, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"), lat, lon
    )
    cells = (
        pts.withColumn("cy", ((F.col("lat_micro") - LAT0) / 1_000_000).cast("long"))
        .withColumn("cx", ((F.col("lon_micro") - LON0) / 1_000_000).cast("long"))
        .groupBy("cy", "cx")
        .agg(F.sum("bal_cents").alias("x"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = cells.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    # rook adjacency as an EQUI-join: explode the 4 neighbor offsets on
    # side a and match (a.cy+dy, a.cx+dx) == (b.cy, b.cx) — a hash join,
    # never the nested-loop all-pairs an OR-of-conjunctions condition
    # plans.  Each adjacent unordered pair contributes exactly the same
    # two directed edges the OR formulation yields.
    rook_off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
            ]
        )
    )
    a = (
        cells.select("*", rook_off.alias("o"))
        .select(
            (F.col("cy") + F.col("o.dy")).alias("ny"),
            (F.col("cx") + F.col("o.dx")).alias("nx"),
            F.col("x").alias("ax"),
        )
        .alias("a")
    )
    b = cells.alias("b")
    edges = a.join(
        b, (F.col("a.ny") == F.col("b.cy")) & (F.col("a.nx") == F.col("b.cx"))
    ).agg(
        F.count("*").alias("w"),
        F.sum(dec(F.col("a.ax")) * F.col("b.x")).alias("e_xy"),
        F.sum(dec(F.col("a.ax")) + F.col("b.x")).alias("e_s"),
    )
    j = base.crossJoin(edges)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("s") / F.col("n")
    moran = (
        (d("n") / F.col("w"))
        * (d("e_xy") - mean * d("e_s") + F.col("w") * (mean * mean))
        / (d("q") - mean * d("s"))
    )
    return j.select(
        "n", "w", (F.floor(moran * 1000000 + 0.5) / 1000000).alias("moran_i")
    )


# ----------------------------------------------- DBSCAN density roles
_DBSCAN_MINPTS = 3  # core iff >= 3 neighbors within eps (self excluded)


@register(
    "g_dbscan_core",
    oracle=f"""
WITH pts AS (SELECT c_custkey, {_coords_sql('c_custkey', 'c')} FROM customer),
pairs AS (
  SELECT a.c_custkey AS p, b.c_custkey AS q
  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
  WHERE (a.lat_micro - b.lat_micro) * (a.lat_micro - b.lat_micro)
        + (a.lon_micro - b.lon_micro) * (a.lon_micro - b.lon_micro) <= {R_SQ}),
cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM pairs GROUP BY p),
core AS (SELECT p FROM cnt WHERE n_neighbors >= {_DBSCAN_MINPTS}),
bord AS (SELECT DISTINCT pr.p FROM pairs pr JOIN core c ON pr.q = c.p)
SELECT t.c_custkey,
       COALESCE(cnt.n_neighbors, 0) AS n_neighbors,
       CASE WHEN core.p IS NOT NULL THEN 'core'
            WHEN bord.p IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts t
LEFT JOIN cnt ON cnt.p = t.c_custkey
LEFT JOIN core ON core.p = t.c_custkey
LEFT JOIN bord ON bord.p = t.c_custkey
ORDER BY t.c_custkey
""",
    doc="DBSCAN density classification (the clustering step before "
    "cluster expansion): every customer point is 'core' (>= minPts "
    "eps-neighbors), 'border' (non-core with a core neighbor), or "
    "'noise' — eps = 0.25 deg, minPts = 3, exact integer squared "
    "distances on the hash-derived microdegree coordinates.  Spark "
    "finds eps-neighbors with the SAME radius-sized 3x3 grid blocking "
    "as g_grid_neighbor_join (candidates O(points x local density), "
    "never all-pairs) and the DuckDB oracle is the brute-force cross "
    "join — the hash check is a completeness proof of the blocking.  "
    "Scale: one 9x-exploded equi-join, one partial-agg'd neighbor "
    "count, one edge-keyed semi-join for the border rule; the pair "
    "list is localCheckpointed because both the count and the "
    "border rule consume it.",
)
def g_dbscan_core(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.spatial import radius_join

    lat, lon = _coords("c_custkey", "c")
    pts = load_table(spark, sf, "customer").select("c_custkey", lat, lon)
    build = pts.select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("lat_micro").alias("b_lat"),
        F.col("lon_micro").alias("b_lon"),
    )
    pairs = (
        radius_join(pts, build, radius=R_MICRO, build_lat="b_lat", build_lon="b_lon")
        .where(F.col("c_custkey") != F.col("b_custkey"))
        .select(F.col("c_custkey").alias("p"), F.col("b_custkey").alias("q"))
        .localCheckpoint()  # feeds both the count and the border rule
    )
    cnt = pairs.groupBy("p").agg(F.count("*").alias("n_neighbors"))
    core = cnt.where(F.col("n_neighbors") >= _DBSCAN_MINPTS).select("p")
    bord = (
        pairs.join(core.withColumnRenamed("p", "q"), "q")
        .select("p")
        .distinct()
    )
    return (
        pts.join(cnt, pts.c_custkey == cnt.p, "left")
        .drop("p")
        .join(core.withColumn("is_core", F.lit(True)), pts.c_custkey == core.p, "left")
        .drop("p")
        .join(
            bord.withColumn("is_border", F.lit(True)),
            pts.c_custkey == bord.p,
            "left",
        )
        .drop("p")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("long").alias("n_neighbors"),
            F.when(F.col("is_core"), "core")
            .when(F.col("is_border"), "border")
            .otherwise("noise")
            .alias("role"),
        )
        .orderBy("c_custkey")
    )


# ----------------------------------------------- full DBSCAN clusters
@register(
    "g_dbscan_clusters",
    oracle=f"""
WITH RECURSIVE pts AS (SELECT c_custkey, {_coords_sql('c_custkey', 'c')} FROM customer),
pairs AS (
  SELECT a.c_custkey AS p, b.c_custkey AS q
  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
  WHERE (a.lat_micro - b.lat_micro) * (a.lat_micro - b.lat_micro)
        + (a.lon_micro - b.lon_micro) * (a.lon_micro - b.lon_micro) <= {R_SQ}),
cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM pairs GROUP BY p),
core AS (SELECT p FROM cnt WHERE n_neighbors >= {_DBSCAN_MINPTS}),
ce AS (SELECT pr.p AS u, pr.q AS v
       FROM pairs pr JOIN core ca ON pr.p = ca.p JOIN core cb ON pr.q = cb.p),
reach(u, v) AS (
  SELECT u, v FROM ce
  UNION
  SELECT r.u, e.v FROM reach r JOIN ce e ON r.v = e.u WHERE e.v <> r.u),
clabels AS (
  SELECT c.p AS node,
         COALESCE(LEAST(c.p, MIN(r.v)), c.p) AS cluster_id
  FROM core c LEFT JOIN reach r ON r.u = c.p GROUP BY c.p),
bord AS (
  SELECT pr.p, MIN(cl.cluster_id) AS cluster_id
  FROM pairs pr
  JOIN clabels cl ON cl.node = pr.q
  LEFT JOIN core self ON self.p = pr.p
  WHERE self.p IS NULL
  GROUP BY pr.p),
assigned AS (
  SELECT node AS c_custkey, cluster_id, 'core' AS role FROM clabels
  UNION ALL
  SELECT p, cluster_id, 'border' FROM bord),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM assigned GROUP BY cluster_id)
SELECT t.c_custkey,
       COALESCE(a.role, 'noise') AS role,
       COALESCE(a.cluster_id, -1) AS cluster_id,
       COALESCE(s.cluster_size, 0) AS cluster_size
FROM pts t
LEFT JOIN assigned a ON a.c_custkey = t.c_custkey
LEFT JOIN sizes s ON s.cluster_id = a.cluster_id
ORDER BY t.c_custkey
""",
    doc="FULL DBSCAN cluster assignment (completes g_dbscan_core's role "
    "classification): core points within eps link into clusters via "
    "connected components over the core-core edge list (density-"
    "reachability collapses to plain connectivity among cores), border "
    "points attach to the MINIMUM cluster id among their core "
    "neighbors (the deterministic stand-in for DBSCAN's first-visitor "
    "tie rule), noise stays at cluster_id -1.  Cluster labels are "
    "minimum member ids, sizes count core + border members.  Scale: "
    "eps-neighbors ride the 3x3 radius grid join (never all-pairs); "
    "CC is the large-star/small-star operator (2 shuffles/round, "
    "localCheckpoint per round); the border attach is one edge-keyed "
    "join + min-agg.  The oracle replays connectivity with a "
    "recursive CTE and the hash check proves the blocked+iterative "
    "plan equals brute-force DBSCAN.",
)
def g_dbscan_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import connected_components
    from ..operators.spatial import radius_join

    lat, lon = _coords("c_custkey", "c")
    pts = load_table(spark, sf, "customer").select("c_custkey", lat, lon)
    build = pts.select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("lat_micro").alias("b_lat"),
        F.col("lon_micro").alias("b_lon"),
    )
    pairs = (
        radius_join(pts, build, radius=R_MICRO, build_lat="b_lat", build_lon="b_lon")
        .where(F.col("c_custkey") != F.col("b_custkey"))
        .select(F.col("c_custkey").alias("p"), F.col("b_custkey").alias("q"))
        .localCheckpoint()  # feeds the count, the edge list, and the border attach
    )
    cnt = pairs.groupBy("p").agg(F.count("*").alias("n_neighbors"))
    core = cnt.where(F.col("n_neighbors") >= _DBSCAN_MINPTS).select("p").localCheckpoint()
    ce = (
        pairs.join(core, "p")
        .join(core.withColumnRenamed("p", "q"), "q")
        .select(F.col("p").alias("id_a"), F.col("q").alias("id_b"))
    )
    cc = connected_components(ce)  # (node, component) — min-id labels
    clabels = (
        core.join(cc, core.p == cc.node, "left")
        .select(
            F.col("p").alias("node"),
            F.coalesce(F.col("component"), F.col("p")).alias("cluster_id"),
        )
        .localCheckpoint()  # feeds the border attach and the union
    )
    bord = (
        pairs.join(clabels.withColumnRenamed("node", "q"), "q")
        .join(core, "p", "left_anti")
        .groupBy("p")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    assigned = clabels.select(
        F.col("node").alias("c_custkey"), "cluster_id", F.lit("core").alias("role")
    ).unionByName(
        bord.select(F.col("p").alias("c_custkey"), "cluster_id", F.lit("border").alias("role"))
    ).localCheckpoint()  # feeds sizes and the final join
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        pts.select("c_custkey")
        .join(assigned, "c_custkey", "left")
        .join(sizes, "cluster_id", "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
            F.coalesce(F.col("cluster_id"), F.lit(-1)).cast("long").alias("cluster_id"),
            F.coalesce(F.col("cluster_size"), F.lit(0)).cast("long").alias("cluster_size"),
        )
        .orderBy("c_custkey")
    )


# ------------------------------------------------------ point-in-polygon
# Non-convex hexagon inside the shared 10x10-degree box; vertices as
# (lon_offset, lat_offset) microdegrees from (LON0, LAT0).  The same
# Python list generates the IDENTICAL expression text for Spark and
# DuckDB, so the integer ray-cast arithmetic cannot diverge.
_PIP_POLY = [
    (2_000_000, 1_000_000),
    (8_000_000, 2_000_000),
    (5_000_000, 4_000_000),
    (9_000_000, 7_000_000),
    (3_000_000, 9_000_000),
    (1_000_000, 5_000_000),
]


def _pip_inside_sql(px: str, py: str) -> str:
    """Odd-crossings ray cast, fully unrolled and integer-exact.

    For edge (x1,y1)->(x2,y2): the +x ray from (px,py) crosses iff the
    edge straddles py AND the point sits left of the edge at height py.
    The left-of test multiplies through by (y2-y1) to stay in int64
    (products bounded by SPAN^2 = 1e14): with d = (x2-x1)*(py-y1) -
    (px-x1)*(y2-y1), the crossing sign test is d>0 when y2>y1 else d<0.
    """
    terms = []
    n = len(_PIP_POLY)
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        x1, y1 = x1 + LON0, y1 + LAT0
        x2, y2 = x2 + LON0, y2 + LAT0
        d = f"(({x2} - {x1}) * ({py} - {y1}) - ({px} - {x1}) * ({y2} - {y1}))"
        straddle = f"(({y1} > {py}) <> ({y2} > {py}))"
        sign = f"({d} > 0)" if y2 > y1 else f"({d} < 0)"
        terms.append(f"(CASE WHEN {straddle} AND {sign} THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


@register(
    "g_point_in_polygon",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
         {{coords}}
  FROM customer),
flagged AS (
  SELECT c_mktsegment, bal_cents,
         CASE WHEN {{inside}} THEN 1 ELSE 0 END AS inside
  FROM pts)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(inside) AS BIGINT) AS n_inside,
       FLOOR(CAST(SUM(inside) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
         AS share_inside,
       FLOOR(SUM(CASE WHEN inside = 1 THEN bal_cents ELSE 0 END) / 100.0 * 100
             + 0.5) / 100 AS bal_inside_dollars
FROM flagged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""".format(coords=_coords_sql("c_custkey", "c"),
           inside=_pip_inside_sql("lon_micro", "lat_micro")),
    doc="point-in-polygon containment (the geofencing primitive the grid/"
    "radius family lacked): every customer point ray-cast against a "
    "fixed NON-convex hexagon, rolled up per market segment with the "
    "inside share and inside balance.  The odd-crossings test is "
    "unrolled per edge from one shared vertex list into IDENTICAL "
    "integer expression text on both engines — the left-of-edge test "
    "multiplies through by (y2-y1), so there is no division and no "
    "float anywhere in the containment decision (products bounded by "
    "SPAN^2 = 1e14, far under int64).  Scale: pure map-side expression "
    "work (|polygon| CASE terms per row) into one small groupBy — at "
    "100 TB the polygon test rides WholeStageCodegen at scan speed; for "
    "many polygons, broadcast a polygon table and pre-filter candidates "
    "by bounding-box cell (the g_grid_neighbor_join blocking) before "
    "the exact test.",
)
def g_point_in_polygon(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        *_coords("c_custkey", "c"),
    )
    inside = F.expr(_pip_inside_sql("lon_micro", "lat_micro"))
    flagged = pts.select(
        "c_mktsegment",
        "bal_cents",
        F.when(inside, 1).otherwise(0).alias("inside"),
    )
    share = F.sum("inside").cast("double") / F.count("*")
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("inside").cast("long").alias("n_inside"),
            (F.floor(share * 1000000 + 0.5) / 1000000).alias("share_inside"),
            (
                F.floor(
                    F.sum(F.when(F.col("inside") == 1, F.col("bal_cents")).otherwise(0))
                    / 100.0
                    * 100
                    + 0.5
                )
                / 100
            ).alias("bal_inside_dollars"),
        )
        .orderBy("c_mktsegment")
    )
