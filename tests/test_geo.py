"""Geo catalog semantics: the DuckDB parity gate proves Spark == oracle;
these pin that BOTH equal an independent Python brute force — blocking
completeness, haversine geometry, and the Moran's I moment algebra."""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from spark_fuse_spark.catalog import load_all
from spark_fuse_spark.catalog.geo import ENC, LAT0, LON0, R_SQ, SPAN

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _coords(key: int, prefix: str) -> tuple[int, int]:
    return (
        LAT0 + _h(f"{key}{prefix}lat") % SPAN,
        LON0 + _h(f"{key}{prefix}lon") % SPAN,
    )


def _table_keys(sf: str, table: str, col: str) -> list[int]:
    import duckdb

    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT {col} FROM read_parquet('{sf}/{table}.parquet')"
        ).fetchall()
    ]


def test_grid_neighbor_join_matches_python_bruteforce(spark):
    """Every supplier's in-radius neighbor count and nearest customer from
    the 3×3-blocked join equal the all-pairs Python scan — the blocking
    provably loses nothing (independent of the DuckDB twin, which proves
    the same via the cross-join oracle)."""
    sups = _table_keys(SF, "supplier", "s_suppkey")
    custs = _table_keys(SF, "customer", "c_custkey")
    cpts = [(c, *_coords(c, "c")) for c in custs]
    expected = {}
    for s in sups:
        slat, slon = _coords(s, "s")
        best, n = None, 0
        for c, clat, clon in cpts:
            d = (slat - clat) ** 2 + (slon - clon) ** 2
            if d <= R_SQ:
                n += 1
                enc = d * ENC + c
                best = enc if best is None else min(best, enc)
        if n:
            expected[s] = (n, best // ENC, best % ENC)
    rows = load_all()["g_grid_neighbor_join"].spark(spark, SF).collect()
    got = {r.s_suppkey: (r.n_within, r.dist_sq, r.c_custkey) for r in rows}
    assert got == expected
    assert expected, "radius too small — test would be vacuous"


def test_haversine_zero_and_bounds(spark):
    """Nearest-pair haversine distances are positive and bounded by the
    0.25° radius diagonal (~39 km at 40°N); the per-nation aggregates
    respect min ≤ avg ≤ max."""
    rows = load_all()["g_haversine_nearest"].spark(spark, SF_MED).collect()
    assert rows
    # 0.25° lat ≈ 27.8 km, 0.25° lon ≤ 21.3 km at 40°N → diagonal < 36 km
    for r in rows:
        assert 0.0 < r.min_km <= r.avg_km <= r.max_km < 40.0


def test_moran_matches_numpy_definition(spark):
    """Moran's I from the exact integer moments equals the textbook
    double-loop deviation formula computed in numpy."""
    import duckdb

    bal = duckdb.sql(
        f"SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) "
        f"FROM read_parquet('{SF_MED}/customer.parquet')"
    ).fetchall()
    cells: dict[tuple[int, int], int] = {}
    for ck, cents in bal:
        lat, lon = _coords(ck, "c")
        key = ((lat - LAT0) // 1_000_000, (lon - LON0) // 1_000_000)
        cells[key] = cells.get(key, 0) + cents
    keys = list(cells)
    x = np.array([cells[k] for k in keys], dtype=float)
    xbar = x.mean()
    idx = {k: i for i, k in enumerate(keys)}
    num, w = 0.0, 0
    for (cy, cx), i in idx.items():
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            j = idx.get((cy + dy, cx + dx))
            if j is not None:
                num += (x[i] - xbar) * (x[j] - xbar)
                w += 1
    expect = (len(x) / w) * num / ((x - xbar) ** 2).sum()
    (r,) = load_all()["g_moran_autocorr"].spark(spark, SF_MED).collect()
    assert (r.n, r.w) == (len(x), w)
    assert r.moran_i == pytest.approx(expect, abs=2e-6)
    # hash coordinates are spatially random → I ≈ -1/(N-1), far from ±1
    assert abs(r.moran_i) < 0.5


def test_geo_cells_top20_matches_python_bruteforce(spark):
    """The registered top-20 densest cells (count, exact cent total,
    floor-mean centroid, total tie-break) equal a from-scratch Python
    grid build."""
    import duckdb

    bal = duckdb.sql(
        f"SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) "
        f"FROM read_parquet('{SF_MED}/customer.parquet')"
    ).fetchall()
    cells: dict[tuple[int, int], list[int]] = {}
    for ck, cents in bal:
        lat, lon = _coords(ck, "c")
        key = ((lat - LAT0) // 1_000_000, (lon - LON0) // 1_000_000)
        agg = cells.setdefault(key, [0, 0, 0, 0])  # n, cents, lat_sum, lon_sum
        agg[0] += 1
        agg[1] += cents
        agg[2] += lat
        agg[3] += lon
    expect = sorted(
        (
            (cy, cx, n, cents, lat_s // n, lon_s // n)
            for (cy, cx), (n, cents, lat_s, lon_s) in cells.items()
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    rows = load_all()["g_geo_cells"].spark(spark, SF_MED).collect()
    got = [
        (r.cell_y, r.cell_x, r.n_customers, r.balance_cents,
         r.centroid_lat, r.centroid_lon)
        for r in rows
    ]
    assert got == expect


def test_radius_join_operator_synthetic(spark):
    """Operator-level check on a hand-built grid: pairs straddling cell
    boundaries are found (the 3×3 neighborhood matters), out-of-radius
    pairs are not, and invalid inputs fail loudly."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.spatial import nearest_within, radius_join

    probe = spark.createDataFrame(
        [(1, 1000, 1000), (2, 5000, 5000)], "pid long, lat_micro long, lon_micro long"
    )
    build = spark.createDataFrame(
        [(10, 1099, 1000),   # 99 away from p1 — in radius, SAME cell
         (11, 901, 1000),    # 99 away from p1 — in radius, ADJACENT cell
         (12, 1000, 1101),   # 101 away from p1 — out of radius
         (13, 5000, 5000)],  # exactly on p2
        "bid long, b_lat long, b_lon long",
    )
    pairs = radius_join(
        probe, build, radius=100, build_lat="b_lat", build_lon="b_lon"
    )
    got = {(r.pid, r.bid): r.dist_sq for r in pairs.collect()}
    assert got == {(1, 10): 99 * 99, (1, 11): 99 * 99, (2, 13): 0}
    near = {
        r.pid: (r.n_within, r.dist_sq, r.bid)
        for r in nearest_within(pairs, ["pid"], "bid", id_bound=100).collect()
    }
    assert near == {1: (2, 99 * 99, 10), 2: (1, 0, 13)}

    with pytest.raises(ValueError, match="radius"):
        radius_join(probe, build, radius=0, build_lat="b_lat", build_lon="b_lon")
    with pytest.raises(ValueError, match="collision"):
        radius_join(probe, probe.withColumnRenamed("lat_micro", "b_lat"),
                    radius=10, build_lat="b_lat", build_lon="lon_micro")


def test_nearest_within_decodes_exactly_past_double_precision(spark):
    """Regression: the min-encoding decode must be integer division.
    dist_sq = 2^51+1 with id_bound=4 and id=3 encodes to 2^53+7, which
    double arithmetic rounds to 2^53+8 — a float decode returns
    dist_sq+1; the exact decode returns the true value."""
    from spark_fuse_spark.operators.spatial import nearest_within

    dist = (1 << 51) + 1
    pairs = spark.createDataFrame(
        [(0, dist, 3)], "pid long, dist_sq long, bid long"
    )
    (r,) = nearest_within(pairs, ["pid"], "bid", id_bound=4).collect()
    assert (r.n_within, r.dist_sq, r.bid) == (1, dist, 3)


def test_point_in_polygon_matches_python_raycast(spark):
    """The unrolled integer ray-cast expression vs an INDEPENDENT pure-
    Python implementation (float half-plane form) on a deterministic grid
    of probe points covering inside, outside, and near-vertex cases —
    validates the non-convex geometry itself, not just oracle textual
    agreement."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.catalog.geo import LAT0, LON0, _PIP_POLY, _pip_inside_sql

    poly = [(x + LON0, y + LAT0) for x, y in _PIP_POLY]

    def py_inside(px, py):
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                x_cross = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < x_cross:
                    inside = not inside
        return inside

    import random

    rng = random.Random(13)
    probes = [
        (LON0 + rng.randrange(0, 10_000_001), LAT0 + rng.randrange(0, 10_000_001))
        for _ in range(400)
    ]
    # plus points hugging each vertex (the numerically nasty region)
    for vx, vy in poly:
        for dx in (-3, 3):
            for dy in (-3, 3):
                probes.append((vx + dx, vy + dy))
    df = spark.createDataFrame(probes, "px long, py long")
    got = {
        (r.px, r.py): r.inside
        for r in df.select(
            "px", "py", F.expr(_pip_inside_sql("px", "py")).alias("inside")
        ).collect()
    }
    mismatches = [(p, got[p], py_inside(*p)) for p in got if got[p] != py_inside(*p)]
    assert not mismatches, mismatches[:5]
    assert 0 < sum(got.values()) < len(got)  # both classes exercised
