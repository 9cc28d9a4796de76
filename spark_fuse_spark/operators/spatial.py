"""Distributed spatial primitives: grid cells and radius joins.

Everything operates on INTEGER microdegrees (1e-6°) — exact arithmetic
end-to-end, so results are engine-portable and never depend on float
rounding.  Haversine (or any metric refinement) belongs AFTER the
candidate stage, over the few survivors.

Scale contract — the whole point of the module:

* :func:`with_grid_cell` is a pure per-row projection (no shuffle).
* :func:`radius_join` blocks on a radius-sized grid: each probe row
  explodes the 9 cells of its 3×3 neighborhood, which PROVABLY contains
  every point within ``radius`` (cell size == radius, so any point
  closer than R lies in the same or an adjacent cell).  The join is an
  equi-join on the cell id — candidate count is O(rows × local
  density), never the all-pairs cross join.  Catalyst picks
  broadcast/shuffle per side statistics; at 100 TB both sides hash-
  partition by cell, and skewed cells are split by AQE.
* :func:`nearest_within` reduces candidates per probe row with an exact
  integer ``dist_sq * K + id`` encoding — a plain ``min`` aggregate, no
  window, with the id as the deterministic tie-break.

The catalog twins (`catalog/geo.py`) differential-test the blocking
against a brute-force cross-join oracle at every checked scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_grid_cell", "radius_join", "nearest_within"]


def _cell(col: Column, size: int) -> Column:
    # values are non-negative microdegrees in this repo's geo conventions;
    # floor-divide via double is exact for |v| < 2^53
    return F.floor(col / F.lit(size)).cast("long")


def with_grid_cell(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    cell_size: int,
    y_col: str = "cell_y",
    x_col: str = "cell_x",
) -> DataFrame:
    """Add integer grid-cell coordinates (per-row projection, no shuffle)."""
    return df.withColumn(y_col, _cell(F.col(lat_col), cell_size)).withColumn(
        x_col, _cell(F.col(lon_col), cell_size)
    )


def radius_join(
    probe: DataFrame,
    build: DataFrame,
    radius: int,
    probe_lat: str = "lat_micro",
    probe_lon: str = "lon_micro",
    build_lat: str = "lat_micro",
    build_lon: str = "lon_micro",
    dist_col: str = "dist_sq",
) -> DataFrame:
    """All (probe, build) pairs within ``radius`` (squared-Euclidean on
    integer microdegrees), via radius-sized grid blocking.

    Returns probe columns + build columns + ``dist_col`` (exact bigint
    squared distance ≤ radius²).  Column names must not collide except
    the coordinate columns, which may be shared names — the build side's
    coordinates then come back as ``build_<name>``.  The probe side pays
    a 9× explode; put the SMALLER side there when sizes are lopsided.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    r_sq = radius * radius
    overlap = set(probe.columns) & set(build.columns) - {probe_lat, probe_lon}
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    b_lat = f"__b_{build_lat}"
    b_lon = f"__b_{build_lon}"
    build_c = with_grid_cell(
        build.withColumnRenamed(build_lat, b_lat).withColumnRenamed(build_lon, b_lon),
        b_lat,
        b_lon,
        radius,
        "__cy",
        "__cx",
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )
    probe_c = (
        probe.select("*", offsets.alias("__o"))
        .withColumn("__cy", _cell(F.col(probe_lat), radius) + F.col("__o.dy"))
        .withColumn("__cx", _cell(F.col(probe_lon), radius) + F.col("__o.dx"))
        .drop("__o")
    )
    d_lat = F.col(probe_lat) - F.col(b_lat)
    d_lon = F.col(probe_lon) - F.col(b_lon)
    return (
        probe_c.join(build_c, ["__cy", "__cx"])
        .withColumn(dist_col, d_lat * d_lat + d_lon * d_lon)
        .where(F.col(dist_col) <= r_sq)
        .drop("__cy", "__cx")
        .withColumnRenamed(
            b_lat, build_lat if build_lat not in probe.columns else f"build_{build_lat}"
        )
        .withColumnRenamed(
            b_lon, build_lon if build_lon not in probe.columns else f"build_{build_lon}"
        )
    )


def nearest_within(
    pairs: DataFrame,
    group_cols: list[str],
    id_col: str,
    dist_col: str = "dist_sq",
    id_bound: int = 10_000_000,
) -> DataFrame:
    """Per-group neighbor count + argmin over radius-join candidates.

    Encodes ``dist_sq * id_bound + id`` into one bigint so the nearest
    row (ties broken by smallest id) is a plain ``min`` aggregate — no
    window, map-side combined.  Requires ``0 <= id < id_bound`` and
    ``dist_sq * id_bound + id < 2^63`` (callers pick ``id_bound``).
    """
    enc = F.min(F.col(dist_col) * id_bound + F.col(id_col)).alias("__enc")
    out = pairs.groupBy(*group_cols).agg(F.count("*").alias("n_within"), enc)
    # decode with INTEGER division: `/` on longs goes through double, and
    # enc can exceed 2^53 (e.g. the geo family's dist_sq*1e7 + id reaches
    # 6.25e17), where double rounding shifts the quotient by ±1 for ids
    # within an ulp of the encoding boundary
    return out.select(
        *group_cols,
        "n_within",
        F.expr(f"__enc div {id_bound}L").alias(dist_col),
        (F.col("__enc") % id_bound).alias(id_col),
    )
