"""Metric point buffers and rings (reference plp buffer/ring paths,
``/root/reference/geoparse/karta.py:806-846``: UTM buffer of points =
circle polygon; ring = outer − inner buffer).

The reference buffers by reprojecting to UTM and calling shapely buffer;
our circles are generated directly on the sphere with the great-circle
destination formula (R = 6371008.8, the haversine radius, gutils.py:227):

    φ2 = asin(sin φ1 cos δ + cos φ1 sin δ cos θ)
    λ2 = λ1 + atan2(sin θ sin δ cos φ1, cos δ − sin φ1 sin φ2)

All JVM column trig (codegen, SQL-expressible → exact DuckDB oracle);
the exploded (point, vertex) relation is the circle polygon; a ring is
the same with two radii (outer shell + inner hole).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo import distance as dist


def _dest(lat: Column, lon: Column, radius_m: float, theta: Column) -> tuple[Column, Column]:
    delta = radius_m / dist.EARTH_RADIUS_M  # angular distance
    phi1 = F.radians(lat)
    lam1 = F.radians(lon)
    sin_phi2 = F.sin(phi1) * F.lit(math.cos(delta)) + F.cos(phi1) * F.lit(
        math.sin(delta)
    ) * F.cos(theta)
    phi2 = F.asin(sin_phi2)
    lam2 = lam1 + F.atan2(
        F.sin(theta) * F.lit(math.sin(delta)) * F.cos(phi1),
        F.lit(math.cos(delta)) - F.sin(phi1) * sin_phi2,
    )
    return F.degrees(phi2), F.degrees(lam2)


def point_buffer_vertices(
    points_df: DataFrame,
    radius_m: float,
    *,
    n_vertices: int = 16,
    lat: str = "lat",
    lon: str = "lon",
    ring_label: str | None = None,
) -> DataFrame:
    """Explode each point into its circle-polygon vertices:
    point columns + (vertex int, v_lat, v_lon [, ring])."""
    out = points_df.withColumn(
        "vertex", F.explode(F.sequence(F.lit(0), F.lit(n_vertices - 1)))
    )
    theta = F.col("vertex") * F.lit(2.0 * math.pi / n_vertices)
    vlat, vlon = _dest(F.col(lat), F.col(lon), radius_m, theta)
    out = out.withColumn("v_lat", vlat).withColumn("v_lon", vlon)
    if ring_label is not None:
        out = out.withColumn("ring", F.lit(ring_label))
    return out


def point_ring_vertices(
    points_df: DataFrame,
    inner_m: float,
    outer_m: float,
    *,
    n_vertices: int = 16,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Annulus: outer shell + inner hole vertex sets (ring ∈
    {'outer','inner'}) — the reference's ring = difference of two buffers
    (karta.py:826-846), represented as shell+hole per our WKB model."""
    outer = point_buffer_vertices(
        points_df, outer_m, n_vertices=n_vertices, lat=lat, lon=lon, ring_label="outer"
    )
    inner = point_buffer_vertices(
        points_df, inner_m, n_vertices=n_vertices, lat=lat, lon=lon, ring_label="inner"
    )
    return outer.unionByName(inner)


def dest_sql(lat: str, lon: str, radius_m: float, theta: str) -> tuple[str, str]:
    """DuckDB mirror of _dest (same constant folding: cos/sin of delta are
    Python-computed literals in BOTH engines)."""
    cd = repr(math.cos(radius_m / dist.EARTH_RADIUS_M))
    sd = repr(math.sin(radius_m / dist.EARTH_RADIUS_M))
    phi1 = f"radians({lat})"
    lam1 = f"radians({lon})"
    sin_phi2 = f"(sin({phi1}) * {cd} + cos({phi1}) * {sd} * cos({theta}))"
    vlat = f"degrees(asin({sin_phi2}))"
    vlon = (
        f"degrees({lam1} + atan2(sin({theta}) * {sd} * cos({phi1}), "
        f"{cd} - sin({phi1}) * {sin_phi2}))"
    )
    return vlat, vlon
