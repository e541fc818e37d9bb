"""Extreme-skew PIP join (north rule N5): every point in one megacity
cell — the salted shuffle plan must agree exactly with the broadcast plan
and actually salt (replicate the heavy cell's polygon rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_spark.operators import pip_join as pj
from geospatial_spark.sources import constants as C
from geospatial_spark.sources import pages as src


def _skewed_points(spark, n=20_000):
    """n points jittered deterministically around London (one geohash-4
    cell dominates) + a sparse uniform background."""
    lond = [m for m in C.MEGACITIES if m[0] == "London"][0]
    base = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.lit("London").alias("entity"),
        (F.lit(lond[1]) + (F.col("id") % 100) * 1e-5).alias("lat"),
        (F.lit(lond[2]) + (F.col("id") % 97) * 1e-5).alias("lon"),
    )
    bg = spark.range(200).select(
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("url"),
        F.lit("bg").alias("entity"),
        (F.col("id") % 120 - 60.0).cast("double").alias("lat"),
        (F.col("id") % 340 - 170.0).cast("double").alias("lon"),
    )
    return base.unionByName(bg)


def test_salted_shuffle_matches_broadcast_under_skew(spark):
    pts = _skewed_points(spark)
    regions = src.regions(spark)
    kw = dict(poly_id="region_id", precision=4, point_cols=("url", "entity"))
    bc = pj.pip_join(pts, regions, strategy="broadcast", **kw)
    sh = pj.pip_join(
        pts, regions, strategy="shuffle", salt=8, heavy_cell_rows=1000, **kw
    )
    key = lambda r: (r["url"], r["region_id"])
    got_bc = sorted(map(key, bc.collect()))
    got_sh = sorted(map(key, sh.collect()))
    assert got_bc == got_sh
    assert len(got_bc) >= 20_000  # the skewed cell sits inside region_44+ boxes
