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


def test_rect_fast_path_matches_kernel_refine(spark):
    """The rectilinear zero-Python specialization (refine="auto" over a
    bbox-exact polygon set) must agree row-for-row with the general Arrow
    PIP refine (refine="force") — including points that land exactly on
    region edges (the half-open tie semantics)."""
    pts = _skewed_points(spark)
    regions = src.regions(spark)
    # add points exactly ON region bbox edges to pin the tie behavior
    edges = regions.select(
        F.concat(F.lit("e"), F.col("region_idx").cast("string")).alias("url"),
        F.lit("edge").alias("entity"),
        F.col("miny").alias("lat"),
        F.col("minx").alias("lon"),
    ).unionByName(
        regions.select(
            F.concat(F.lit("E"), F.col("region_idx").cast("string")).alias("url"),
            F.lit("edge").alias("entity"),
            F.col("maxy").alias("lat"),
            F.col("maxx").alias("lon"),
        )
    )
    pts = pts.unionByName(edges)
    kw = dict(poly_id="region_id", precision=4, strategy="broadcast",
              point_cols=("url", "entity", "lat", "lon"))
    fast = pj.pip_join(pts, regions, **kw).orderBy("url", "region_id").collect()
    slow = pj.pip_join(pts, regions, refine="force", **kw).orderBy(
        "url", "region_id"
    ).collect()
    assert fast == slow
    assert len(fast) > 0


def test_polygon_is_rect_detection():
    from geospatial_spark.geo import geom as gm

    assert gm.polygon_is_rect(gm.polygon([(0, 0), (2, 0), (2, 1), (0, 1)]))
    # bowtie traversal of the same corners is NOT a rect
    assert not gm.polygon_is_rect(gm.polygon([(0, 0), (2, 1), (2, 0), (0, 1)]))
    # triangle / pentagon / holed rect are not
    assert not gm.polygon_is_rect(gm.polygon([(0, 0), (2, 0), (1, 1)]))
    assert not gm.polygon_is_rect(
        gm.polygon([(0, 0), (2, 0), (2, 1), (0, 1)], holes=[[(0.5, 0.2), (1, 0.2), (1, 0.8), (0.5, 0.8)]])
    )
