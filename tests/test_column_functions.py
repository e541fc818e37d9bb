"""JVM Column-helper goldens: color_map (K1 exact reference semantics),
UTM zone, tile math — checked against independently computed values."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from geospatial_spark.functions import udfs


def _ref_color_idx(s: str) -> int:
    # the reference's executed semantics (karta.py:100-102): strip, base-36
    return int(re.sub(r"[\W_]+", "", s), 36) % 24


def test_color_idx_matches_reference_semantics(spark):
    samples = ["Category1", "Example", "London", "city_042", "Tokyo", "a", "Z9"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: (r["idx"], r["hex"])
        for r in df.select(
            "s", udfs.color_idx_col(F.col("s")).alias("idx")
        )
        .withColumn("hex", udfs.color_hex_from_idx(F.col("idx")))
        .collect()
    }
    for s in samples:
        want = _ref_color_idx(s)
        assert got[s][0] == want, s
        assert got[s][1] == udfs.COLOR_PALETTE[want], s


def test_utm_epsg_golden(spark):
    # gutils.py:117-120: polygon near (-120.5, 35.5) → EPSG:32610
    df = spark.createDataFrame([(35.5, -120.5)], "lat double, lon double")
    got = df.select(
        udfs.utm_epsg_col(F.col("lat"), F.col("lon")).alias("e")
    ).collect()[0]["e"]
    assert got == 32610


def test_ann_ivf_tiny_corpus_nonempty(spark):
    """Round-2 advice: with < ~32 vectors ivf_centroid_step returns 1 and the
    old `id % 1 == 1` filter selected ZERO centroids → silently empty result.
    The `1 % step` form makes every vector a centroid in that regime."""
    from geospatial_spark.operators import similarity as sim

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(64)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = sim.ann_ivf_topk(df, query_mod=2, k=3).collect()
    assert len(out) > 0
    # every query id got at least one neighbor
    assert {r["query_id"] for r in out} == {0, 2, 4, 6, 8}


def test_tile_golden(spark):
    # Paris z12 == (2074, 1409) (public OSM slippy-map fact)
    df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
    r = df.select(
        udfs.tile_x_col(F.col("lon"), 12).alias("x"),
        udfs.tile_y_col(F.col("lat"), 12).alias("y"),
    ).collect()[0]
    assert (r["x"], r["y"]) == (2074, 1409)


def test_geohash_int_col_matches_kernel(spark):
    """The JVM pointcell code (geohash_int_col) must equal the numpy
    kernel's interleaved code for the same coords at every precision used
    by the joins — incl. the ±180/±90 clamp edges and cell-boundary
    coordinates."""
    import numpy as np

    from geospatial_spark.geo import geohash as gh
    from geospatial_spark.sources.constants import LCG_A, LCG_C, LCG_M

    rng = [(float(lat), float(lon)) for lat, lon in [
        (0.0, 0.0), (90.0, 180.0), (-90.0, -180.0), (89.999999, 179.999999),
        (-89.999999, -179.999999), (48.8584, 2.2945), (51.5074, -0.1278),
        (-33.8688, 151.2093), (0.17578125, 0.3515625),  # exact p4 cell corner
        (45.0, 45.0), (-0.0000001, -0.0000001),
    ]]
    # + deterministic pseudo-random sweep (LCG so no random() in tests)
    x = 12345
    for _ in range(200):
        x = (x * LCG_A + LCG_C) % LCG_M
        lat = (x / LCG_M) * 180.0 - 90.0
        x = (x * LCG_A + LCG_C) % LCG_M
        lon = (x / LCG_M) * 360.0 - 180.0
        rng.append((lat, lon))

    df = spark.createDataFrame(rng, "lat double, lon double")
    for p in (2, 4, 5, 7):
        got = [
            r["c"]
            for r in df.select(
                udfs.geohash_int_col(F.col("lat"), F.col("lon"), p).alias("c")
            ).collect()
        ]
        lats = np.array([t[0] for t in rng])
        lons = np.array([t[1] for t in rng])
        want = gh.cells_to_codes(gh.encode(lats, lons, p), p)
        assert got == [int(w) for w in want], f"precision {p}"


def test_rect_fully_inside_polygon():
    from geospatial_spark.geo import geom as gm

    poly = gm.polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    assert gm.rect_fully_inside_polygon(2, 2, 8, 8, poly)
    assert not gm.rect_fully_inside_polygon(-1, 2, 8, 8, poly)   # corner out
    assert not gm.rect_fully_inside_polygon(0, 0, 10, 10, poly)  # touches edges
    assert not gm.rect_fully_inside_polygon(2, 2, 10.5, 8, poly)  # crosses
    # hole strictly inside the candidate rect -> not full
    holed = gm.polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]]
    )
    assert not gm.rect_fully_inside_polygon(2, 2, 8, 8, holed)
    # rect clear of the hole -> full
    assert gm.rect_fully_inside_polygon(1, 1, 3, 3, holed)
    # hole edge crossing the rect -> not full
    assert not gm.rect_fully_inside_polygon(2, 2, 5, 5, holed)


def test_trans_proj_udf_golden_and_roundtrip(spark):
    """U3 surface (gutils.py:143-183): 4326→UTM golden (Eiffel Tower,
    published 31N ≈ 448252 E / 5411955 N), 4326→3857→4326 roundtrip, and
    UDF output == kernel output."""
    import numpy as np

    from geospatial_spark.geo import geom as gm

    pts = [(2.2945, 48.8584), (151.2, -33.9), (-120.5, 35.5), (0.01, 0.01)]
    df = spark.createDataFrame(pts, "x double, y double")

    utm = df.select(
        "x", "y", udfs.trans_proj_udf(4326, 32631)(F.col("x"), F.col("y")).alias("p")
    ).select("x", "y", "p.x", "p.y")
    eiffel = [r for r in utm.collect() if abs(r[0] - 2.2945) < 1e-9][0]
    assert abs(eiffel[2] - 448252.0) < 1.0
    assert abs(eiffel[3] - 5411954.9) < 1.0

    # roundtrip through 3857 restores the input to < 1e-9 deg
    rt = (
        df.select(
            "x", "y",
            udfs.trans_proj_udf(4326, 3857)(F.col("x"), F.col("y")).alias("m"),
        )
        .select(
            "x", "y",
            udfs.trans_proj_udf(3857, 4326)(F.col("m.x"), F.col("m.y")).alias("b"),
        )
        .collect()
    )
    for r in rt:
        assert abs(r["b"]["x"] - r["x"]) < 1e-9
        assert abs(r["b"]["y"] - r["y"]) < 1e-9

    # UDF == kernel, bit-identical (same numpy path)
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    kx, ky = gm.trans_proj(xs, ys, 4326, 32631)
    got = {(r["x"], r["y"]): (r[2], r[3]) for r in utm.collect()}
    for i, p in enumerate(pts):
        gx, gy = got[p]
        assert gx == kx[i] and gy == ky[i]


def test_trans_proj_crs_hemisphere_semantics():
    """EPSG 327xx always carries the 1e7 false northing, 326xx never —
    by CRS, not by the point's hemisphere (pyproj semantics)."""
    import numpy as np

    from geospatial_spark.geo import geom as gm

    # northern point in a southern CRS: northing > 1e7
    _, n = gm.trans_proj(np.array([151.2]), np.array([2.0]), 4326, 32756)
    assert n[0] > 1e7
    # southern point in a northern CRS: negative northing
    _, n2 = gm.trans_proj(np.array([151.2]), np.array([-2.0]), 4326, 32656)
    assert n2[0] < 0
    # and both invert exactly through the matching CRS
    x, y = gm.trans_proj(np.array([151.2]), np.array([2.0]), 4326, 32756)
    lo, la = gm.trans_proj(x, y, 32756, 4326)
    assert abs(lo[0] - 151.2) < 1e-8 and abs(la[0] - 2.0) < 1e-8
