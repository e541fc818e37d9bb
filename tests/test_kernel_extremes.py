"""Kernel behavior at the coordinate extremes the hypothesis strategies
exclude (they bound lat to ±85 / lon to ±179.999; the r4 int64-shoelace
bug taught that fixtures clustered near benign inputs hide whole hazard
classes).  Covers the exact poles/antimeridian for geohash and S2
(including level 30 and token/parent algebra) and pins vincenty's
documented NaN-on-non-convergence divergence (the reference raises
ValueError there — gutils.py:299-300; a vectorized kernel can't raise
per-row, so NaN is the contract and callers filter it)."""

from __future__ import annotations

import numpy as np

from geospatial_spark.geo import distance, geohash, geom, s2

BOUNDARY_POINTS = [
    (90.0, 180.0),
    (-90.0, -180.0),
    (90.0, -180.0),
    (-90.0, 180.0),
    (0.0, 180.0),
    (90.0, 0.0),
    (89.9999999, 179.9999999),
]


def test_geohash_boundary_encode_decodes_within_cell():
    for lat, lon in BOUNDARY_POINTS:
        h = geohash.encode(np.array([lat]), np.array([lon]), 12)
        dlat, dlon = geohash.decode(h, 12)
        # precision-12 cells are ~1.7e-5 deg: the decoded center must sit
        # within one cell of the (boundary-clamped) input
        assert abs(float(dlat[0]) - lat) < 1e-4
        assert abs(float(dlon[0]) - lon) < 2e-4


def test_s2_poles_antimeridian_and_deep_levels():
    rng = np.random.default_rng(7)
    lats = np.concatenate(
        [
            np.array([89.999, -89.999, 89.99999999, -89.99999999, 45.0, 0.0]),
            rng.uniform(-89.9, 89.9, 100),
        ]
    )
    lons = np.concatenate(
        [
            np.array([0.0, 179.999, 180.0, -180.0, 45.0, -135.0]),
            rng.uniform(-179.9, 179.9, 100),
        ]
    )
    for lv in (5, 12, 20, 30):
        cid = s2.latlng_to_cell(lats, lons, lv)
        assert (s2.level(cid) == lv).all()
        clat, clon = s2.cell_center_latlng(cid)
        # sphere distance input->center bounded by the cell diagonal
        d = distance.haversine(lats, lons, clat, clon)
        lim = np.pi / 2 / (2**lv) * distance.EARTH_RADIUS_M * 2.2
        assert (d <= lim).all()
        assert (s2.from_token(s2.to_token(cid)) == cid).all()
        if lv >= 12:
            p = s2.parent(cid, lv - 3)
            mn, mx = s2.range_min_max(p)
            u = cid.astype(np.uint64)
            assert (
                (u >= mn.astype(np.uint64)) & (u <= mx.astype(np.uint64))
            ).all()


def test_trans_proj_roundtrips_at_utm_validity_extremes():
    for lon, lat in [
        (0.0, 83.9),
        (0.0, -79.9),
        (179.9, 60.0),
        (-179.9, -60.0),
        (5.9999, 40.0),  # both sides of a zone edge
        (6.0001, 40.0),
        (0.0, 0.0001),
        (-0.0001, -0.0001),  # false-northing hemisphere boundary
    ]:
        zone = int(np.floor((lon + 180.0) / 6.0) + 1)
        epsg = (32600 if lat >= 0 else 32700) + zone
        x, y = geom.trans_proj(lon, lat, 4326, epsg)
        lon2, lat2 = geom.trans_proj(x, y, epsg, 4326)
        assert abs(lon2 - lon) < 1e-7 and abs(lat2 - lat) < 1e-7
        x3, y3 = geom.trans_proj(lon, lat, 4326, 3857)
        lon4, lat4 = geom.trans_proj(x3, y3, 3857, 4326)
        assert abs(lon4 - lon) < 1e-9 and abs(lat4 - lat) < 1e-9


def test_vincenty_near_antipodal_is_nan_not_garbage():
    """Documented divergence pin: where the reference's scalar loop raises
    'Vincenty formula did not converge', the vectorized kernel must return
    NaN — never a finite wrong distance — while nearby convergent rows in
    the same batch stay exact."""
    la1 = np.array([0.0, 10.0, 0.0, 48.8566])
    lo1 = np.array([0.0, 20.0, 0.0, 2.3522])
    la2 = np.array([0.5, -10.2, 0.0, 51.5074])
    lo2 = np.array([179.7, -159.9, 179.99, -0.1278])
    v = distance.vincenty(la1, lo1, la2, lo2)
    assert np.isnan(v[:3]).all()  # classic non-convergent near-antipodes
    h = float(distance.haversine(48.8566, 2.3522, 51.5074, -0.1278))
    assert np.isfinite(v[3]) and abs(float(v[3]) - h) / h < 0.01
