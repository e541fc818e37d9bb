"""Property-based invariants for the numpy cell/geometry kernels
(hypothesis; SURVEY §5.1 — no Spark session needed, runs in seconds)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_spark.geo import compact as lc
from geospatial_spark.geo import distance as dist
from geospatial_spark.geo import geohash as gh
from geospatial_spark.geo import polyline as pl
from geospatial_spark.geo import s2 as s2k
from geospatial_spark.geo import tiles as tl

lats = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64)
lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(min_value=1, max_value=9))
def test_geohash_roundtrip_and_parent(lat, lon, p):
    cell = gh.encode(np.array([lat]), np.array([lon]), p)[0]
    # center of the cell re-encodes to the same cell
    clat, clon = gh.decode(np.array([cell]), p)
    assert gh.encode(clat, clon, p)[0] == cell
    # the point lies inside the cell bbox (1e-9 deg tolerance: the float
    # quantization (lon+180)/360 rounds points within ~1e-14 deg of a cell
    # boundary into the neighbor — inherent to every geohash impl)
    mnx, mny, mxx, mxy = gh.cell_bbox(np.array([cell]), p)
    assert mnx[0] - 1e-9 <= lon <= mxx[0] + 1e-9
    assert mny[0] - 1e-9 <= lat <= mxy[0] + 1e-9
    # parent prefix contains the point's coarser cell
    if p > 1:
        assert gh.encode(np.array([lat]), np.array([lon]), p - 1)[0] == cell[: p - 1]


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(min_value=1, max_value=20))
def test_s2_roundtrip_level_parent(lat, lon, level):
    cell = s2k.latlng_to_cell(np.array([lat]), np.array([lon]), level)
    assert int(s2k.level(cell)[0]) == level
    # center of the cell re-encodes to the same cell
    clat, clon = s2k.cell_center_latlng(cell)
    assert int(s2k.latlng_to_cell(clat, clon, level)[0]) == int(cell[0])
    if level > 0:
        par = s2k.parent(cell, level - 1)
        assert int(s2k.level(par)[0]) == level - 1
        # parent of the point computed directly == parent of the cell
        assert int(s2k.latlng_to_cell(np.array([lat]), np.array([lon]), level - 1)[0]) == int(par[0])
        # children of the parent include the cell
        kids = s2k.children(par)
        assert int(cell[0]) in {int(k) for k in kids.ravel()}


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=30), lats, lons)
def test_s2_compact_uncompact_identity(level_seed, lat, lon):
    level = 4 + level_seed % 8
    cell = s2k.latlng_to_cell(np.array([lat]), np.array([lon]), level)
    kids = [int(c) for c in s2k.children(cell).ravel()]
    # complete family compacts to the parent; uncompact restores it
    compacted = [int(c) for c in lc.compact_s2(kids)]
    assert compacted == sorted(
        {int(cell[0])} | set(), key=lambda x: int(x) & 0xFFFFFFFFFFFFFFFF
    )
    restored = sorted(int(c) for c in lc.uncompact_s2(compacted, level + 1))
    assert restored == sorted(kids)


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(min_value=0, max_value=18))
def test_tile_bounds_contain_point(lat, lon, z):
    x, y = tl.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    assert 0 <= x[0] < (1 << z) and 0 <= y[0] < (1 << z)
    w, s, e, n = tl.tile_bounds(x, y, z)
    assert w[0] - 1e-9 <= lon <= e[0] + 1e-9
    if abs(lat) <= 85.05:
        assert s[0] - 1e-9 <= lat <= n[0] + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lons, lats), min_size=1, max_size=8))
def test_polyline_roundtrip(coords):
    enc = pl.encode(coords)
    got = pl.decode_int(enc)
    want = [(round(lon * 1e6), round(lat * 1e6)) for lon, lat in coords]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(lats, lons, lats, lons)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d = dist.haversine(np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]))[0]
    d_rev = dist.haversine(np.array([lat2]), np.array([lon2]), np.array([lat1]), np.array([lon1]))[0]
    assert d >= 0 and abs(d - d_rev) < 1e-6
    assert d <= np.pi * dist.EARTH_RADIUS_M + 1.0  # ≤ half circumference
    d_self = dist.haversine(np.array([lat1]), np.array([lon1]), np.array([lat1]), np.array([lon1]))[0]
    assert d_self < 1e-6


# --- rarest-first prefix-filter lemma (operators/dedup._ngram_doc_arrays) ---
#
# Pure-python mirror of the operator's arithmetic: global order = (df, h)
# ascending, prefix length p = n - ceil(t*n) + 1 with the exact integer
# ceiling ((tp*n + 999999) // 1e6).  The lemma: any pair with Jaccard >= t
# shares at least one prefix gram.  Hypothesis sweeps tiny adversarial
# universes (heavy overlap, threshold-boundary pairs) that the fixture
# corpus never produces.

sets_strategy = st.lists(
    st.frozensets(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    min_size=2,
    max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(sets_strategy, st.integers(min_value=500_000, max_value=999_999))
def test_prefix_filter_lemma_exact_recall(sets, tp):
    from collections import Counter

    df = Counter()
    for s in sets:
        for g in s:
            df[g] += 1

    def prefix(s):
        n = len(s)
        p = n - ((tp * n + 999999) // 1_000_000) + 1
        ordered = sorted(s, key=lambda g: (df[g], g))
        return set(ordered[:p])

    prefixes = [prefix(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            uni = len(a | b)
            jac_ppm = (1_000_000 * inter) // uni
            if jac_ppm >= tp:
                assert prefixes[i] & prefixes[j], (
                    f"pair with jac {jac_ppm} >= {tp} shares no prefix gram: "
                    f"{sorted(a)} / {sorted(b)}"
                )


# --- U3 trans_proj: TM inverse + web-mercator, both directions ------------

utm_lats = st.floats(min_value=-80.0, max_value=84.0, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(utm_lats, lons)
def test_utm_forward_inverse_roundtrip(lat, lon):
    from geospatial_spark.geo import geom as gm

    x, y, z = gm.utm_forward(np.array([lat]), np.array([lon]))
    la, lo = gm.utm_inverse(x, y, z, np.array([lat >= 0]))
    # Snyder series agree to ~1 mm within the zone (1 deg lat ≈ 111 km;
    # lon meters scale by cos φ)
    assert abs(la[0] - lat) * 111_320 < 2e-3
    assert abs(lo[0] - lon) * 111_320 * np.cos(np.radians(lat)) < 2e-3


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_webmerc_roundtrip_and_tile_consistency(lat, lon):
    from geospatial_spark.geo import geom as gm

    X, Y = gm.webmerc_forward(np.array([lat]), np.array([lon]))
    la, lo = gm.webmerc_inverse(X, Y)
    assert abs(la[0] - lat) < 1e-12 and abs(lo[0] - lon) < 1e-12
    # the meters plane and the tile math quantize identically
    z = 10
    nx = int(np.floor((X[0] / (gm._A * np.pi) + 1.0) / 2.0 * (1 << z)))
    ny = int(np.floor((1.0 - Y[0] / (gm._A * np.pi)) / 2.0 * (1 << z)))
    tx, ty = tl.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    assert (min(nx, (1 << z) - 1), min(ny, (1 << z) - 1)) == (int(tx[0]), int(ty[0]))


@settings(max_examples=150, deadline=None)
@given(utm_lats, lons, st.sampled_from([4326, 3857]))
def test_trans_proj_composes_through_4326(lat, lon, mid):
    """any → mid → natural-UTM → 4326 returns the starting point (< 1 mm);
    exercises every supported CRS pair in one chain."""
    from geospatial_spark.geo import geom as gm

    epsg = int(gm.utm_zone_epsg(np.array([lat]), np.array([lon]))[0])
    x0, y0 = np.array([lon]), np.array([lat])
    x1, y1 = gm.trans_proj(x0, y0, 4326, mid)
    x2, y2 = gm.trans_proj(x1, y1, mid, epsg)
    x3, y3 = gm.trans_proj(x2, y2, epsg, 4326)
    assert abs(x3[0] - lon) * 111_320 * np.cos(np.radians(lat)) < 4e-3
    assert abs(y3[0] - lat) * 111_320 < 4e-3
