"""Polygon→cell fill kernels (the reference's `polycell`, G1 in SURVEY §2.1).

Per-system semantics mirror the reference dispatch
(``/root/reference/geoparse/gindex.py:72-89``):

* geohash — *intersects* semantics (``polygon_to_geohashes(..., inner=False)``,
  ``gindex.py:75``): every cell whose bbox intersects the polygon.  Exact:
  grid enumeration over the polygon bbox + exact rect-polygon test.
* center mode — *centroid-in-polygon* semantics (H3 ``polyfill``,
  ``gindex.py:86``): cells whose center lies inside.
* S2 — covering semantics (``s2.polyfill``, ``gindex.py:80-81``); the
  reference notes s2.polyfill wrongly fills holes (``gindex.py:18-19``) — we
  are hole-safe (even-odd PIP).  Implemented as hierarchical descent from
  the 6 face cells with a conservative lat/lng prune, exact tests at the
  target level.

These kernels run inside pandas UDFs; per-polygon work is numpy-vectorized
over the candidate cell grid.
"""

from __future__ import annotations

import numpy as np

from . import geohash as gh
from . import geom as gm
from . import s2 as s2k


def geohash_polyfill(geom: gm.Geometry, precision: int, mode: str = "intersects") -> np.ndarray:
    """Polygon/MultiPolygon → unique geohash cells at `precision`."""
    minx, miny, maxx, maxy = gm.bbox(geom)
    lon_bits, lat_bits = gh._bits(precision)
    lon_w = 360.0 / (1 << lon_bits)
    lat_w = 180.0 / (1 << lat_bits)
    i0 = int(np.floor((minx + 180.0) / lon_w))
    i1 = int(np.floor((maxx + 180.0) / lon_w))
    j0 = int(np.floor((miny + 90.0) / lat_w))
    j1 = int(np.floor((maxy + 90.0) / lat_w))
    i0, i1 = max(i0, 0), min(i1, (1 << lon_bits) - 1)
    j0, j1 = max(j0, 0), min(j1, (1 << lat_bits) - 1)
    n_cand = (i1 - i0 + 1) * (j1 - j0 + 1)
    if n_cand > 5_000_000:
        raise ValueError(
            f"geohash_polyfill: {n_cand} candidate cells at precision {precision}; "
            "reduce precision or pre-fragment the polygon (ppolycell-style)"
        )
    ii, jj = np.meshgrid(np.arange(i0, i1 + 1), np.arange(j0, j1 + 1), indexing="ij")
    ii = ii.ravel()
    jj = jj.ravel()
    c_lon = (ii + 0.5) * lon_w - 180.0
    c_lat = (jj + 0.5) * lat_w - 90.0
    center_in = gm.points_in_polygon(c_lon, c_lat, geom)
    if mode == "center":
        keep = center_in
    else:
        keep = center_in.copy()
        # cells containing any polygon vertex
        for part in geom.parts:
            for ring in part:
                vi = np.floor((ring[:, 0] + 180.0) / lon_w).astype(np.int64)
                vj = np.floor((ring[:, 1] + 90.0) / lat_w).astype(np.int64)
                m = (vi >= i0) & (vi <= i1) & (vj >= j0) & (vj <= j1)
                if m.any():
                    flat = (vi[m] - i0) * (j1 - j0 + 1) + (vj[m] - j0)
                    keep[flat] = True
        # cells crossed by polygon edges (grid DDA traversal)
        for part in geom.parts:
            for ring in part:
                for k in range(len(ring) - 1):
                    _mark_edge_cells(
                        ring[k], ring[k + 1], lon_w, lat_w, i0, i1, j0, j1, keep
                    )
    sel_i = ii[keep].astype(np.uint64)
    sel_j = jj[keep].astype(np.uint64)
    if sel_i.size == 0:
        return np.array([], dtype=object)
    return gh.encode_from_int(sel_i, sel_j, precision)


def _mark_edge_cells(p0, p1, lon_w, lat_w, i0, i1, j0, j1, keep):
    """Amanatides–Woo grid traversal of segment p0→p1, setting keep flags."""
    x0 = (p0[0] + 180.0) / lon_w
    y0 = (p0[1] + 90.0) / lat_w
    x1 = (p1[0] + 180.0) / lon_w
    y1 = (p1[1] + 90.0) / lat_w
    ci, cj = int(np.floor(x0)), int(np.floor(y0))
    ei, ej = int(np.floor(x1)), int(np.floor(y1))
    dx, dy = x1 - x0, y1 - y0
    step_i = 1 if dx > 0 else -1
    step_j = 1 if dy > 0 else -1
    t_max_x = ((ci + (step_i > 0)) - x0) / dx if dx != 0 else np.inf
    t_max_y = ((cj + (step_j > 0)) - y0) / dy if dy != 0 else np.inf
    t_dx = abs(1.0 / dx) if dx != 0 else np.inf
    t_dy = abs(1.0 / dy) if dy != 0 else np.inf
    guard = 0
    while True:
        if i0 <= ci <= i1 and j0 <= cj <= j1:
            keep[(ci - i0) * (j1 - j0 + 1) + (cj - j0)] = True
        if ci == ei and cj == ej:
            break
        guard += 1
        if guard > 4 * (abs(ei - ci) + abs(ej - cj) + 4) + 10000:
            break  # numeric-safety bail
        if t_max_x < t_max_y:
            t_max_x += t_dx
            ci += step_i
        else:
            t_max_y += t_dy
            cj += step_j


def s2_polyfill(geom: gm.Geometry, level: int, mode: str = "intersects") -> np.ndarray:
    """Polygon → S2 cell ids at `level` via hierarchical descent from the 6
    face cells.  Prune with a padded lat/lng bound of each cell (cell edges
    bulge vs their vertices; padding is conservative at coarse levels)."""
    minx, miny, maxx, maxy = gm.bbox(geom)
    out: list[int] = []
    stack = [(int(f) << 61 | 1 << 60) for f in range(6)]
    # iterative descent; each entry is a cell id (python int, uint64 value)
    while stack:
        cid = stack.pop()
        arr = np.array([cid], dtype=np.uint64).astype(np.int64)
        lvl = int(s2k.level(arr)[0])
        verts = s2k.cell_vertices_latlng(arr)[0]  # (4,2) lat,lng
        vlat = verts[:, 0]
        vlng = verts[:, 1]
        pad = max(0.5, 90.0 / (1 << lvl)) if lvl < 4 else 4.0 * 90.0 / (1 << lvl)
        clat0, clat1 = vlat.min() - pad, vlat.max() + pad
        lng_span = vlng.max() - vlng.min()
        wraps = lng_span > 180.0 or lvl == 0
        if not wraps:
            clng0, clng1 = vlng.min() - pad, vlng.max() + pad
            if clng1 < minx or clng0 > maxx:
                continue
        if clat1 < miny or clat0 > maxy:
            continue
        if lvl == level:
            clat, clng = s2k.cell_center_latlng(arr)
            cin = bool(gm.points_in_polygon(np.array(clng), np.array(clat), geom)[0])
            if mode == "center":
                if cin:
                    out.append(int(np.uint64(arr.view(np.uint64)[0])))
                continue
            vin = gm.points_in_polygon(vlng, vlat, geom).any()
            hit = cin or bool(vin)
            if not hit and not wraps:
                # polygon vertex inside cell rect, or edge crossing — use the
                # rect approximation of the cell in lat/lng space
                hit = gm.rect_intersects_polygon(
                    float(vlng.min()),
                    float(vlat.min()),
                    float(vlng.max()),
                    float(vlat.max()),
                    geom,
                )
            if hit:
                out.append(int(np.uint64(arr.view(np.uint64)[0])))
            continue
        for child in s2k.children(arr)[0]:
            # mask instead of np.uint64(<negative int64>) — the scalar
            # conversion is deprecated for out-of-bound values
            stack.append(int(child) & 0xFFFFFFFFFFFFFFFF)
    return np.array(sorted(set(out)), dtype=np.uint64).astype(np.int64)
