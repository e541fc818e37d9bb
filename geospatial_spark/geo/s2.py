"""S2 cell-id kernel — vectorized numpy, from the public S2 geometry spec.

Implements the 64-bit S2 cell id scheme (Google s2geometry, public spec):
6 cube faces, quadratic ST↔UV projection, Hilbert-curve leaf ordering with
the standard 4-bit lookup tables, token encoding, parent/children bit math,
and level arithmetic.  No code is taken from the reference (which calls the
``s2`` PyPI package — see ``/root/reference/geoparse/gindex.py:80-81`` for
polyfill usage, ``gindex.py:319-320`` for level-from-token,
``gindex.py:374-378`` for 4-child compaction, ``gindex.py:449-455`` for
uncompact via ``CellId.children(level)``).

All hot paths are vectorized over int64/uint64 numpy arrays so they run
inside Arrow pandas UDFs (no per-row Python, per BASELINE.json input_hint).

Cell id layout (public spec): 3 face bits, 2*level Hilbert position bits,
a trailing 1 bit, zero-padded to 64 bits.  MAX_LEVEL = 30.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# Hilbert sub-cell traversal tables (public S2 constants).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
    else:
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            _init_lookup_cell(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )


for _orient in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _orient, 0, _orient)


# ---------------------------------------------------------------------------
# lat/lng ↔ XYZ ↔ face/UV ↔ ST ↔ IJ
# ---------------------------------------------------------------------------

def latlng_to_xyz(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def xyz_to_latlng(x, y, z):
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def xyz_to_face_uv(x, y, z):
    """XYZ on the unit sphere → (face 0..5, u, v)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest absolute component axis: 0=x, 1=y, 2=z (public spec tie-breaking:
    # strict-greater comparisons, ties fall through to the later axis)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # ValidFaceXYZtoUV (public table)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (uf, vf) in enumerate(
        (
            (lambda: y / x, lambda: z / x),      # face 0 (+x)
            (lambda: -x / y, lambda: z / y),     # face 1 (+y)
            (lambda: -x / z, lambda: -y / z),    # face 2 (+z)
            (lambda: z / x, lambda: y / x),      # face 3 (-x)
            (lambda: z / y, lambda: -x / y),     # face 4 (-y)
            (lambda: -y / z, lambda: -x / z),    # face 5 (-z)
        )
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u_all = uf()
                v_all = vf()
            u = np.where(m, u_all, u)
            v = np.where(m, v_all, v)
    return face, u, v


def face_uv_to_xyz(face, u, v):
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    # Exact public table (inverse of xyz_to_face_uv):
    # face 0: ( 1,  u,  v)
    # face 1: (-u,  1,  v)
    # face 2: (-u, -v,  1)
    # face 3: (-1, -v, -u)
    # face 4: ( v, -1, -u)
    # face 5: ( v,  u, -1)
    X = [one, -u, -u, -one, v, v]
    Y = [u, one, -v, -v, -one, u]
    Z = [v, v, one, -u, -u, -one]
    x = np.select([face == f for f in range(6)], X)
    y = np.select([face == f for f in range(6)], Y)
    z = np.select([face == f for f in range(6)], Z)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def st_to_uv(s):
    """Quadratic projection (public spec)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0,
            0.5 * np.sqrt(np.abs(1.0 + 3.0 * u)),
            1.0 - 0.5 * np.sqrt(np.abs(1.0 - 3.0 * u)),
        )


def st_to_ij(s):
    return np.clip(
        np.floor(np.asarray(s, dtype=np.float64) * (1 << MAX_LEVEL)),
        0,
        (1 << MAX_LEVEL) - 1,
    ).astype(np.uint64)


# ---------------------------------------------------------------------------
# (face, i, j) ↔ cell id (Hilbert lookup, 4-bit blocks)
# ---------------------------------------------------------------------------

def from_face_ij(face, i, j) -> np.ndarray:
    """(face, i, j) at leaf level → 64-bit cell id (int64 view)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    bits = face & np.uint64(SWAP_MASK)
    n = face << np.uint64(60)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * 4)
        bits += ((i >> kk) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 8)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return ((n << np.uint64(1)) + np.uint64(1)).astype(np.int64)


def to_face_ij_orientation(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id (any level) → (face, i, j, orientation) of its leaf-aligned
    corner block (matches public ToFaceIJOrientation for the cell center's
    containing leaf when the id is a leaf; for coarser cells i/j refer to
    the Hilbert position bits present in the id)."""
    ident = np.asarray(cell_id, dtype=np.uint64)
    face = (ident >> np.uint64(POS_BITS)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    i = np.zeros_like(ident)
    j = np.zeros_like(ident)
    nbits = MAX_LEVEL - 7 * LOOKUP_BITS  # 2 on the first iteration
    for k in range(7, -1, -1):
        nb = np.uint64(nbits if k == 7 else LOOKUP_BITS)
        take = (ident >> np.uint64(k * 2 * LOOKUP_BITS + 1)) & np.uint64(
            (1 << int(2 * int(nb))) - 1
        )
        bits += take << np.uint64(2)
        bits = _LOOKUP_IJ[bits.astype(np.int64)]
        i += (bits >> np.uint64(LOOKUP_BITS + 2)) << np.uint64(k * 4)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << LOOKUP_BITS) - 1)) << np.uint64(k * 4)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64), bits.astype(np.int64)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def latlng_to_cell(lat, lng, level: int) -> np.ndarray:
    """pointcell for S2 (SURVEY §2.6 N1): lat/lng degrees → cell id at level."""
    x, y, z = latlng_to_xyz(np.atleast_1d(lat), np.atleast_1d(lng))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = from_face_ij(face, i, j)
    return parent(leaf, level)


def level(cell_id) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    ident = np.asarray(cell_id, dtype=np.uint64)
    lsb = ident & (~ident + np.uint64(1))
    # count trailing zeros via float64 exponent trick is unsafe at 2^63;
    # use bit_length over uint64 by successive shifts (vectorized log2 on
    # exact powers of two below 2^53 is fine; handle high bits separately).
    tz = np.zeros(ident.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (v & np.uint64((1 << shift) - 1)) == 0
        big = v != 0
        step = m & big
        tz += np.where(step, shift, 0)
        v = np.where(step, v >> np.uint64(shift), v)
    return MAX_LEVEL - (tz >> 1)


def lsb_for_level(lvl) -> np.ndarray:
    lvl = np.asarray(lvl, dtype=np.int64)
    return (np.uint64(1) << (np.uint64(2) * (np.uint64(MAX_LEVEL) - lvl.astype(np.uint64)))).astype(
        np.uint64
    )


def parent(cell_id, lvl: int) -> np.ndarray:
    ident = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - lvl)))
    return ((ident & (~(new_lsb + new_lsb) + np.uint64(1))) | new_lsb).astype(np.int64)


def children(cell_id, target_level: int | None = None) -> np.ndarray:
    """cell ids → (n, 4**d) array of descendant ids at target_level
    (default: one level down).  Mirrors CellId.children(level) used by
    uncompact_s2 (gindex.py:449-455)."""
    ident = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    if ident.size == 0:
        return np.empty((0, 0), dtype=np.int64)
    lvls = level(ident.astype(np.int64))
    lv0 = int(lvls.flat[0])
    if not np.all(lvls == lv0):
        raise ValueError("children() requires uniform input level")
    if target_level is None:
        target_level = lv0 + 1
    if target_level < lv0:
        raise ValueError("target_level must be >= input level")
    count = 4 ** (target_level - lv0)
    old_lsb = lsb_for_level(lvls)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - target_level)))
    start = ident - old_lsb + new_lsb
    step = new_lsb * np.uint64(2)
    offs = (np.arange(count, dtype=np.uint64) * step)[None, :]
    return (start[:, None] + offs).astype(np.int64)


def range_min_max(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Leaf-id range covered by each cell — Hilbert-contiguous, the basis for
    range partitioning / pruning (SURVEY §4 'Global Range Encoding')."""
    ident = np.asarray(cell_id, dtype=np.uint64)
    lsb = ident & (~ident + np.uint64(1))
    return (ident - (lsb - np.uint64(1))).astype(np.int64), (
        ident + (lsb - np.uint64(1))
    ).astype(np.int64)


def to_token(cell_id) -> np.ndarray:
    """64-bit id → hex token with trailing zeros stripped (public format)."""
    ids = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    out = []
    for v in ids:
        if v == 0:
            out.append("X")
            continue
        h = format(int(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out, dtype=object)


def from_token(tokens) -> np.ndarray:
    toks = np.atleast_1d(np.asarray(tokens, dtype=object))
    out = np.empty(toks.shape[0], dtype=np.uint64)
    for k, t in enumerate(toks):
        out[k] = np.uint64(int(str(t).ljust(16, "0"), 16)) if t and t != "X" else np.uint64(0)
    return out.astype(np.int64)


def cell_center_latlng(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """cell id → (lat, lng) of the cell center."""
    ident = np.atleast_1d(np.asarray(cell_id))
    face, i, j, _ = to_face_ij_orientation(ident)
    lvls = level(ident)
    sz = (np.int64(1) << (np.int64(MAX_LEVEL) - lvls).astype(np.int64)).astype(np.int64)
    # center of the cell in ij units: aligned corner + size/2 (si/ti space)
    i0 = (i & ~(sz - 1)).astype(np.float64)
    j0 = (j & ~(sz - 1)).astype(np.float64)
    s = (i0 + sz.astype(np.float64) / 2.0) / float(1 << MAX_LEVEL)
    t = (j0 + sz.astype(np.float64) / 2.0) / float(1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    return xyz_to_latlng(x, y, z)


def cell_vertices_latlng(cell_id) -> np.ndarray:
    """cell id → (n, 4, 2) array of (lat, lng) corners (CCW in ST space)."""
    ident = np.atleast_1d(np.asarray(cell_id))
    face, i, j, _ = to_face_ij_orientation(ident)
    lvls = level(ident)
    sz = (np.int64(1) << (np.int64(MAX_LEVEL) - lvls).astype(np.int64)).astype(np.int64)
    i0 = (i & ~(sz - 1)).astype(np.float64)
    j0 = (j & ~(sz - 1)).astype(np.float64)
    scale = float(1 << MAX_LEVEL)
    out = np.empty((ident.shape[0], 4, 2), dtype=np.float64)
    corners = ((0, 0), (1, 0), (1, 1), (0, 1))
    for k, (di, dj) in enumerate(corners):
        s = (i0 + di * sz) / scale
        t = (j0 + dj * sz) / scale
        x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
        lat, lng = xyz_to_latlng(x, y, z)
        out[:, k, 0] = lat
        out[:, k, 1] = lng
    return out
