"""Great-circle / geodesic distance kernels — vectorized numpy.

Semantics match the reference exactly:

* ``haversine`` — mean Earth radius R = 6371008.8 m, the (2a+b)/3 value the
  reference derives (``/root/reference/geoparse/gutils.py:222-227``); golden
  vector ``haversine(52.2296756, 21.0122287, 41.8919300, 12.5113300) =
  1319743.483`` m (``gutils.py:217-218``).
* ``vincenty`` — WGS-84 ellipsoid (a=6378137, f=1/298.257223563,
  ``gutils.py:258-261``), inverse problem, iterative lambda convergence to
  1e-12 with a 1000-iteration cap (``gutils.py:282-300``); antipodal
  non-convergence returns NaN (the reference raises, ``gutils.py:299-300`` —
  a per-row raise is not expressible in a vectorized kernel; NaN is our
  documented divergence and is filtered by callers).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # gutils.py:227
WGS84_A = 6378137.0  # gutils.py:258
WGS84_F = 1.0 / 298.257223563  # gutils.py:259
WGS84_B = (1.0 - WGS84_F) * WGS84_A


def haversine(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def vincenty(lat1, lon1, lat2, lon2, tol: float = 1e-12, max_iter: int = 1000) -> np.ndarray:
    """Vincenty inverse geodesic distance in meters (vectorized, masked
    fixed-point iteration — SURVEY.md §2.2 U5)."""
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    a, f, b = WGS84_A, WGS84_F, WGS84_B

    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(lam.shape, dtype=bool)
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sigma_m = np.zeros_like(lam)

    for _ in range(max_iter):
        if not np.any(active):
            break
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        ss = np.sqrt(
            (cosU2 * sin_lam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sg = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sa = np.where(ss != 0, cosU1 * cosU2 * sin_lam / np.where(ss == 0, 1, ss), 0.0)
        csa = 1.0 - sa * sa
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(
                csa != 0, cs - 2.0 * sinU1 * sinU2 / np.where(csa == 0, 1, csa), 0.0
            )
        C = f / 16.0 * csa * (4.0 + f * (4.0 - 3.0 * csa))
        lam_new = L + (1.0 - C) * f * sa * (
            sg + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm * c2sm))
        )
        newly = np.abs(lam_new - lam) < tol
        upd = active
        sin_sigma = np.where(upd, ss, sin_sigma)
        cos_sigma = np.where(upd, cs, cos_sigma)
        sigma = np.where(upd, sg, sigma)
        sin_alpha = np.where(upd, sa, sin_alpha)
        cos_sq_alpha = np.where(upd, csa, cos_sq_alpha)
        cos2sigma_m = np.where(upd, c2sm, cos2sigma_m)
        lam = np.where(upd, lam_new, lam)
        converged = converged | (newly & active)
        active = active & ~newly

    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = (
        B
        * sin_sigma
        * (
            cos2sigma_m
            + B
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos2sigma_m**2)
                - B
                / 6.0
                * cos2sigma_m
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos2sigma_m**2)
            )
        )
    )
    dist = b * A * (sigma - delta_sigma)
    coincident = (np.abs(np.asarray(lat1) - lat2) < 1e-15) & (
        np.abs(np.asarray(lon1) - lon2) < 1e-15
    )
    dist = np.where(coincident, 0.0, np.where(converged, dist, np.nan))
    return dist
