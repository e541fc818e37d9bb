"""Arrow-batched pandas UDFs wrapping the numpy geo kernels, plus JVM-native
Column helpers.  These are the ONLY Python execution points in the engine —
everything else is Catalyst-planned JVM expressions (BASELINE.json
input_hint: vectorized pandas/Arrow UDFs, no per-row Python).

Reference parity notes are on each function (SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
)

from ..geo import distance as dist
from ..geo import geohash as gh
from ..geo import geom as gm
from ..geo import polyfill as pf
from ..geo import s2 as s2k

# --------------------------------------------------------------------------
# pointcell (N1) — the workhorse of every spatial join
# --------------------------------------------------------------------------


def geohash_encode_udf(precision: int):
    @pandas_udf(StringType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(gh.encode(lat.to_numpy(), lon.to_numpy(), precision))

    return _enc


def s2_cell_udf(level: int):
    @pandas_udf(LongType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2k.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), level))

    return _enc


@pandas_udf(StringType())
def s2_token_udf(cell: pd.Series) -> pd.Series:
    return pd.Series(s2k.to_token(cell.to_numpy()), dtype=object)


def s2_parent_udf(level: int):
    @pandas_udf(LongType())
    def _par(cell: pd.Series) -> pd.Series:
        return pd.Series(s2k.parent(cell.to_numpy(), level))

    return _par


@pandas_udf(IntegerType())
def s2_level_udf(cell: pd.Series) -> pd.Series:
    return pd.Series(s2k.level(cell.to_numpy()).astype(np.int32))


def s2_center_udfs():
    @pandas_udf(DoubleType())
    def _lat(cell: pd.Series) -> pd.Series:
        lat, _ = s2k.cell_center_latlng(cell.to_numpy())
        return pd.Series(lat)

    @pandas_udf(DoubleType())
    def _lng(cell: pd.Series) -> pd.Series:
        _, lng = s2k.cell_center_latlng(cell.to_numpy())
        return pd.Series(lng)

    return _lat, _lng


def geohash_neighbors_udf(precision: int, ring: int = 1):
    """k-ring expansion (N2) — returns the (2r+1)^2 cells around each input."""

    @pandas_udf(ArrayType(StringType()))
    def _ring(cell: pd.Series) -> pd.Series:
        out = gh.neighbors_ring(cell.to_numpy(), precision, ring)
        return pd.Series(list(map(list, out)))

    return _ring


# --------------------------------------------------------------------------
# cellpoly (G3): cell → resolution / boundary
# --------------------------------------------------------------------------


@pandas_udf(IntegerType())
def geohash_resolution_udf(cell: pd.Series) -> pd.Series:
    # gindex.py:313: geohash resolution = len(cell)
    return cell.str.len().astype("int32")


def geohash_bbox_wkb_udf():
    @pandas_udf("minx double, miny double, maxx double, maxy double")
    def _bbox(cell: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(index=cell.index, columns=["minx", "miny", "maxx", "maxy"], dtype=float)
        vals = cell.to_numpy(dtype=object)
        lens = np.array([len(c) for c in vals])
        for p in np.unique(lens):
            m = lens == p
            mnx, mny, mxx, mxy = gh.cell_bbox(vals[m], int(p))
            out.loc[m, "minx"] = mnx
            out.loc[m, "miny"] = mny
            out.loc[m, "maxx"] = mxx
            out.loc[m, "maxy"] = mxy
        return out

    return _bbox


# --------------------------------------------------------------------------
# polycell (G1): WKB polygon → covering cells
# --------------------------------------------------------------------------


def geohash_polyfill_udf(precision: int, mode: str = "intersects"):
    @pandas_udf(ArrayType(StringType()))
    def _fill(wkb: pd.Series) -> pd.Series:
        out = []
        for buf in wkb:
            if buf is None:
                out.append(None)
                continue
            cells = pf.geohash_polyfill(gm.parse_wkb(bytes(buf)), precision, mode)
            out.append(list(cells))
        return pd.Series(out)

    return _fill


def s2_polyfill_udf(level: int, mode: str = "intersects"):
    @pandas_udf(ArrayType(LongType()))
    def _fill(wkb: pd.Series) -> pd.Series:
        out = []
        for buf in wkb:
            if buf is None:
                out.append(None)
                continue
            cells = pf.s2_polyfill(gm.parse_wkb(bytes(buf)), level, mode)
            out.append([int(c) for c in cells])
        return pd.Series(out)

    return _fill


# --------------------------------------------------------------------------
# PIP refine (U8/U9 exact predicate)
# --------------------------------------------------------------------------


def pip_refine_udf(geoms_by_key: dict[object, bytes]):
    """Exact point-in-polygon against a broadcast {key: wkb} dict.

    The dict ships inside the UDF closure (cloudpickle → executors once);
    WKB is parsed lazily per executor and cached.
    """
    cache: dict[object, gm.Geometry] = {}

    @pandas_udf(BooleanType())
    def _pip(key: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        lon_np = lon.to_numpy()
        lat_np = lat.to_numpy()
        out = np.zeros(len(key), dtype=bool)
        keys = key.to_numpy(dtype=object)
        for k in pd.unique(keys):
            g = cache.get(k)
            if g is None:
                buf = geoms_by_key.get(k)
                if buf is None:
                    continue
                g = gm.parse_wkb(bytes(buf))
                cache[k] = g
            m = keys == k
            out[m] = gm.points_in_polygon(lon_np[m], lat_np[m], g)
        return pd.Series(out)

    return _pip


# --------------------------------------------------------------------------
# distances
# --------------------------------------------------------------------------


def haversine_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """JVM-native haversine (U4) — whole-stage-codegen'd, SQL-expressible
    (so it gets a DuckDB oracle).  R = 6371008.8 (gutils.py:227)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2.0 * dist.EARTH_RADIUS_M) * F.asin(F.sqrt(a))


HAVERSINE_SQL = (
    "2.0 * 6371008.8 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)


@pandas_udf(DoubleType())
def vincenty_udf(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
    return pd.Series(
        dist.vincenty(lat1.to_numpy(), lon1.to_numpy(), lat2.to_numpy(), lon2.to_numpy())
    )


# --------------------------------------------------------------------------
# tiles (N3) — pure JVM column math, SQL-expressible
# --------------------------------------------------------------------------


def tile_x_col(lon: Column, z: int) -> Column:
    return F.floor((lon + 180.0) / 360.0 * (1 << z)).cast("long")


def tile_y_col(lat: Column, z: int) -> Column:
    # asinh written as ln(t + sqrt(t²+1)) so the DuckDB oracle (no asinh in
    # duckdb 1.0) evaluates the structurally identical expression
    lat_c = F.greatest(F.lit(-85.0511287798066), F.least(F.lit(85.0511287798066), lat))
    t = F.tan(F.radians(lat_c))
    asinh_t = F.log(t + F.sqrt(t * t + 1.0))
    y = (1.0 - asinh_t / float(np.pi)) / 2.0 * (1 << z)
    return F.least(F.lit((1 << z) - 1), F.greatest(F.lit(0), F.floor(y))).cast("long")


def tile_x_sql(lon: str, z: int) -> str:
    return f"CAST(floor((({lon}) + 180.0) / 360.0 * {1 << z}) AS BIGINT)"


def tile_y_sql(lat: str, z: int) -> str:
    clat = f"greatest(-85.0511287798066, least(85.0511287798066, {lat}))"
    t = f"tan(radians({clat}))"
    asinh_t = f"ln(({t}) + sqrt(({t}) * ({t}) + 1.0))"
    expr = f"(1.0 - {asinh_t} / {float(np.pi)!r}) / 2.0 * {1 << z}"
    return f"least({(1 << z) - 1}, greatest(0, CAST(floor({expr}) AS BIGINT)))"


# --------------------------------------------------------------------------
# UTM / misc reference functions
# --------------------------------------------------------------------------


def utm_zone_col(lon: Column) -> Column:
    """U2 (gutils.py:137): zone = ceil(30 + lon/6), clipped [1, 60]."""
    return F.least(F.lit(60), F.greatest(F.lit(1), F.ceil(30.0 + lon / 6.0))).cast("int")


def utm_epsg_col(lat: Column, lon: Column) -> Column:
    return (F.when(lat >= 0, 32600).otherwise(32700) + utm_zone_col(lon)).cast("int")


def color_map_col(col: Column) -> Column:
    """K1 (karta.py:97-102): int → i%24; string → base-36 of alnum-stripped
    prefix, % 24.  JVM-native via conv()."""
    cleaned = F.regexp_replace(col.cast("string"), r"[\W_]", "")
    as_int = F.conv(F.substring(F.upper(cleaned), 1, 12), 36, 10).cast("decimal(38,0)")
    return (as_int % 24).cast("int")
