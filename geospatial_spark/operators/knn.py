"""kNN join via cell-ring expansion (N2, SURVEY §2.6) + broadcast brute
force for small neighbor sets.

The reference has no kNN; the north star names "kNN via cell-ring
expansion".  Two physical strategies (plans.planner picks):

* ``broadcast`` — neighbor side tiny (e.g. a gazetteer): ship the neighbor
  arrays in a vectorized pandas-UDF closure, compute the haversine matrix
  per Arrow batch, top-k by argpartition.  Exact, zero shuffle.
* ``cellring`` — large-large: key both sides by geohash cell at a chosen
  precision, candidate = neighbors in the query's k-ring (ring radius grows
  until enough candidates), exact haversine re-rank with a window
  ``row_number() <= k``.  The ring join is a hash equi-join on cell after
  exploding the query side's ring cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StringType, StructField, StructType

from ..functions import udfs
from ..geo import distance as dist


def knn_join_broadcast(
    points_df: DataFrame,
    neighbors: list[tuple[str, float, float]],
    k: int = 5,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """points × k nearest of `neighbors` [(name, lat, lon), ...].

    Output: point columns + (neighbor_name, rank 1-based, dist_m).
    Deterministic tie-break: (dist, name).
    """
    names = np.array([n for n, _, _ in neighbors], dtype=object)
    nlat = np.array([a for _, a, _ in neighbors], dtype=np.float64)
    nlon = np.array([o for _, _, o in neighbors], dtype=np.float64)
    # pre-sort by name so equal distances resolve by name order stably
    order = np.argsort(names)
    names, nlat, nlon = names[order], nlat[order], nlon[order]
    kk = min(k, len(names))

    # one struct of two rank-ordered arrays per point, built fully
    # vectorized (argpartition → per-row lexsort; no per-row Python); the
    # (name, rank, dist) explode happens JVM-side via posexplode over
    # arrays_zip, so the point's other columns never cross Arrow
    schema = StructType(
        [
            StructField("names", ArrayType(StringType())),
            StructField("dists", ArrayType(DoubleType())),
        ]
    )

    @pandas_udf(schema)
    def _topk(plat: pd.Series, plon: pd.Series) -> pd.DataFrame:
        la = plat.to_numpy()[:, None]
        lo = plon.to_numpy()[:, None]
        d = dist.haversine(la, lo, nlat[None, :], nlon[None, :])  # (n, m)
        part = (
            np.argpartition(d, kk - 1, axis=1)[:, :kk]
            if kk < d.shape[1]
            else np.broadcast_to(np.arange(kk), (d.shape[0], kk))
        )
        d_part = np.take_along_axis(d, part, axis=1)
        name_part = names[part]
        ord_ = np.lexsort((name_part, d_part), axis=1)  # (dist, name) tie-break
        top_d = np.take_along_axis(d_part, ord_, axis=1)
        top_n = np.take_along_axis(name_part, ord_, axis=1)
        return pd.DataFrame(
            {"names": list(top_n), "dists": list(top_d)}
        )

    zipped = F.arrays_zip(
        F.col("__s.names").alias("names"), F.col("__s.dists").alias("dists")
    )
    return (
        points_df.withColumn("__s", _topk(F.col(lat), F.col(lon)))
        .select(
            *[c for c in points_df.columns],
            F.posexplode(zipped).alias("__pos", "__e"),
        )
        .select(
            *[c for c in points_df.columns],
            F.col("__e.names").alias("neighbor_name"),
            (F.col("__pos") + 1).cast("int").alias("rank"),
            F.col("__e.dists").alias("dist_m"),
        )
    )


def knn_join_cellring_planned(
    points_df: DataFrame,
    neighbors_df: DataFrame,
    k: int = 5,
    lat: str = "lat",
    lon: str = "lon",
    n_lat: str = "lat",
    n_lon: str = "lon",
    name: str = "name",
) -> DataFrame:
    """Cell-ring kNN with (precision, max_ring) chosen by the planner from
    the neighbor-set density (plans.planner.choose_knn_params: coarse
    enough that the expected ring population covers ≥ 4k candidates, fine
    enough to bound the candidate join).  One count on the neighbor side;
    the driver's `knn_cellring` query pins (p2, ring 3) for oracle
    stability — this wrapper is the production entry point where the
    neighbor table is data, not a fixture.

    Caveat (inherited from knn_join_cellring and worth repeating because
    the planner uses GLOBAL average density): a spatially clustered
    neighbor set makes points in sparse regions return fewer than k rows
    — the ring window around e.g. an Australian point over a Europe-only
    neighbor table can be empty, with no error.  For skewed neighbor
    geography use knn_join_broadcast (small sets) or pass explicit
    coarser (precision, max_ring) to knn_join_cellring."""
    from ..plans import planner

    n = neighbors_df.count()
    precision, max_ring = planner.choose_knn_params(n, k)
    return knn_join_cellring(
        points_df,
        neighbors_df,
        k=k,
        precision=precision,
        max_ring=max_ring,
        lat=lat,
        lon=lon,
        n_lat=n_lat,
        n_lon=n_lon,
        name=name,
    )


def knn_join_cellring(
    points_df: DataFrame,
    neighbors_df: DataFrame,
    k: int = 5,
    precision: int = 2,
    max_ring: int = 3,
    lat: str = "lat",
    lon: str = "lon",
    n_lat: str = "lat",
    n_lon: str = "lon",
    name: str = "name",
) -> DataFrame:
    """Large-large kNN: ring expansion at geohash `precision`.

    NOTE: exact only when the k-th neighbor lies within the ring radius; we
    take the max ring for all points (rings 0..max_ring unioned via one
    exploded ring set), then window-rank.  Points whose k-th neighbor is
    farther than max_ring cells return fewer/approximate rows — callers pick
    precision/max_ring from neighbor density (plans.planner).

    Everything up to the exact haversine re-rank is pure JVM column math
    (round 3): both sides quantize to the geohash integer grid
    (floor-quantize identical to geo.geohash.quantize), the ring is an
    explode over the literal (di, dj) offset array with longitude wrap
    (pmod) and latitude cut at the poles, and the equi-join keys on the
    BIGINT grid id qx*NJ+qy — zero Python crossings, 8-byte join keys.
    Ring membership is exactly the kernel's neighbors_ring set (Chebyshev
    ≤ max_ring, lon circular NI>2·ring+1, lat rows outside [0, NJ) dropped
    — the kernel clamps instead, which can only re-emit cells already in
    the ring, so the joined PAIR set is identical and duplicate-free).
    """
    from ..geo import geohash as gh

    lon_bits, lat_bits = gh._bits(precision)
    NI, NJ = 1 << lon_bits, 1 << lat_bits
    if NI <= 2 * max_ring + 1:
        raise ValueError("ring wider than the longitude grid: raise precision")

    def _q(col, off: float, span: float, n: int):
        return F.least(
            F.lit(n - 1),
            F.greatest(F.lit(0), F.floor((col + off) / span * float(n))),
        ).cast("long")

    offs = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in range(-max_ring, max_ring + 1)
            for dj in range(-max_ring, max_ring + 1)
        ]
    )
    pts = (
        points_df.withColumn("__qx", _q(F.col(lon), 180.0, 360.0, NI))
        .withColumn("__qy", _q(F.col(lat), 90.0, 180.0, NJ))
        .withColumn("__o", F.explode(offs))
        .withColumn("__nqy", F.col("__qy") + F.col("__o.dj"))
        .filter((F.col("__nqy") >= 0) & (F.col("__nqy") < NJ))
        .withColumn(
            "__probe",
            F.pmod(F.col("__qx") + F.col("__o.di"), F.lit(NI)) * NJ + F.col("__nqy"),
        )
        .drop("__o", "__qx", "__qy", "__nqy")
    )

    nb = neighbors_df.select(
        F.col(name).alias("neighbor_name"),
        F.col(n_lat).alias("__nlat"),
        F.col(n_lon).alias("__nlon"),
    ).withColumn(
        "__probe",
        _q(F.col("__nlon"), 180.0, 360.0, NI) * NJ + _q(F.col("__nlat"), 90.0, 180.0, NJ),
    )

    cand = pts.join(nb, "__probe", "inner").drop("__probe")
    # a neighbor can match via several ring cells? no — each neighbor has ONE
    # cell; the query's ring contains each cell once → no duplicate pairs.
    cand = cand.withColumn(
        "dist_m",
        udfs.haversine_col(F.col(lat), F.col(lon), F.col("__nlat"), F.col("__nlon")),
    )
    w = Window.partitionBy(*[F.col(c) for c in points_df.columns]).orderBy(
        F.col("dist_m").asc(), F.col("neighbor_name").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*points_df.columns, "neighbor_name", "rank", "dist_m")
    )
