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

    schema = ArrayType(
        StructType(
            [
                StructField("neighbor_name", StringType()),
                StructField("rank", IntegerType()),
                StructField("dist_m", DoubleType()),
            ]
        )
    )

    @pandas_udf(schema)
    def _topk(plat: pd.Series, plon: pd.Series) -> pd.Series:
        la = plat.to_numpy()[:, None]
        lo = plon.to_numpy()[:, None]
        d = dist.haversine(la, lo, nlat[None, :], nlon[None, :])  # (n, m)
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        out = []
        for row_d, row_i in zip(d, part):
            cand = sorted(zip(row_d[row_i], names[row_i]))  # (dist, name) tie-break
            out.append(
                [
                    {"neighbor_name": nm, "rank": r + 1, "dist_m": float(dv)}
                    for r, (dv, nm) in enumerate(cand)
                ]
            )
        return pd.Series(out)

    return (
        points_df.withColumn("__knn", _topk(F.col(lat), F.col(lon)))
        .withColumn("__e", F.explode("__knn"))
        .select(
            *[c for c in points_df.columns],
            F.col("__e.neighbor_name").alias("neighbor_name"),
            F.col("__e.rank").alias("rank"),
            F.col("__e.dist_m").alias("dist_m"),
        )
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
    """
    ring_udf = udfs.geohash_neighbors_udf(precision, ring=max_ring)
    enc = udfs.geohash_encode_udf(precision)
    pts = points_df.withColumn("__cell", enc(F.col(lat), F.col(lon)))
    pts = pts.withColumn("__ring", ring_udf(F.col("__cell")))
    pts = pts.withColumn("__probe", F.explode("__ring")).drop("__ring", "__cell")

    nb = neighbors_df.select(
        F.col(name).alias("neighbor_name"),
        F.col(n_lat).alias("__nlat"),
        F.col(n_lon).alias("__nlon"),
    ).withColumn("__probe", enc(F.col("__nlat"), F.col("__nlon")))

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
