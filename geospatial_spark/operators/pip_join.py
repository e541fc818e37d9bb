"""Point-in-polygon spatial join — the engine's flagship operator.

Semantics = reference ``quick_intersection`` / ``intersection``
(``/root/reference/geoparse/gutils.py:407-529``): inner theta-join on exact
ST_Contains(point, polygon), returning one output row per (point, polygon)
pair.  The reference's R-tree bbox prefilter + exact refine
(``gutils.py:511→517``) becomes the distributed filter/refine plan:

  1. FILTER  — polygons → covering geohash cells at join precision
               (polycell UDF, hole-safe), exploded to (cell, poly) rows;
               points → their cell (pointcell UDF); hash equi-join on cell.
  2. REFINE  — exact even-odd PIP pandas UDF on the candidate pairs.

Strategies (plans.planner picks one):

* ``broadcast`` — polygon side small (reference's quick_intersection case):
  the (cell, poly) relation is broadcast; geometries ride in the refine
  UDF's closure.  Zero shuffle of the point side.
* ``shuffle``   — large-large: both sides exchange on cell; heavy cells
  (megacities — north rule N5) are salted: the point side appends a salt
  from ``pmod(xxhash64(point), s)``, the polygon side replicates each heavy
  (cell, poly) row s ways.  AQE skew-join stays on as backstop.

A point has exactly one cell at the join precision and a polygon's cell set
is deduplicated, so the candidate join produces no duplicate pairs — no
post-join distinct needed (shuffle saved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import udfs


def polygon_cells(
    polys_df: DataFrame, poly_id: str, precision: int, geometry: str = "geometry"
) -> DataFrame:
    """polycell (G1): polygon side → exploded (cell, poly_id) relation."""
    fill = udfs.geohash_polyfill_udf(precision, mode="intersects")
    return (
        polys_df.select(poly_id, geometry)
        .withColumn("__cells", fill(F.col(geometry)))
        .select(F.col(poly_id), F.explode("__cells").alias("cell"))
    )


def pip_join(
    points_df: DataFrame,
    polys_df: DataFrame,
    *,
    poly_id: str = "region_id",
    geometry: str = "geometry",
    lat: str = "lat",
    lon: str = "lon",
    precision: int = 4,
    strategy: str = "broadcast",
    salt: int = 8,
    heavy_cell_rows: int = 100_000,
    point_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Inner PIP join: rows of points_df × matching poly_id.

    Output: point columns + poly_id.
    """
    out_cols = list(point_cols) if point_cols else [c for c in points_df.columns]
    cells = polygon_cells(polys_df, poly_id, precision, geometry)
    enc = udfs.geohash_encode_udf(precision)
    pts = points_df.withColumn("__cell", enc(F.col(lat), F.col(lon)))

    # geometry dictionary for the exact refine (small side by contract in
    # broadcast mode; in shuffle mode the polygon count is still the small
    # *table* — it is the candidate-pair volume that is large)
    geoms = {
        r[poly_id]: bytes(r[geometry])
        for r in polys_df.select(poly_id, geometry).collect()
    }
    refine = udfs.pip_refine_udf(geoms)

    if strategy == "broadcast":
        cand = pts.join(F.broadcast(cells), pts["__cell"] == cells["cell"], "inner")
    else:
        # explicit skew salting (N5): find heavy point cells, replicate the
        # polygon side for those cells `salt` ways
        heavy = (
            pts.groupBy("__cell")
            .count()
            .filter(F.col("count") > heavy_cell_rows)
            .select(F.col("__cell").alias("cell"), F.lit(True).alias("__heavy"))
        )
        cells_s = (
            cells.join(F.broadcast(heavy), "cell", "left")
            .withColumn(
                "__salts",
                F.when(
                    F.col("__heavy").isNotNull(), F.sequence(F.lit(0), F.lit(salt - 1))
                ).otherwise(F.array(F.lit(0))),
            )
            .select("cell", poly_id, F.explode("__salts").alias("__salt"))
        )
        salt_src = out_cols[0] if out_cols else "__cell"
        pts_s = (
            pts.join(F.broadcast(heavy), pts["__cell"] == heavy["cell"], "left")
            .withColumn(
                "__salt",
                F.when(
                    F.col("__heavy").isNotNull(),
                    F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt)),
                ).otherwise(F.lit(0)),
            )
            .drop("cell", "__heavy")
        )
        cand = pts_s.join(
            cells_s,
            (pts_s["__cell"] == cells_s["cell"]) & (pts_s["__salt"] == cells_s["__salt"]),
            "inner",
        )

    refined = cand.filter(refine(F.col(poly_id), F.col(lon), F.col(lat)))
    return refined.select(*[F.col(c) for c in out_cols], F.col(poly_id))


def pip_join_counts(joined: DataFrame, poly_id: str = "region_id") -> DataFrame:
    """The reference's per-polygon match `counts` side output
    (gutils.py:459,528) — partial+final agg, Catalyst-automatic."""
    return joined.groupBy(poly_id).agg(F.count(F.lit(1)).alias("n_points"))
