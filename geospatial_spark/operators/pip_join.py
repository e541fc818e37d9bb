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
    polys_df: DataFrame,
    poly_id: str,
    precision: int,
    geometry: str = "geometry",
    keep_geometry: bool = False,
) -> DataFrame:
    """polycell (G1): polygon side → exploded (cell, poly_id) relation.

    ``keep_geometry`` carries the WKB through the explode so the shuffle
    join can refine without any driver-side geometry collect."""
    fill = udfs.geohash_polyfill_udf(precision, mode="intersects")
    cols = [F.col(poly_id), F.explode("__cells").alias("cell")]
    if keep_geometry:
        cols.append(F.col(geometry).alias("__geom"))
    return (
        polys_df.select(poly_id, geometry)
        .withColumn("__cells", fill(F.col(geometry)))
        .select(*cols)
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
    enc = udfs.geohash_encode_udf(precision)
    pts = points_df.withColumn("__cell", enc(F.col(lat), F.col(lon)))

    if strategy == "broadcast":
        # small polygon side by contract: the (cell, poly) index is built
        # DRIVER-side with the local numpy kernels (exactly the reference's
        # quick_intersection R-tree build, gutils.py:463) and broadcast;
        # geometries ship once per executor in the refine UDF's closure.
        # Building locally avoids a 1-task Spark job (polyfill UDF over the
        # tiny polygon table) inside every action's broadcast build.
        from ..geo import geom as gm
        from ..geo import polyfill as pf

        rows = polys_df.select(poly_id, geometry).collect()
        geoms = {r[poly_id]: bytes(r[geometry]) for r in rows}
        spark = polys_df.sparkSession
        cell_rows = [
            (r[poly_id], str(c))
            for r in rows
            for c in pf.geohash_polyfill(
                gm.parse_wkb(bytes(r[geometry])), precision, "intersects"
            )
        ]
        id_type = polys_df.schema[poly_id].dataType.simpleString()
        cells = spark.createDataFrame(
            cell_rows, f"`{poly_id}` {id_type}, cell string"
        )
        refine = udfs.pip_refine_udf(geoms)
        cand = pts.join(F.broadcast(cells), pts["__cell"] == cells["cell"], "inner")
        refined = cand.filter(refine(F.col(poly_id), F.col(lon), F.col(lat)))
    else:
        # large-large: NO driver-side geometry collect — the WKB rides the
        # exploded (cell, poly, geom) relation through the shuffle and the
        # refine UDF memoizes parses per executor.  Explicit skew salting
        # (N5): heavy point cells replicate the polygon side `salt` ways.
        from pyspark import StorageLevel

        cells = polygon_cells(polys_df, poly_id, precision, geometry, keep_geometry=True)
        # the point side feeds the heavy-cell histogram AND the probe join —
        # persist so extraction/encode lineage runs once (at 100 TB this is
        # a disk-backed materialization, the standard two-pass skew pattern);
        # registered with functions.caching so long-lived sessions release it
        from ..functions import caching

        pts = caching.track(pts.persist(StorageLevel.MEMORY_AND_DISK))
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
            .select("cell", poly_id, "__geom", F.explode("__salts").alias("__salt"))
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
        refine = udfs.pip_refine_wkb_udf()
        refined = cand.filter(refine(F.col("__geom"), F.col(lon), F.col(lat)))

    return refined.select(*[F.col(c) for c in out_cols], F.col(poly_id))


def pip_join_counts(joined: DataFrame, poly_id: str = "region_id") -> DataFrame:
    """The reference's per-polygon match `counts` side output
    (gutils.py:459,528) — partial+final agg, Catalyst-automatic."""
    return joined.groupBy(poly_id).agg(F.count(F.lit(1)).alias("n_points"))
