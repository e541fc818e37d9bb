"""Bucketed co-located spatial join — pay the cell shuffle ONCE, at write
time (north star: "broadcast-indexes small polygon sets, range-partitions /
bucketing for co-located large-large joins").

At 100 TB, a point corpus that is joined repeatedly against the same
polygon corpus on the same cell key should not re-shuffle both sides per
query.  Both sides are written as Spark bucketed tables on the BIGINT
interleaved cell code (``udfs.geohash_int_col`` — the join-key form every
spatial join here uses) with the SAME bucket count; every subsequent cell
equi-join then runs with ZERO Exchange: Spark's bucketed scan feeds bucket
k of both tables to the same task (SortMergeJoin over co-located buckets,
``tests/test_bucketed_join.py`` pins the plan).  This is the standard
amortization for repeated large-large joins; the ad-hoc single-query path
stays ``pip_join(strategy="shuffle")``.

Reference semantics: identical to pip_join (filter on cell, exact even-odd
PIP refine — gutils.py:407-529); only the physical layout differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import udfs
from .pip_join import polygon_cells, refine_candidates


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int) -> None:
    """Write `df` as a parquet table bucketed (and in-bucket sorted) on
    `key`.  Sorting lets the bucketed SortMergeJoin skip the per-task sort
    when each bucket is a single file (one writer wave)."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def write_points_bucketed(
    points_df: DataFrame,
    table: str,
    n_buckets: int,
    precision: int = 4,
    lat: str = "lat",
    lon: str = "lon",
) -> None:
    """Point side: attach the JVM BIGINT cell code and bucket on it."""
    pts = points_df.withColumn(
        "cell", udfs.geohash_int_col(F.col(lat), F.col(lon), precision)
    )
    write_bucketed(pts, table, "cell", n_buckets)


def write_polygon_cells_bucketed(
    polys_df: DataFrame,
    table: str,
    n_buckets: int,
    poly_id: str = "region_id",
    precision: int = 4,
    geometry: str = "geometry",
) -> None:
    """Polygon side: explode to the (cell, poly, wkb) covering relation
    (polycell, hole-safe) and bucket on the same cell code."""
    cells = polygon_cells(
        polys_df, poly_id, precision, geometry, keep_geometry=True, codes=True
    )
    write_bucketed(cells, table, "cell", n_buckets)


def _bucket_spec(spark: SparkSession, table: str) -> tuple[int, tuple[str, ...]]:
    """(num buckets, bucket column names) for `table`, read structurally
    from the session catalog's CatalogTable.bucketSpec via the JVM (round-3
    advice: the previous DESCRIBE FORMATTED display-string parse breaks on
    any formatting change).  Unbucketed tables return (0, ()).

    The DESCRIBE FORMATTED parse is kept only as a fallback for catalog
    implementations without a py4j-reachable SessionCatalog; it is pinned
    to the display format of Spark 3.x/4.x (`Num Buckets` / "[`cell`]").
    Both routes fail CLOSED: a spec that cannot be read comes back as
    n=0 and pip_join_bucketed raises."""
    try:
        jss = spark._jsparkSession.sessionState()
        ident = jss.sqlParser().parseTableIdentifier(table)
        meta = jss.catalog().getTableMetadata(ident)
        bs = meta.bucketSpec()
        if not bs.isDefined():
            return 0, ()
        b = bs.get()
        # Scala Seq[String] → one py4j call: NUL-join (NUL is illegal in
        # SQL identifiers, so the split is unambiguous)
        cols = tuple(str(b.bucketColumnNames().mkString("\x00")).split("\x00"))
        return int(b.numBuckets()), cols
    except Exception:
        pass
    n, cols_s = 0, ""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols_s = r["data_type"]
    cols = tuple(
        c.strip().strip("`") for c in cols_s.strip("[]").split(",") if c.strip()
    )
    return n, cols


def pip_join_bucketed(
    spark: SparkSession,
    points_table: str,
    cells_table: str,
    poly_id: str = "region_id",
    lat: str = "lat",
    lon: str = "lon",
    point_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Zero-exchange PIP join over two co-bucketed tables: cell equi-join
    (bucket-local) + exact Arrow PIP refine.  Row-identical to
    pip_join(strategy='shuffle', salt=1) on the same inputs.

    Raises if the two tables' bucket specs differ — Spark would otherwise
    silently insert an Exchange (or fall back to an unbucketed scan) and
    the whole point of the co-located layout would quietly evaporate."""
    pn, pc = _bucket_spec(spark, points_table)
    cn, cc = _bucket_spec(spark, cells_table)
    # the bucket column list must be EXACTLY ("cell",) — a substring test
    # would accept e.g. `cell_salted`, where the join key is not the bucket
    # key and Spark silently exchanges both sides anyway
    if pn == 0 or pn != cn or pc != ("cell",) or cc != ("cell",):
        raise ValueError(
            f"co-located join requires matching cell bucket specs: "
            f"{points_table}=({pn}, {pc}) vs {cells_table}=({cn}, {cc})"
        )
    pts = spark.table(points_table)
    cells = spark.table(cells_table)
    out_cols = (
        list(point_cols)
        if point_cols
        else [c for c in pts.columns if c != "cell"]
    )
    cand = pts.join(cells, "cell", "inner")
    return refine_candidates(cand, lon, lat, out_cols, poly_id)
