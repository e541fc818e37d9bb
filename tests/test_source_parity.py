"""Bit-identical parity of the derived tables: Spark builders vs DuckDB
oracle CTEs (the foundation of every oracle-checked query)."""

from __future__ import annotations

from geospatial_spark.sources import oracle as osql
from geospatial_spark.sources import pages as src

from .conftest import SF_SMOKE, duck_con, rows_of_duck, rows_of_spark


def test_gazetteer_parity(spark):
    con = duck_con(SF_SMOKE)
    got = rows_of_spark(
        src.gazetteer(spark).selectExpr("idx AS i", "name", "lat", "lon", "population")
    )
    want = rows_of_duck(
        con, "WITH " + osql.gaz_cte() + " SELECT i, name, lat, lon, population FROM gaz"
    )
    assert got == want


def test_pages_parity(spark):
    con = duck_con(SF_SMOKE)
    got = rows_of_spark(src.pages(spark, SF_SMOKE).select("url", "warc_ts", "text", "lang"))
    want = rows_of_duck(
        con,
        "WITH "
        + osql.gaz_cte()
        + ",\n"
        + osql.pages_cte()
        + " SELECT url, warc_ts, text, lang FROM pages",
    )
    assert len(got) == 500 * 16
    assert got == want


def test_points_parity(spark):
    con = duck_con(SF_SMOKE)
    pg = src.pages(spark, SF_SMOKE)
    gaz = src.gazetteer(spark)
    got = rows_of_spark(src.extract_points(pg, gaz))
    want = rows_of_duck(
        con, osql.with_geo_ctes("SELECT url, entity, lat, lon FROM points")
    )
    assert len(got) > 1000
    assert got == want


def test_regions_parity(spark):
    con = duck_con(SF_SMOKE)
    got = rows_of_spark(
        src.regions(spark).select("region_idx", "region_id", "minx", "miny", "maxx", "maxy")
    )
    want = rows_of_duck(
        con,
        "WITH "
        + osql.gaz_cte()
        + ",\n"
        + osql.regions_cte()
        + " SELECT region_idx, region_id, minx, miny, maxx, maxy FROM regions",
    )
    assert got == want
