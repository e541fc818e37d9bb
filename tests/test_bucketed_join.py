"""Co-located bucketed PIP join (operators/colocate.py): the cell shuffle
is paid once at write time, and the join plan afterwards has ZERO Exchange
— the 100 TB amortization for repeated large-large spatial joins."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from geospatial_spark.operators import colocate, pip_join as pj
from geospatial_spark.sources import pages as src

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark):
    pts = src.extract_points(src.pages(spark, SF), src.gazetteer(spark))
    colocate.write_points_bucketed(pts, "t_pts_b", n_buckets=8, precision=4)
    colocate.write_polygon_cells_bucketed(
        src.regions(spark), "t_cells_b", n_buckets=8, precision=4
    )
    yield "t_pts_b", "t_cells_b"
    spark.sql("DROP TABLE IF EXISTS t_pts_b")
    spark.sql("DROP TABLE IF EXISTS t_cells_b")


def test_bucketed_pip_join_zero_exchange(spark, bucketed_tables):
    pts_t, cells_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocate.pip_join_bucketed(
            spark, pts_t, cells_t, point_cols=("url", "entity", "lat", "lon")
        )
        p = _plan(j)
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # both scans are bucketed reads
        assert len(re.findall(r"Bucketed: true", p)) == 2, p
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # row-identical to the ad-hoc shuffle join on the same inputs
    pts = src.extract_points(src.pages(spark, SF), src.gazetteer(spark))
    expect = pj.pip_join(
        pts,
        src.regions(spark),
        poly_id="region_id",
        precision=4,
        strategy="shuffle",
        salt=1,
        point_cols=("url", "entity", "lat", "lon"),
    ).count()
    assert n == expect == 9803


def test_bucket_spec_mismatch_raises(spark, bucketed_tables):
    """The guard only reads catalog metadata, so a 1-row synthetic table
    with a different bucket count (and one bucketed on a cell-ish but
    wrong column) is enough — no need to rebuild the point corpus."""
    tiny = spark.range(1).selectExpr("id as cell", "id as v")
    colocate.write_bucketed(tiny, "t_tiny_b16", "cell", 16)
    tiny2 = spark.range(1).selectExpr("id as cell_salted", "id as cell", "id as v")
    colocate.write_bucketed(tiny2, "t_tiny_wrongcol", "cell_salted", 8)
    try:
        with pytest.raises(ValueError, match="matching cell bucket specs"):
            colocate.pip_join_bucketed(spark, "t_tiny_b16", bucketed_tables[1])
        with pytest.raises(ValueError, match="matching cell bucket specs"):
            colocate.pip_join_bucketed(spark, "t_tiny_wrongcol", bucketed_tables[1])
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tiny_b16")
        spark.sql("DROP TABLE IF EXISTS t_tiny_wrongcol")
