"""Planner-lite decisions (plans/planner.py)."""

from __future__ import annotations

from geospatial_spark.plans import planner
from geospatial_spark.sources import pages as src


def test_choose_precision_regions(spark):
    p = planner.choose_precision(src.regions(spark))
    assert 2 <= p <= 6  # few-degree boxes → mid precision


def test_pip_plan_small_polys_broadcasts(spark):
    pts = src.extract_points(
        src.pages(spark, "/root/testdata/sf0.001"), src.gazetteer(spark)
    )
    plan = planner.choose_pip_plan(pts, src.regions(spark))
    assert plan.strategy == "broadcast"  # 64 small boxes → tiny cell index
    assert plan.salt == 1


def test_knn_params_bounds():
    p, r = planner.choose_knn_params(n_neighbors_total=276, k=5)
    assert 1 <= p <= 6 and 1 <= r <= 3
    p2, r2 = planner.choose_knn_params(n_neighbors_total=10_000_000, k=10)
    assert p2 >= p  # denser neighbors → finer cells
