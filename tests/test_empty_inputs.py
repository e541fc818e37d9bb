"""Empty-input robustness: every operator family must return an empty
result (not raise) on empty point/page/embedding/polygon inputs — the
standard production edge (an empty partition of a date-partitioned feed,
a filter that matches nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_spark.operators import dedup as dd
from geospatial_spark.operators import knn as knn_ops
from geospatial_spark.operators import pip_join as pj
from geospatial_spark.operators import similarity as sim
from geospatial_spark.operators import textstats as ts
from geospatial_spark.sources import pages as src

SF = "/root/testdata/sf0.001"


def test_operators_handle_empty_inputs(spark):
    empty_pages = src.pages(spark, SF).filter(F.lit(False))
    empty_emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    pts = src.extract_points(src.pages(spark, SF), src.gazetteer(spark))
    empty_pts = pts.filter(F.lit(False))

    assert dd.dedup_exact(empty_pages).count() == 0
    assert dd.dedup_minhash(empty_pages, max_bucket=8).count() == 0
    assert dd.dedup_simhash(empty_pages, max_bucket=8).count() == 0
    assert dd.dedup_ngram(empty_pages, max_block=16).count() == 0
    assert dd.dedup_embed(empty_emb).count() == 0
    assert sim.ann_topk(empty_emb).count() == 0
    assert sim.ann_lsh_topk(empty_emb).count() == 0
    assert sim.ann_ivf_topk(empty_emb).count() == 0
    assert (
        ts.lang_id(
            empty_pages.selectExpr("url as doc_id", "text", "lang"), spark
        ).count()
        == 0
    )
    assert ts.repetition_stats(empty_pages, id_col="url").count() == 0
    assert (
        pj.pip_join(empty_pts, src.regions(spark), point_cols=("url", "entity")).count()
        == 0
    )
    assert (
        pj.pip_join(
            pts,
            src.regions(spark).filter(F.lit(False)),
            point_cols=("url", "entity"),
        ).count()
        == 0
    )
    assert knn_ops.knn_join_broadcast(empty_pts, [("x", 0.0, 0.0)], k=5).count() == 0


def test_operators_handle_adversarial_text(spark):
    """NULL text, whitespace-only, sub-gram-length, unicode, CJK (no ascii
    tokens), and a 25k-char doc all flow through the dedup/textstats
    families without raising; the one genuine duplicate pair (u8/u9) is
    found by every scheme."""
    rows = [
        ("u1", None),
        ("u2", ""),
        ("u3", "  "),
        ("u4", "héllo wörld héllo wörld naïve café désert über"),
        ("u5", "a"),
        ("u6", "word " * 5000),
        ("u7", "你好世界 你好"),
        ("u8", "normal text with some words repeated words repeated words"),
        ("u9", "normal text with some words repeated words repeated words"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    assert dd.dedup_exact(df).count() == 1
    assert dd.dedup_minhash(df, max_bucket=8).count() == 1
    assert dd.dedup_simhash(df, max_bucket=8).count() == 1
    assert dd.dedup_ngram(df, max_block=16).count() == 1
    assert ts.text_quality(df, id_col="url").count() == len(rows)
    assert ts.repetition_stats(df, id_col="url").count() == 4
