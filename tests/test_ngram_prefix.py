"""Exact-recall property of dedup_ngram's rarest-first prefix filtering.

The All-Pairs prefix-filter lemma (see operators/dedup._ngram_doc_arrays)
claims: uncapped, the candidate buckets cover EVERY pair with word-n-gram
Jaccard >= threshold.  This test checks the full operator output against a
brute-force all-pairs Jaccard on a deterministic corpus subset — any
prefix-length off-by-one (the exact integer ceiling) or mis-ordering of
the (df, h) global gram order would lose pairs here."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_spark.operators import dedup as dd
from geospatial_spark.sources import pages as src

SF = "/root/testdata/sf0.001"
T_PPM = 800_000


def test_uncapped_prefix_filter_equals_brute_force(spark):
    pages = src.pages(spark, SF).filter(
        F.abs(F.xxhash64("url")) % 20 == 0
    )
    # brute force: every doc pair, exact Jaccard over distinct shingle sets
    arrs = (
        dd.shingle_hashes(pages)
        .groupBy("id")
        .agg(F.collect_list("h").alias("arr"), F.count(F.lit(1)).alias("n"))
    )
    a = arrs.select(
        F.col("id").alias("id_a"), F.col("arr").alias("arr_a"), F.col("n").alias("na")
    )
    b = arrs.select(
        F.col("id").alias("id_b"), F.col("arr").alias("arr_b"), F.col("n").alias("nb")
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint"))
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn(
            "jac_ppm", F.floor(F.lit(1e6) * F.col("inter") / F.col("uni")).cast("bigint")
        )
        .filter(F.col("jac_ppm") >= T_PPM)
        .select("id_a", "id_b", "jac_ppm")
    )
    got = dd.dedup_ngram(pages, threshold_ppm=T_PPM, max_block=None).select(
        "id_a", "id_b", "jac_ppm"
    )
    expected = {tuple(r) for r in brute.collect()}
    actual = {tuple(r) for r in got.collect()}
    assert expected, "fixture subset produced no near-dup pairs — test is vacuous"
    assert actual == expected
