"""Connected-components cluster assignment vs a local union-find oracle."""

from __future__ import annotations

from geospatial_spark.operators import dedup as dd
from geospatial_spark.sources import pages as src

SF = "/root/testdata/sf0.001"


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    pairs_df = dd.dedup_minhash(src.pages(spark, SF)).select("id_a", "id_b")
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
    want = _union_find(pairs)
    got = {
        r["id"]: r["cluster"]
        for r in dd.dedup_clusters(pairs_df).collect()
    }
    assert got == want
    # every cluster label is its own minimum member
    for x, c in got.items():
        assert c <= x
        assert got[c] == c
