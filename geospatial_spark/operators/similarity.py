"""Similarity search over the ``embeddings`` table (array<float> column).

* ``ann_topk``      — exact brute-force cosine top-k: query subset ×
  broadcast/shuffled candidates, JVM ``zip_with``/``aggregate`` exact-int
  dot product, window ``row_number() <= k``.  The correctness baseline.
* ``ann_lsh_topk``  — the scale path: SRP (signed-random-projection) LSH
  bucket blocking; candidates restricted to the query's bucket, then the
  same exact re-rank.  Recall < 1 by construction; the oracle replicates
  the bucketing exactly so parity is still bitwise.

Both are pure relational plans (no Python UDF): cosine is computed on
1e6-scaled int64 vectors (floor(x*1e6+0.5)) so dot/norms are exact integers
and only the final sqrt/divide touches IEEE doubles — deterministic and
DuckDB-mirrorable.

Scale notes: at 10^9+ vectors brute force is a cross join — the LSH plan
replaces it with an equi-join on bucket (one shuffle each side); bucket
count 2^n_planes is the partition-count lever, and heavy buckets split via
AQE.  For 100 TB the candidate side would additionally be IVF-partitioned
per bucket file (same cell-partitioning machinery the geo side uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH


def _scaled(emb_df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
    return emb_df.select(
        F.col(id_col).alias("id"), TH.emb_scaled(F.col(vec_col), dim).alias("v")
    ).withColumn("norm2", TH.int_dot(F.col("v"), F.col("v")))


def _cos_ppm() -> F.Column:
    return F.floor(
        F.lit(1e6)
        * F.col("dot")
        / F.sqrt(F.col("qn2").cast("double") * F.col("cn2").cast("double"))
    ).cast("bigint")


def ann_topk(
    emb_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    query_mod: int = 50,
) -> DataFrame:
    """Exact top-k cosine neighbors for the deterministic query subset
    (vec_id % query_mod == 0) against all vectors (self excluded).

    Output: (query_id, neighbor_id, rank, cos_ppm)."""
    base = _scaled(emb_df, id_col, vec_col, dim)
    q = base.filter(F.col("id") % query_mod == 0).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("norm2").alias("qn2")
    )
    c = base.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm2").alias("cn2"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("dot", TH.int_dot(F.col("qv"), F.col("cv"))).withColumn(
        "cos_ppm", _cos_ppm()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_ppm")
    )


def ann_lsh_topk(
    emb_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    query_mod: int = 50,
    n_planes: int | None = None,
) -> DataFrame:
    """SRP-LSH approximate top-k: candidates share the query's bucket.

    ``n_planes=None`` scales the bucket count with corpus size
    (texthash.auto_planes) so per-bucket candidate work stays constant."""
    if n_planes is None:
        n_planes = TH.auto_planes(emb_df.count())
    planes = TH.srp_planes(n_planes, dim)
    base = _scaled(emb_df, id_col, vec_col, dim).withColumn(
        "bucket", TH.srp_bucket(F.col("v"), planes)
    )
    q = base.filter(F.col("id") % query_mod == 0).select(
        F.col("bucket"),
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm2").alias("qn2"),
    )
    c = base.select(
        F.col("bucket"),
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm2").alias("cn2"),
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("dot", TH.int_dot(F.col("qv"), F.col("cv"))).withColumn(
        "cos_ppm", _cos_ppm()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_ppm")
    )


def ivf_centroid_step(n_rows: int, min_centroids: int = 16) -> int:
    """Deterministic-sampling stride giving ~√N centroids: every id with
    id % step == 1 % step is a centroid (the ``1 % step`` form makes the
    degenerate step == 1 select EVERY vector — round-2 advice: with the bare
    ``id % 1 == 1`` filter a corpus under ~32 vectors silently selected zero
    centroids and returned an empty result, mirrored by the oracle so the
    gate could not see it).

    √N is the classic IVF balance point (assignment work N×C and per-list
    scan N/C·nprobe both grow as N^1.5 — vs N²/mod for the round-1 fixed
    modulus, whose centroid count AND broadcast size grew linearly with N).
    math.floor(math.sqrt()) mirrors the oracle's floor(sqrt()) exactly."""
    import math

    if n_rows <= 0:
        return 1
    c = max(min_centroids, int(math.floor(math.sqrt(n_rows))))
    return max(1, n_rows // c)


def ann_ivf_topk(
    emb_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    query_mod: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: the second scale path besides SRP-LSH.

    Coarse "centroids" are a deterministic ~√N sample of the corpus itself
    (id % ivf_centroid_step(N) == 1 — IVF-flat with sampled centroids; a
    real deployment would k-means them, which is a training step outside
    the deterministic-oracle scope).  Every vector is assigned to its
    nearest centroid (exact-int cosine, ties → smaller centroid id);
    queries probe their `nprobe` nearest centroid lists and exact-re-rank.

    Plan shape: assignment is a broadcast cross join N×√N + window rank
    (the broadcast side is √N rows — bounded, unlike the round-1 linear
    rule); the probe join is an equi-join on centroid id — one shuffle
    keyed by list id, AQE-splittable when a list is hot."""
    step = ivf_centroid_step(emb_df.count())
    base = _scaled(emb_df, id_col, vec_col, dim)
    cents = base.filter(F.col("id") % step == 1 % step).select(
        F.col("id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("norm2").alias("cn2"),
    )

    def rank_centroids(side: DataFrame, keep: int, out_prefix: str) -> DataFrame:
        pairs = side.crossJoin(F.broadcast(cents))
        scored = pairs.withColumn("dot", TH.int_dot(F.col("v"), F.col("cv"))).withColumn(
            "c_cos",
            F.floor(
                F.lit(1e6)
                * F.col("dot")
                / F.sqrt(F.col("norm2").cast("double") * F.col("cn2").cast("double"))
            ).cast("bigint"),
        )
        w = Window.partitionBy("id").orderBy(
            F.col("c_cos").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= keep)
            .select(
                F.col("id").alias(f"{out_prefix}_id"),
                F.col("cent_id"),
                F.col("v").alias(f"{out_prefix}_v"),
                F.col("norm2").alias(f"{out_prefix}_n2"),
            )
        )

    assigned = rank_centroids(base, 1, "c")  # inverted lists
    probes = rank_centroids(
        base.filter(F.col("id") % query_mod == 0), nprobe, "q"
    )
    cand = (
        probes.join(assigned, "cent_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.col("q_v").alias("qv"),
            F.col("q_n2").alias("qn2"),
            F.col("c_v").alias("cv"),
            F.col("c_n2").alias("cn2"),
        )
        .distinct()
    )
    scored = cand.withColumn("dot", TH.int_dot(F.col("qv"), F.col("cv"))).withColumn(
        "cos_ppm", _cos_ppm()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_ppm")
    )
