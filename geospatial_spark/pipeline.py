"""The flagship end-to-end pipeline, materialized through icelite with
per-partition lineage (north rule: every stage writes lineage rows; a
killed run resumes from the last committed partition).

Stages (each an icelite table with its own manifest + lineage):

  1. points   — pages → geo-entity extraction → gazetteer geocode,
                partitioned by S2 cell id (RANGE partitioning over the
                Hilbert curve: S2 ids at a fixed level are Hilbert-ordered
                by construction, so contiguous id ranges are spatially
                contiguous — the north star's "range-partition by
                Hilbert-ordered cells" for large-large joins, giving
                file-level pruning for cell-range predicates).
  2. joined   — broadcast PIP join into the region polygons.
  3. tiles    — z12 tile-cell assignments.

Run via ``run(spark, sf_dir, out_root)`` (used by spark-submit and the
resume test).  Each stage skips partitions already committed — rerunning
after a kill completes only the remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import udfs
from .icelite import catalog as ice
from .operators import pip_join as pj
from .operators import tiling
from .sources import pages as src

S2_LEVEL = 12


def hilbert_range_bounds(
    df: DataFrame, key_col: str, n_partitions: int
) -> list[int]:
    """Range-partition bounds over the Hilbert-ordered S2 id space from a
    sample (driver-side quantiles; deterministic given the data).

    Ids are stored as signed int64, so the range order is the Hilbert
    order with one seam where uint64 ids ≥ 2^63 (faces 4-5) wrap to
    negative — contiguity holds within every partition except the single
    seam partition, and min/max pruning stays exact because query ranges
    use the same signed order."""
    qs = [i / n_partitions for i in range(1, n_partitions)]
    return [int(b) for b in df.stat.approxQuantile(key_col, qs, 0.001)]


def run(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    *,
    n_partitions: int = 16,
    batch_size: int = 4,
    fail_after_batches: int | None = None,
) -> dict:
    """Execute all stages with lineage; returns {stage: manifest}."""
    s2c = udfs.s2_cell_udf(S2_LEVEL)
    points = (
        src.extract_points(src.pages(spark, sf_dir), src.gazetteer(spark))
        .withColumn("s2_cell", s2c(F.col("lat"), F.col("lon")))
    )
    bounds = hilbert_range_bounds(points, "s2_cell", n_partitions)
    manifests = {}
    manifests["points"] = ice.write_partitioned(
        points,
        out_root,
        "points",
        stage="extract_geocode",
        key_col="s2_cell",
        batch_size=batch_size,
        fail_after_batches=fail_after_batches,
        range_bounds=bounds,
    )

    pts = ice.read_table(spark, out_root, "points")
    joined = pj.pip_join(
        pts,
        src.regions(spark),
        poly_id="region_id",
        precision=4,
        strategy="broadcast",
        point_cols=("url", "entity", "lat", "lon", "s2_cell"),
    )
    manifests["joined"] = ice.write_partitioned(
        joined,
        out_root,
        "joined",
        stage="pip_join",
        key_col="s2_cell",
        n_partitions=n_partitions,
        batch_size=batch_size,
    )

    tiles = tiling.tile_cell_assignments(pts, z=12, s2_level=S2_LEVEL)
    manifests["tiles"] = ice.write_partitioned(
        tiles,
        out_root,
        "tiles",
        stage="tile_assign",
        key_col="cell_id",
        n_partitions=max(2, n_partitions // 4),
        batch_size=batch_size,
    )
    return manifests
