#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors; sandbox stand-in per driver note: the SAME job on
the SAME input at local[8] vs local[32]).

The job is the flagship pipeline at a work size big enough to amortize
fixed driver overhead (session + createDataFrame + polyfill of 64 regions):
pages derived at `--replication` (default 64 → 4x the standard corpus),
geo-entity extraction + gazetteer geocode, broadcast PIP join into the 64
regions, and z12 tile-cell assignment — counted to force full execution.

Usage:
    python scaling_bench.py --cpus 8
    python scaling_bench.py --cpus 32
Prints one JSON line per run:
    {"cpus": N, "rows": R, "sec": S, "rows_per_sec": T, ...}
Efficiency = (T_32 / T_8) / (32/8); recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replication", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"scaling-bench-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    sys.path.insert(0, "/root/repo")
    from geospatial_spark.operators import pip_join as pj
    from geospatial_spark.operators import tiling
    from geospatial_spark.sources import pages as src

    # warmup: JVM JIT + Python UDF workers
    spark.range(2_000_000).selectExpr("sum(id)").collect()

    t0 = time.time()
    pages = src.pages(spark, args.sf_dir, replication=args.replication)
    points = src.extract_points(pages, src.gazetteer(spark))
    joined = pj.pip_join(
        points,
        src.regions(spark),
        poly_id="region_id",
        precision=4,
        strategy="broadcast",
        point_cols=("url", "entity", "lat", "lon"),
    )
    n_join = joined.count()
    t1 = time.time()
    tiles = tiling.tile_cell_assignments(points, z=12, s2_level=12)
    n_tiles_in = points.count()
    tiles.count()
    t2 = time.time()

    join_sec = t1 - t0
    tile_sec = t2 - t1
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "replication": args.replication,
                "join_rows": n_join,
                "join_sec": round(join_sec, 2),
                "join_rows_per_sec": round(n_join / join_sec, 1),
                "tile_points": n_tiles_in,
                "tile_sec": round(tile_sec, 2),
                "tile_assignments_per_sec": round(n_tiles_in / tile_sec, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
