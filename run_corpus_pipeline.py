#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation pipeline — the
web-corpus twin of run_pipeline.py (pages → exact-dup election → quality
gate → near-dup election → optional per-domain cap → split → icelite
`corpus` + `audit` tables with per-partition lineage).

Package + submit (local-mode stand-in for the cluster):

    cd /root/repo && zip -qr /tmp/geospatial_spark.zip geospatial_spark
    spark-submit --master 'local[8]' \
        --py-files /tmp/geospatial_spark.zip \
        --conf spark.sql.shuffle.partitions=32 \
        run_corpus_pipeline.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/corpus_out --domain-cap 0

--domain-cap 0 disables the cap (the synthetic pages table is
single-host; give a positive cap only when the corpus has real domains).
Re-submitting after a failure resumes from the committed partitions.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/corpus_out")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--quality-floor-ppm", type=int, default=400_000)
    ap.add_argument("--jaccard-ppm", type=int, default=850_000)
    ap.add_argument("--domain-cap", type=int, default=0)
    ap.add_argument(
        "--compact",
        action="store_true",
        help="run the maintenance pass after curation: rewrite_files "
        "(bin-pack + key-sort corpus and audit) and expire the "
        "pre-compaction snapshots",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("corpus-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from geospatial_spark import pipeline
    from geospatial_spark.icelite import catalog as ice

    manifests = pipeline.run_corpus(
        spark,
        args.sf_dir,
        args.out,
        n_partitions=args.partitions,
        quality_floor_ppm=args.quality_floor_ppm,
        jaccard_ppm=args.jaccard_ppm,
        domain_cap_n=args.domain_cap or None,
    )
    audit = ice.read_table(spark, args.out, "audit")
    corpus = ice.read_table(spark, args.out, "corpus")
    by_status = {
        r["status"]: r["n"]
        for r in audit.groupBy("status").count().withColumnRenamed("count", "n").collect()
    }
    by_split = {
        r["split"]: r["n"]
        for r in corpus.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    report = {
        "tables": {
            stage: {
                "partitions": len(m["partitions"]),
                "rows": sum(p["row_count"] for p in m["partitions"]),
                "version": m["version"],
            }
            for stage, m in manifests.items()
        },
        "dropped_by_status": by_status,
        "kept_by_split": by_split,
    }
    if args.compact:
        report["compaction"] = pipeline.compact_tables(
            spark, args.out, list(manifests)
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
