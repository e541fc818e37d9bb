#!/usr/bin/env python
"""spark-submit entry point for the flagship pipeline (north rule: "run
via spark-submit --py-files on a multi-executor cluster").

Package + submit (local-mode stand-in for the cluster):

    cd /root/repo && zip -qr /tmp/geospatial_spark.zip geospatial_spark
    spark-submit --master 'local[8]' \
        --py-files /tmp/geospatial_spark.zip \
        --conf spark.sql.shuffle.partitions=32 \
        run_pipeline.py --sf-dir /root/testdata/sf0.001 --out /tmp/geo_out

On a real cluster only --master and the data paths change; the pipeline
resumes from committed partitions if re-submitted after a failure.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/geo_out")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument(
        "--compact",
        action="store_true",
        help="run the maintenance pass after the pipeline: rewrite_files "
        "(bin-pack + key-sort every table) and expire the pre-compaction "
        "snapshots — the scheduled Iceberg maintenance a production run "
        "pairs with ingest",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("geospatial-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from geospatial_spark import pipeline

    manifests = pipeline.run(
        spark, args.sf_dir, args.out, n_partitions=args.partitions
    )
    report = {
        stage: {
            "partitions": len(m["partitions"]),
            "rows": sum(p["row_count"] for p in m["partitions"]),
            "version": m["version"],
        }
        for stage, m in manifests.items()
    }
    if args.compact:
        report["compaction"] = pipeline.compact_tables(
            spark, args.out, list(manifests)
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
