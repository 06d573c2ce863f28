#!/usr/bin/env python
"""spark-submit entry point for the declarative pipeline runner
[BASELINE.json north_rule: "run via spark-submit --py-files"].

Usage::

    python scripts/package.py   # builds dist/mapshaper_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/mapshaper_spark.zip \\
        jobs/run_pipeline.py --spec pipeline.json --out /tmp/out.parquet

On a cluster the same invocation works with ``--master yarn``/k8s — the
zip ships the whole engine; no cluster-side install.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True, help="pipeline spec JSON path")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--master", default=None, help="override master (default: from submit)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("mapshaper_spark_pipeline")
    if args.master:
        b = b.master(args.master)
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = b.getOrCreate()

    from mapshaper_spark.plans.pipeline import run_pipeline_file

    t0 = time.perf_counter()
    df = run_pipeline_file(spark, args.spec)
    df.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows": n, "out": args.out, "sec": round(time.perf_counter() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
