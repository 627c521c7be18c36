"""spark-submit entry point for the extraction pipeline.

Usage (north-rule launch shape):

    python tools/make_pyfiles.py                       # build the zip once
    spark-submit --master local[32] \
        --py-files /tmp/horizon_ocr_python_spark.zip \
        tools/submit_job.py \
        --pages <parquet dir | synth:N[:scale]> \
        --output <snapshot root> [--partitions P] [--no-resume]

The job: read pages -> resume anti-join against committed snapshots ->
salted repartition -> fused Arrow extraction -> snapshot commit + lineage
metrics. Exit code 0 iff the snapshot committed; a summary JSON line is
printed for harnesses.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="parquet dir of the pages table, or synth:N[:scale]")
    ap.add_argument("--output", required=True, help="snapshot root dir")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; fall back to engine defaults otherwise
    spark = SparkSession.builder.appName("horizon-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from horizon_ocr_python_spark.engine.pipeline import (pages_dataframe,
                                                          run_extraction)

    if args.pages.startswith("synth:"):
        parts = args.pages.split(":")
        n = int(parts[1])
        scale = int(parts[2]) if len(parts) > 2 else 1
        pages = pages_dataframe(spark, n, seed=42, scale=scale)
        rows_hint = n
    else:
        pages = spark.read.parquet(args.pages)
        rows_hint = None

    result = run_extraction(pages, num_partitions=args.partitions,
                            rows_hint=rows_hint, output_root=args.output,
                            resume=not args.no_resume)

    metrics = result.metrics.filter(
        result.metrics.snapshot_id == result.snapshot_id).collect()
    n_docs = sum(r.n_docs for r in metrics)
    n_err = sum(r.n_err for r in metrics)
    print(json.dumps({
        "snapshot_id": result.snapshot_id,
        "n_docs": n_docs,
        "n_err": n_err,
        "n_partitions": len(metrics),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
