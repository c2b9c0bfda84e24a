"""spark-submit entrypoint for the flagship pipeline — the north-rule
deployment mode:

    spark-submit \\
      --py-files "$(python -c 'import sys; sys.path.insert(0, \".\"); \\
                   from vector_spark.deploy import package_zip; print(package_zip())')" \\
      scripts/submit_job.py --input <transcripts parquet dir> \\
      --output <out dir> [--fused]

On a cluster, add --master/--num-executors etc.; the session is built
WITHOUT a master override so spark-submit stays in control. Writes
per-sink windowed aggregates (and, non-fused, the dropped channel)
under --output, prints one JSON metrics line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument(
        "--fused",
        action="store_true",
        help="single-action fused aggregate (bench shape) instead of per-sink outputs",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("vector-spark-pipeline").getOrCreate()

    # Spark 4 ships --py-files to executors and to the driver's
    # SparkFiles dir, but does not prepend them to the driver's
    # sys.path before this script runs — do it ourselves so one zip
    # serves both sides.
    try:
        import vector_spark  # noqa: F401
    except ModuleNotFoundError:
        import glob
        import os

        from pyspark import SparkFiles

        for z in glob.glob(os.path.join(SparkFiles.getRootDirectory(), "*.zip")):
            sys.path.insert(0, z)

    from vector_spark.plans.metrics import StageMetrics
    from vector_spark.plans.transcript_pipeline import run_pipeline, run_pipeline_fused
    from vector_spark.session import tune_session

    tune_session(spark)
    tdf = spark.read.parquet(args.input)
    t0 = time.time()
    metrics = StageMetrics()
    if args.fused:
        out = run_pipeline_fused(spark, tdf, metrics=metrics)
        out.write.mode("overwrite").parquet(f"{args.output}/aggregates")
        written = {"aggregates": f"{args.output}/aggregates"}
    else:
        res = run_pipeline(spark, tdf)
        written = {}
        for sink, agg in res.aggregates.items():
            path = f"{args.output}/agg_{sink.lstrip('_')}"
            agg.write.mode("overwrite").parquet(path)
            written[sink] = path
        res.dropped.write.mode("overwrite").parquet(f"{args.output}/dropped")
        written["dropped"] = f"{args.output}/dropped"
        res.unpersist()
    print(
        json.dumps(
            {
                "input": args.input,
                "elapsed_sec": round(time.time() - t0, 2),
                "outputs": written,
                "stage_metrics": {
                    k: {m: int(x) for m, x in v.items()}
                    for k, v in metrics.collect().items()
                }
                if args.fused
                else {},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
