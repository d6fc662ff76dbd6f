"""spark-submit entrypoint for the encode engine (north_rule run mode).

The deployment job: sorted-encode an input parquet table (an extracted
snapshot of the Iceberg-shaped source, or any parquet directory) into
the chunk-table format with checkpointed slices, then print one JSON
metrics line. Designed to be submitted, not imported:

    python scripts/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/parquet_producers_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/submit_encode.py \
        --input  /data/source_code \
        --output /data/encoded --stage content_v1 \
        --sort-cols repo,path --slices 16 --profile balanced --cascade

The session comes from spark-submit's conf (no master/memory hardcoded
here); a re-submit of a killed run resumes from the slice manifests.
tests/test_submit_job.py runs this end-to-end through a real
spark-submit with the zip on --py-files.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="input parquet path/glob")
    ap.add_argument("--output", required=True,
                    help="root dir for the encoded stage")
    ap.add_argument("--stage", default="encoded")
    ap.add_argument("--version", type=int, default=1)
    ap.add_argument("--sort-cols", default="repo,path")
    ap.add_argument("--slices", type=int, default=4)
    ap.add_argument("--profile", default="balanced",
                    choices=["size", "balanced", "fast"])
    ap.add_argument("--cascade", action="store_true")
    args = ap.parse_args()

    # import AFTER spark-submit has placed the --py-files zip on the
    # path — this file must not import the package at module scope
    from pyspark.sql import SparkSession

    from parquet_producers_spark.storage import encode_run

    spark = SparkSession.builder.appName("pps-encode").getOrCreate()
    df = spark.read.parquet(args.input)
    results = encode_run(
        spark, df,
        root=args.output, stage=args.stage, version=args.version,
        sort_cols=args.sort_cols.split(","),
        n_slices=args.slices, cascade=args.cascade, profile=args.profile,
        input_fingerprint=args.input,
    )
    print(json.dumps({
        "stage": args.stage,
        "version": args.version,
        "slices": len(results),
        "resumed_slices": sum(1 for r in results if r.skipped),
        "rows": sum(r.metrics["rows"] for r in results),
        "raw_bytes": sum(r.metrics["raw_bytes"] for r in results),
        "enc_bytes": sum(r.metrics["enc_bytes"] for r in results),
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
