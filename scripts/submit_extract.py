#!/usr/bin/env python
"""Cluster job entrypoint for the extraction pipeline.

Deploy (north-star protocol):

    zip -r swissgeol_ocr_spark.zip swissgeol_ocr_spark
    spark-submit --py-files swissgeol_ocr_spark.zip \
        scripts/submit_extract.py \
        --input  <spans table path/URI> \
        --output <output table path/URI> \
        --metrics <metrics table path/URI> \
        --run-id run-2026-08-16 \
        [--done <prior output path>]     # resume: anti-join committed doc_ids
        [--aggressive] [--confidence-threshold 0.7]
        [--num-partitions N] [--no-repartition]

On a real cluster the input/output paths are Iceberg table identifiers
(`spark.read.format("iceberg")...`); parquet paths keep this runnable in
the sandbox. The job is a single action: read → resume anti-join →
hash(doc_id) repartition (unless the table is pre-bucketed) → Arrow
kernel → append output + run-stamped metrics. Restarting with the same
--output as --done resumes from the last commit.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--done", default=None)
    ap.add_argument("--aggressive", action="store_true")
    ap.add_argument("--confidence-threshold", type=float, default=0.7)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--no-repartition", action="store_true")
    args = ap.parse_args()

    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.plans.pipeline import (
        configure_spark,
        extract_pipeline,
        read_committed,
        write_output,
    )

    spark = configure_spark(
        SparkSession.builder.appName(f"swissgeol-extract-{args.run_id}")
    ).getOrCreate()

    config = ExtractConfig(
        confidence_threshold=args.confidence_threshold,
        use_aggressive_strategy=args.aggressive,
    )
    spans = spark.read.parquet(args.input)
    done = read_committed(spark, args.done).select("doc_id") if args.done else None
    out = extract_pipeline(
        spans,
        config=config,
        num_partitions=args.num_partitions,
        done_df=done,
        repartition=not args.no_repartition,
    )
    write_output(out, args.output, run_id=args.run_id, metrics_path=args.metrics)
    spark.stop()


if __name__ == "__main__":
    main()
