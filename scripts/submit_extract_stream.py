#!/usr/bin/env python
"""Cluster job entrypoint for CONTINUOUS extraction (Structured Streaming).

Deploy:

    zip -r swissgeol_ocr_spark.zip swissgeol_ocr_spark
    spark-submit --py-files swissgeol_ocr_spark.zip \
        scripts/submit_extract_stream.py \
        --input  <spans table dir — new parquet files = new documents> \
        --output <output dir (exactly-once file sink)> \
        --checkpoint <checkpoint dir> \
        [--drain]                  # availableNow: process backlog, exit
        [--max-files-per-trigger N]  # micro-batch size lever; size it so
                                     # a trigger spans >= cluster cores of
                                     # input splits, or the kernel stage
                                     # under-fans (BENCH/STREAMING.md)
        [--aggressive] [--confidence-threshold 0.7]
        [--timeout-s N]            # with --drain: bound the run

The streaming twin of scripts/submit_extract.py: same Arrow kernel
(stateless mapInArrow — reference processes documents one by one,
main.py:71), with the batch job's resume anti-join replaced by the
checkpoint's exactly-once file-source/sink contract — a restart with the
same --checkpoint re-processes nothing (measured 0 rows / 0.25s,
BENCH/STREAMING.md). Without --drain the query runs until killed, the
deployment shape for a continuous ingest feed.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--drain", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--aggressive", action="store_true")
    ap.add_argument("--confidence-threshold", type=float, default=0.7)
    ap.add_argument("--timeout-s", type=int, default=None)
    args = ap.parse_args()

    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.plans.pipeline import configure_spark
    from swissgeol_ocr_spark.sources.corpus import spans_schema_ddl
    from swissgeol_ocr_spark.streaming.pipeline import extract_stream

    spark = configure_spark(
        SparkSession.builder.appName("swissgeol-extract-stream")
    ).getOrCreate()

    config = ExtractConfig(
        confidence_threshold=args.confidence_threshold,
        use_aggressive_strategy=args.aggressive,
    )
    reader = spark.readStream.schema(f"doc_id string, spans {spans_schema_ddl()}")
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    writer = (
        extract_stream(reader.parquet(args.input), config)
        .writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.drain:
        q = writer.trigger(availableNow=True).start()
        ok = q.awaitTermination(args.timeout_s) if args.timeout_s else (
            q.awaitTermination() or True
        )
        if not ok:
            q.stop()
            print("drain did not finish within --timeout-s", file=sys.stderr)
            sys.exit(2)
    else:
        q = writer.start()
        q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
