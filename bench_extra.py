#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN for the driver; this
file carries the extra evidence runs: per-query isolation, plan capture,
noop-sink timing — guide §1.4/§1.5).

Usage:
    python bench_extra.py [--sf DIR] [--passes N] [--queries a,b,c]
                          [--explain OUTDIR] [--noop] [--skip-warmup]

Methodology matches bench.py exactly where it overlaps: same build_spark
(configure_spark + local[$SPARK_GRAFT_CPUS] + shuffle.partitions), same
full-column forcing (count + bit_xor(xxhash64(*))), interleaved best-of-N
passes. --noop times a noop-sink write of the full output instead of the
hash-forcing aggregate (guide §1.4). --explain writes
``df.explain("formatted")`` per query to OUTDIR/<query>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT_QUERIES = [
    "extract_flagship",
    "extract_words",
    "c5_confidence_filter",
    "agg_block_stats",
    "join_broadcast_dim",
    "dedup_exact",
    "dedup_minhash_lsh",
    "cosine_topk",
    "quality_score",
    "token_count",
    "corpus_curation",
    "stratified_sample",
    "star_join_q5",
    "sessionize",
]


def build_spark(cores: str):
    from pyspark.sql import SparkSession

    from swissgeol_ocr_spark.plans.pipeline import configure_spark

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("swissgeol-ocr-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cores))))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
    )
    return configure_spark(builder).getOrCreate()


def force_all_columns(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
    ).first()
    return row["n"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') files")
    ap.add_argument("--suffix", default="", help="filename suffix for explain files")
    ap.add_argument("--noop", action="store_true", help="time noop-sink writes instead")
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    from swissgeol_ocr_spark.plans.queries import QUERIES

    names = [q for q in args.queries.split(",") if q]
    spark = build_spark(CPUS)
    sc = spark.sparkContext
    try:
        if not args.skip_warmup:
            # spin up Python workers + JIT before any timed pass
            sc.setJobDescription("warmup")
            fn, _ = QUERIES["extract_flagship"]
            force_all_columns(fn(spark, args.sf))
        best: dict[str, float] = {}
        samples: dict[str, list[float]] = {n: [] for n in names}
        for p in range(args.passes):
            for name in names:
                fn, _ = QUERIES[name]
                sc.setJobDescription(f"{name} pass {p}")
                t0 = time.perf_counter()
                df = fn(spark, args.sf)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    force_all_columns(df)
                el = round(time.perf_counter() - t0, 3)
                samples[name].append(el)
                best[name] = min(best.get(name, float("inf")), el)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            for name in names:
                fn, _ = QUERIES[name]
                df = fn(spark, args.sf)
                with open(
                    os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
                ) as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    ))
        print(json.dumps({
            "sf": args.sf,
            "passes": args.passes,
            "noop": args.noop,
            "total_best": round(sum(best.values()), 3),
            "queries": best,
            "samples": samples,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
