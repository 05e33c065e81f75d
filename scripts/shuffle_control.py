#!/usr/bin/env python
"""Shuffle-bandwidth ceiling control (no Python kernel).

The mega-doc bench's 8→32 falloff needs attribution: is it the split
pipeline, or this box's shared memory subsystem under shuffle load? This
control times ONLY the split path's JVM data motion — the same amplified
corpus, explode → repartition(doc_id, chunk) → collect_list page-group
aggregate → count — with the Python kernel and reassembly removed. Run it
like --scaling (pinned cores, interleaved best-of); read the resulting
per-core efficiencies against BENCH/MEGA.md: if this JVM-only leg shows the
same 8→32 collapse, the limit is the host's shuffle/memory bandwidth (a
real cluster adds memory channels and NICs with every node), not the
pipeline design.

Usage: python scripts/shuffle_control.py            # orchestrates 2/8/32
       python scripts/shuffle_control.py --one 8    # single pinned level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def one_run(cores: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_BENCH_MEGA_FACTOR", "4000")
    os.environ.setdefault("SPARK_GRAFT_BENCH_MULT", "4")
    from pyspark.sql import functions as F

    import bench
    from swissgeol_ocr_spark.plans.config import ExtractConfig

    spark = bench.build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spans, _, _ = bench.prepare_extraction(spark, SF_DIR)
    cfg = ExtractConfig()
    n_part = 8 * spark.sparkContext.defaultParallelism
    big = spans.filter(F.col("n_spans") > cfg.mega_doc_span_cutoff)
    # the split subplan, JVM only: explode → shuffle → page-group agg
    chunked = big.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.floor(
            F.coalesce(F.col("span.page_no"), F.lit(0))
            / F.lit(cfg.mega_doc_pages_per_task)
        ).alias("chunk"),
        "pos",
        "span",
    )
    grouped = (
        chunked.repartition(n_part, "doc_id", "chunk")
        .groupBy("doc_id", "chunk")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("span.page_no"), F.lit(0)).alias("pg"),
                        F.coalesce(F.col("span.offset"), F.lit(0)).alias("o"),
                        F.col("pos").alias("p"),
                        F.col("span").alias("s"),
                    )
                )
            ).alias("ordered")
        )
        .agg(F.count("*").alias("n"), F.sum(F.size("ordered")).alias("spans"))
    )
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    best = float("inf")
    n_spans = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        row = grouped.first()
        best = min(best, time.perf_counter() - t0)
        n_spans = int(row["spans"])
    spans.unpersist()
    print(json.dumps({
        "cores": int(cores),
        "elapsed": best,
        "mega_spans": n_spans,
        "spans_per_sec": round(n_spans / best, 1),
    }))
    spark.stop()


def main() -> None:
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    results: dict[str, dict] = {}
    for _ in range(runs):
        for cores in ("2", "8", "32"):
            cmd = ["taskset", "-c", ",".join(map(str, range(int(cores)))),
                   sys.executable, os.path.abspath(__file__), "--one", cores]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, cwd=REPO)
            line = [l for l in out.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            r = json.loads(line)
            if cores not in results or r["spans_per_sec"] > results[cores]["spans_per_sec"]:
                results[cores] = r
    r2, r8, r32 = results["2"], results["8"], results["32"]
    print(json.dumps({
        "shuffle_eff_2_to_8": round(r8["spans_per_sec"] / (4 * r2["spans_per_sec"]), 3),
        "shuffle_eff_8_to_32": round(r32["spans_per_sec"] / (4 * r8["spans_per_sec"]), 3),
        "n2": r2["spans_per_sec"], "n8": r8["spans_per_sec"], "n32": r32["spans_per_sec"],
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        one_run(sys.argv[2])
    else:
        main()
