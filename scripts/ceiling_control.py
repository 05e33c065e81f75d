#!/usr/bin/env python
"""Hardware-ceiling control for BENCH/BASELINE.md — NO Spark in the
measured region.

K independent pinned Python processes each run the bare extraction kernel
(operators/extract.extract_document) over the same pre-materialized corpus
slice. The per-proc docs/s at K = 2/8/32 is the per-core ceiling ANY
executor layout on this box can reach; the Spark pipeline's scaling
numbers are read against it to separate engine overhead from host memory-
bandwidth saturation.

Usage:  python scripts/ceiling_control.py [n_docs]   (default 5000)

Prints a markdown table row per K — paste into BENCH/BASELINE.md's
"Hardware-ceiling control" section with the run date + host.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_slice(path: str) -> None:
    """Materialize the spans corpus slice once (Spark used for staging
    only — staging is outside every timed region)."""
    from pyspark.sql import SparkSession

    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(N_DOCS)
    documents_to_spans(docs).select("doc_id", "spans").write.mode("overwrite").parquet(path)
    spark.stop()


def load_docs(path: str) -> list[tuple]:
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    docs = []
    for batch in table.to_batches():
        spans = batch.column("spans")
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        struct = spans.values
        kinds = struct.field("kind").to_pylist()
        texts = struct.field("text").to_pylist()
        media = struct.field("media_ref").to_pylist()
        off = struct.field("offset").to_numpy(zero_copy_only=False)
        page = struct.field("page_no").to_numpy(zero_copy_only=False)
        rect = np.stack(
            [struct.field(f).to_numpy(zero_copy_only=False) for f in ("x0", "y0", "x1", "y1")],
            axis=1,
        )
        conf = struct.field("confidence").to_numpy(zero_copy_only=False)
        orient = struct.field("orientation").to_numpy(zero_copy_only=False)
        for row in range(batch.num_rows):
            lo, hi = int(offsets[row]), int(offsets[row + 1])
            docs.append(
                (kinds[lo:hi], texts[lo:hi], media[lo:hi], off[lo:hi],
                 page[lo:hi], rect[lo:hi], conf[lo:hi], orient[lo:hi])
            )
    return docs


def worker(path: str, cpu: int, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    from swissgeol_ocr_spark.operators.extract import extract_document
    from swissgeol_ocr_spark.plans.config import ExtractConfig

    docs = load_docs(path)
    cfg = ExtractConfig()
    # warmup pass (imports/JIT-less, but touches all memory)
    for d in docs[:200]:
        extract_document(*d, cfg)
    t0 = time.perf_counter()
    for d in docs:
        extract_document(*d, cfg)
    out_q.put(len(docs) / (time.perf_counter() - t0))


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="ceiling_")
    path = os.path.join(tmp, "spans")
    stage_slice(path)
    base = None
    print("| procs | per-proc docs/s | per-core efficiency vs 2 procs |")
    print("|---|---|---|")
    for k in (2, 8, 32):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(path, cpu, q)) for cpu in range(k)]
        for p in procs:
            p.start()
        rates = [q.get() for _ in procs]
        for p in procs:
            p.join()
        per_proc = sum(rates) / len(rates)
        base = base or per_proc
        print(f"| {k} | {per_proc:.0f} | {per_proc / base:.2f} |")


if __name__ == "__main__":
    main()
