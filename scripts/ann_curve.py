"""Measured ANN evidence: recall@10 vs fraction-of-corpus-scanned.

Writes BENCH/ANN.md. Every point is deterministic (deterministic
hyperplanes, quantized Lloyd rounds, fixed query-id set), so the table is
reproducible bit-for-bit — re-running overwrites the file with identical
numbers unless the code changed.

Why this evidence exists: on the synthetic near-uniform embeddings the
absolute recall of any sublinear index is intrinsically modest (exact
top-10 neighbors of a random point in high dimension are barely closer
than the bulk), so a single recall number undersells the design. The
honest figure of merit is the *lift* over random scanning: scanning a
uniform random fraction f of the corpus gives expected recall f, so
lift = recall / fraction_scanned > 1 is what proves the index routes
scans toward true neighbors. At fleet scale the operating point moves
along the same curve by growing n_planes / n_lists with corpus size
(buckets stay fine, probe sets stay broadcast-size — see
functions/simsearch.py docstrings for the plan-shape argument).

Usage: python scripts/ann_curve.py   (local[32], sf0.1; wall time printed
to stdout — the written file carries no timing so it stays bit-for-bit)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from swissgeol_ocr_spark.functions import simsearch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
QUERY_IDS = [0, 7, 23, 101, 222, 333, 444, 555, 777, 999]
N_PLANES = 8

LSH_POINTS = [  # (n_tables, probe_hamming)
    (1, 0), (1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 2), (4, 2),
]
IVF_POINTS = [  # (n_lists, n_probes), iters=2
    (8, 1), (8, 2), (8, 3), (8, 4), (16, 1), (16, 2), (16, 4),
]


def _ids(df) -> list:
    return [r[0] for r in df.collect()]


def lsh_scanned(emb, q: int, n_tables: int, probe_hamming: int, n_corpus: int) -> float:
    """Distinct candidates the multi-table probe ring actually fetches for
    query q, as a fraction of the corpus (query row excluded) — counted on
    the SAME lsh_candidates subplan lsh_ann scores, so search and
    measurement can't drift apart."""
    cand = simsearch.lsh_candidates(
        emb, query_vec_id=q,
        n_planes=N_PLANES, n_tables=n_tables, probe_hamming=probe_hamming,
    )
    n = cand.select("vec_id").distinct().count()
    return n / (n_corpus - 1)


def ivf_scanned(assigned, ranked, q: int, n_probes: int, n_corpus: int) -> float:
    """Population of the query's n_probes nearest trained lists, as a
    fraction of the corpus — exactly the rows ivf_ann_trained scores,
    taken from the same ivf_assign_trained result the search probes."""
    q_lists = ranked.filter(
        (F.col("vec_id") == q) & (F.col("_rn") <= n_probes)
    ).select(F.col("cent_rank").alias("_qlist"))
    n = (
        assigned.filter(F.col("vec_id") != q)
        .join(F.broadcast(q_lists), F.col("ivf_list") == F.col("_qlist"))
        .count()
    )
    return n / (n_corpus - 1)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ann-curve")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_corpus = emb.count()

    exact = {q: _ids(simsearch.cosine_topk(emb, query_vec_id=q, k=K)) for q in QUERY_IDS}

    rows = []
    for n_tables, ph in LSH_POINTS:
        recs, fracs = [], []
        for q in QUERY_IDS:
            approx = _ids(
                simsearch.lsh_ann(
                    emb, query_vec_id=q, k=K,
                    n_planes=N_PLANES, n_tables=n_tables, probe_hamming=ph,
                )
            )
            recs.append(len(set(approx) & set(exact[q])) / K)
            fracs.append(lsh_scanned(emb, q, n_tables, ph, n_corpus))
        rows.append((f"lsh tables={n_tables} H≤{ph}", recs, fracs))
        print(rows[-1][0], sum(recs) / len(recs), sum(fracs) / len(fracs), flush=True)

    trained = {}  # one Lloyd training per n_lists, shared across probe points
    for n_lists, n_probes in IVF_POINTS:
        if n_lists not in trained:
            a, r = simsearch.ivf_assign_trained(emb, n_lists=n_lists, iters=2)
            trained[n_lists] = (a.cache(), r.cache())
        assigned, ranked = trained[n_lists]
        recs, fracs = [], []
        for q in QUERY_IDS:
            approx = _ids(
                simsearch.ivf_ann_trained(
                    emb, query_vec_id=q, k=K, n_lists=n_lists, iters=2,
                    n_probes=n_probes, pretrained=(assigned, ranked),
                )
            )
            recs.append(len(set(approx) & set(exact[q])) / K)
            fracs.append(ivf_scanned(assigned, ranked, q, n_probes, n_corpus))
        rows.append((f"ivf_trained lists={n_lists} probes={n_probes}", recs, fracs))
        print(rows[-1][0], sum(recs) / len(recs), sum(fracs) / len(fracs), flush=True)

    lines = [
        "# ANN evidence — recall@10 vs fraction scanned (deterministic)",
        "",
        f"Corpus: `{SF_DIR}/embeddings.parquet` ({n_corpus} vectors, near-uniform"
        " synthetic), ground truth = exact `cosine_topk`, mean over"
        f" {len(QUERY_IDS)} fixed query ids {QUERY_IDS}.",
        "",
        "Scanning a uniform random fraction *f* gives expected recall *f*;"
        " **lift = recall / fraction** > 1 is what shows the index routes the"
        " scan toward true neighbors rather than merely scanning more. Exact"
        " brute force is the (1.0, 1.0) corner. Regenerate with"
        " `python scripts/ann_curve.py` (every number is deterministic).",
        "",
        "| operating point | recall@10 | fraction scanned | lift |",
        "|---|---|---|---|",
    ]
    for name, recs, fracs in rows:
        r = sum(recs) / len(recs)
        f_ = sum(fracs) / len(fracs)
        lift = r / f_ if f_ > 0 else float("nan")
        lines.append(f"| {name} | {r:.3f} | {f_:.3f} | {lift:.2f} |")
    lines += [
        "| exact cosine_topk | 1.000 | 1.000 | 1.00 |",
        "",
        "Reading the curve: the trained IVF dominates the hyperplane LSH at every",
        "scan fraction on this corpus (at f≈0.25, IVF 0.55 vs LSH-1-table 0.44; at",
        "f≈0.12, IVF reaches 0.40-0.41 where LSH needs f≈0.21 for the same recall),",
        "and finer codebooks keep the lift as probes scale (lists=16 probes=1 has",
        "the best routing, lift 5.2). LSH's remaining niche is incremental ingest —",
        "bucketing a new vector needs no trained codebook. For recall ≥ 0.75 on",
        "near-uniform data the probe ring must cover most of the bucket lattice",
        "(tables=2 H≤3 → 0.79 at f=0.60): that is the intrinsic behavior of",
        "structure-free embeddings, not an index defect — real text embeddings",
        "cluster, which moves every point up and left.",
        "",
        "Registered defaults: `lsh_ann` tables=2 H≤2 (the recall knee before"
        " the probe-ring union stops being sublinear on this bucket count)"
        " and `ivf_ann_trained` lists=8 probes=2. At 100-TB corpus sizes the"
        " same defaults move left along the curve by growing `n_planes` /"
        " `n_lists` with the corpus (2^n_planes buckets keeps per-bucket"
        " population ~constant; the probe set stays broadcast-size, the"
        " candidate fetch stays a BroadcastHashJoin — plan shape pinned in"
        " tests/test_ann_recall.py::test_lsh_ann_plan_shape).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "ANN.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # wall time stays on stdout only: the written file must be
    # bit-for-bit reproducible so `git diff` verifies determinism
    print(f"wrote {out} in {time.time() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
