"""Measured MinHash-LSH candidate quality: recall/precision vs exact Jaccard.

Writes BENCH/DEDUP_QUALITY.md. Fully deterministic (md5-derived
signatures, fixed corpus) — re-running reproduces the file bit-for-bit.

What it measures: the production candidate generator
(``plans.queries.minhash_pair_relation`` — exact-collapse → 8×16-bit
md5-min signature → 4 bands × 2 rows → capped band join, byte-identical
to the ``dedup_minhash_lsh`` driver query) against EXACT 3-shingle
Jaccard ground truth computed over every representative pair sharing at
least one shingle (an inverted-index self-join — O(Σ per-shingle doc²),
feasible at evidence scale; at 100 TB exact all-pairs is precisely what
LSH exists to avoid, which is why this is an offline evidence script and
not a driver query).

Reading: banding theory says a pair with true Jaccard s collides in at
least one of b bands of r rows with p(s) = 1 - (1 - s^r)^b; the table
shows measured per-bucket recall against that curve (b=4, r=2), plus
candidate precision (share of emitted pairs whose true J clears each
threshold). Near-miss pairs (high-J but uncaught) and false candidates
(band collision with tiny J — possible because each band key is two
16-bit slices) are the quantities a curation owner tunes b/r against.

Usage: python scripts/dedup_quality.py   (local[32], sf0.1, ~1 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from swissgeol_ocr_spark.functions import textops
from swissgeol_ocr_spark.plans.queries import minhash_pair_relation

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# derived from the production banding, never a local literal — a retune of
# textops' banding re-labels this evidence's theory curve automatically
BANDS, ROWS = textops.MINHASH_BANDS, textops.MINHASH_ROWS
BUCKETS = [(0.9, 1.01), (0.8, 0.9), (0.7, 0.8), (0.6, 0.7), (0.5, 0.6),
           (0.4, 0.5), (0.3, 0.4), (0.2, 0.3), (0.0, 0.2)]
PRECISION_TAUS = [0.8, 0.5, 0.3]
# every-k-th-word replacement rates for the planted mid-J variants: a
# replaced word kills the ≤3 shingles covering it, so J ≈ (k−3)/(k+3)
# sweeps ~0.1..0.9 across this ladder
VARIANT_KS = [4, 5, 6, 7, 8, 10, 12, 16, 24, 32, 48, 64]


def with_planted_variants(docs):
    """Corpus + deterministic mid-Jaccard variants: the raw synthetic
    corpus only contains near-exact clones (J≥0.8) and background noise
    (J<0.2), so the middle of the S-curve would go unmeasured. Every 10th
    doc gets one variant with every-k-th word rewritten (k cycles the
    ladder by doc), giving a few hundred planted pairs spread across the
    J spectrum — all deterministic, measured by the same exact-Jaccard
    ground truth as everything else (no analytic J is assumed)."""
    base = docs.select("doc_id", "text").filter(F.col("doc_id") % 10 == 0)
    ks = F.array(*[F.lit(x) for x in VARIANT_KS])
    k = F.element_at(
        ks, ((F.col("doc_id") / 10) % len(VARIANT_KS)).cast("int") + 1
    )
    var_text = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda w, i: F.when(i % k == 0, F.concat(w, F.lit("~v"))).otherwise(w),
        ),
        " ",
    )
    variants = base.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), var_text.alias("text")
    )
    return docs.select("doc_id", "text").unionByName(variants)


def exact_jaccard_pairs(docs):
    """(a_id, b_id, jac) for every representative pair sharing ≥1 shingle:
    inverted-index self-join on the shingle digest, exact |A∩B| /
    (|A|+|B|-|A∩B|) over the distinct shingle sets the signatures hash."""
    reps = textops.exact_collapse(docs.select("doc_id", "text"))
    # shingles() already array_distincts and md5 preserves distinctness,
    # so the exploded (doc_id, digest) rows are unique per doc by
    # construction — no array_distinct wrapper, no row-level .distinct()
    # (each would re-shuffle the full inverted index for nothing)
    sh = reps.select(
        "doc_id",
        F.explode(textops.md5_digests(textops.shingles(F.col("text")))).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"),
              (F.col("a.sh") == F.col("b.sh"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id")
                   .withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
              .withColumnRenamed("n_sh", "nb"), "b_id")
        .select(
            "a_id", "b_id",
            (F.col("inter").cast("double")
             / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jac"),
        )
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("dedup-quality")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = with_planted_variants(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )

    truth = exact_jaccard_pairs(docs)
    cand = (
        minhash_pair_relation(docs).select("a_id", "b_id")
        .withColumn("is_cand", F.lit(True))
    )
    joined = truth.join(cand, ["a_id", "b_id"], "full_outer").select(
        F.coalesce("jac", F.lit(0.0)).alias("jac"),
        F.coalesce("is_cand", F.lit(False)).alias("is_cand"),
    )

    # ONE job for every number in the report: per-bucket totals/catches,
    # per-tau precision numerators and the candidate count are all
    # conditional sums over the same relation — 13 sequential
    # filter+collect jobs (each re-evaluating the join) collapse into a
    # single pass, so no cache() is needed anywhere
    aggs = []
    for i, (lo, hi) in enumerate(BUCKETS):
        in_b = (F.col("jac") >= lo) & (F.col("jac") < hi)
        aggs.append(F.sum(F.when(in_b, 1).otherwise(0)).alias(f"n_{i}"))
        aggs.append(
            F.sum(F.when(in_b & F.col("is_cand"), 1).otherwise(0)).alias(f"c_{i}")
        )
    for i, tau in enumerate(PRECISION_TAUS):
        aggs.append(
            F.sum(
                F.when(F.col("is_cand") & (F.col("jac") >= tau), 1).otherwise(0)
            ).alias(f"p_{i}")
        )
    aggs.append(F.sum(F.col("is_cand").cast("long")).alias("n_cand"))
    row = joined.agg(*aggs).collect()[0]

    bucket_rows = []
    for i, (lo, hi) in enumerate(BUCKETS):
        n, caught = row[f"n_{i}"] or 0, row[f"c_{i}"] or 0
        mid = min((lo + hi) / 2, 1.0) if hi > 1.0 else (lo + hi) / 2
        theo = 1 - (1 - mid ** ROWS) ** BANDS
        bucket_rows.append((lo, hi, n, caught, theo))
        print(f"J[{lo:.1f},{min(hi,1.0):.1f}] n={n} caught={caught} theo={theo:.3f}",
              flush=True)

    n_cand = row["n_cand"] or 0
    prec_rows = []
    for i, tau in enumerate(PRECISION_TAUS):
        good = row[f"p_{i}"] or 0
        prec_rows.append((tau, good))
        print(f"precision@J>={tau}: {good}/{n_cand}", flush=True)

    lines = [
        "# Dedup quality — MinHash-LSH candidates vs exact Jaccard (deterministic)",
        "",
        f"Corpus: `{SF_DIR}/documents.parquet` plus deterministic planted"
        " mid-J variants (every 10th doc, every-k-th word rewritten, k"
        f" cycling {VARIANT_KS} — the raw corpus only has near-exact clones"
        " and background noise, so the S-curve's middle would otherwise go"
        " unmeasured), exact-collapsed to representatives;"
        " candidates from the PRODUCTION `minhash_pair_relation` (8×16-bit"
        f" md5-min signature, {BANDS} bands × {ROWS} rows, capped band join"
        " — byte-identical to the `dedup_minhash_lsh` driver query)."
        " Ground truth: exact 3-shingle Jaccard over every representative"
        " pair sharing ≥1 shingle (inverted-index self-join; pairs sharing"
        " none have J=0 and can only appear as false candidates).",
        "",
        f"Theory column: p(s) = 1 − (1 − s^{ROWS})^{BANDS} at the bucket"
        " midpoint — the banding S-curve this configuration promises."
        " Regenerate with `python scripts/dedup_quality.py` (deterministic).",
        "",
        "| true Jaccard | pairs | caught | recall | theory p(s) |",
        "|---|---|---|---|---|",
    ]
    for lo, hi, n, caught, theo in bucket_rows:
        rec = f"{caught / n:.3f}" if n else "—"
        hi_disp = min(hi, 1.0)
        lines.append(
            f"| [{lo:.1f}, {hi_disp:.1f}{']' if hi > 1.0 else ')'} | {n} |"
            f" {caught} | {rec} | {theo:.3f} |"
        )
    lines += ["", f"Candidates emitted: {n_cand}.", ""]
    for tau, good in prec_rows:
        share = f"{good / n_cand:.3f}" if n_cand else "—"
        lines.append(f"- precision@J≥{tau}: {good}/{n_cand} = {share}")
    lines += [
        "",
        "Interpretation: recall tracks the S-curve — near-exact pairs"
        " (J≥0.8, the dedup target zone) are caught at or above theory"
        " (clone families share their min-signatures), while low-J buckets"
        " are correctly left alone (catching them is the curve's job, not"
        " a defect). False candidates (J<0.3) come from 16-bit slice"
        " collisions in a band key; downstream consumers"
        " (`dedup_clusters`, `corpus_curation`) treat candidates as"
        " CANDIDATES — membership decisions re-verify via the linear"
        " fp→keeper join, so a false pair costs a row, not a wrong merge."
        " To move recall at a given J, grow bands (b) or shrink rows (r)"
        " along the same curve; the shuffle stays one exchange on the"
        " band key either way.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "DEDUP_QUALITY.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} in {time.time() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
