"""Pinned MinHash-LSH candidate quality (the BENCH/DEDUP_QUALITY.md
regression net): the production band join must keep catching what the
banding S-curve promises, measured against exact shingle Jaccard on the
sf0.001 corpus + the evidence script's deterministic planted variants.

Everything here is deterministic (md5 signatures, fixed corpus, fixed
variant ladder), so the bounds are measured values with margin — a code
change that degrades candidate recall fails loudly."""

from pyspark.sql import functions as F

from scripts.dedup_quality import exact_jaccard_pairs, with_planted_variants
from swissgeol_ocr_spark.plans.queries import minhash_pair_relation

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_candidate_recall_tracks_s_curve(spark):
    docs = with_planted_variants(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    truth = exact_jaccard_pairs(docs).cache()
    cand = (
        minhash_pair_relation(docs)
        .select("a_id", "b_id")
        .withColumn("c", F.lit(True))
    )
    j = truth.join(cand, ["a_id", "b_id"], "left").select(
        "jac", F.coalesce("c", F.lit(False)).alias("c")
    ).cache()

    def recall(lo, hi):
        r = j.filter((F.col("jac") >= lo) & (F.col("jac") < hi)).agg(
            F.count("*").alias("n"), F.sum(F.col("c").cast("long")).alias("k")
        ).collect()[0]
        assert r.n > 0, (lo, hi)
        return (r.k or 0) / r.n, r.n

    # measured 47/47 at J≥0.8 (theory 0.994) — the dedup target zone
    hi_rec, hi_n = recall(0.8, 1.01)
    assert hi_rec >= 0.95, (hi_rec, hi_n)
    # measured 0.59 in [0.3,0.5) (theory ~0.33-0.6) — the curve's middle,
    # bounded both ways: much higher would mean the band key stopped
    # being selective, much lower that signatures stopped tracking J
    mid_rec, mid_n = recall(0.3, 0.5)
    assert 0.30 <= mid_rec <= 0.85, (mid_rec, mid_n)
    # background (J<0.2) must stay untouched — the S-curve's floor is
    # what makes the band join sublinear at corpus scale
    lo_rec, lo_n = recall(0.0, 0.2)
    assert lo_rec <= 0.005, (lo_rec, lo_n)
    assert lo_n > 1000  # the background actually exercised the floor
