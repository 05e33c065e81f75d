#!/usr/bin/env python
"""Print formatted physical plans for the PLANS.md evidence queries:
media_features, dedup_simhash_pairs (wide), lsh_ann (multi-table
multi-probe), ivf_ann_trained, dedup_band_stats, corpus_curation.

dedup_clusters is deliberately NOT here: its star-CC loop localCheckpoints
every round, so even constructing the final plan executes jobs — its scale
argument is the per-round shape (two grouped aggregations on the node key)
documented in PLANS.md and pinned by the chain/union-find tests.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    from swissgeol_ocr_spark.plans.pipeline import configure_spark
    from swissgeol_ocr_spark.plans.queries import QUERIES

    spark = configure_spark(
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    for name in ("media_features", "dedup_simhash_pairs", "lsh_ann",
                 "ivf_ann_trained", "dedup_band_stats", "corpus_curation",
                 "dedup_lines", "pii_scrub", "tfidf_topk",
                 "temperature_mix", "lm_score", "dedup_substrings",
                 "corpus_stats", "winnow_fingerprint"):
        fn, _ = QUERIES[name]
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        fn(spark, SF_DIR).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
