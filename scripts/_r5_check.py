#!/usr/bin/env python
"""Ad-hoc round-5 dev check: run changed queries vs their DuckDB oracles."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_band_stats",
    "corpus_curation", "dedup_exact",
]


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    from swissgeol_ocr_spark.plans.pipeline import configure_spark
    from swissgeol_ocr_spark.plans.queries import QUERIES, TABLES

    spark = configure_spark(
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    from swissgeol_ocr_spark.plans.queries import GOLDEN_SF01_QUERIES

    rc = 0
    for name in NAMES:
        if (name in GOLDEN_SF01_QUERIES
                and os.path.basename(SF.rstrip("/")) != "sf0.01"):
            print(f"{name}: SKIP (oracle golden pinned to sf0.01; "
                  "second-SF coverage = tests/test_twin.py)")
            continue
        fn, sql = QUERIES[name]
        sdf = fn(spark, SF).toPandas()
        ddf = con.sql(sql).df()
        cols_ok = sorted(sdf.columns) == sorted(ddf.columns)
        rows_ok = len(sdf) == len(ddf)
        vals_ok = False
        if cols_ok and rows_ok:
            a, b = canon(sdf), canon(ddf)
            try:
                import pandas.testing as pdt
                pdt.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-6)
                vals_ok = True
            except AssertionError as e:
                print(f"--- {name} diff: {e}")
        print(f"{name}: cols={cols_ok} rows={rows_ok} ({len(sdf)}/{len(ddf)}) vals={vals_ok}")
        if not (cols_ok and rows_ok and vals_ok):
            rc = 1
            if not cols_ok:
                print(f"  spark cols: {sorted(sdf.columns)}\n  duck cols:  {sorted(ddf.columns)}")
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
