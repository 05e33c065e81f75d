"""Sink + checkpoint/resume round-trip tests (reference S3/S4/S5/E3
semantics: skip-existing via committed doc_ids, output + metrics commit)."""

from pyspark.sql import functions as F

from swissgeol_ocr_spark.plans.pipeline import (
    extract_pipeline,
    resume_filter,
    write_output,
)
from swissgeol_ocr_spark.sources.corpus import documents_to_spans


def test_write_resume_roundtrip(spark, sf_dir, tmp_path):
    out_path = str(tmp_path / "out")
    metrics_path = str(tmp_path / "metrics")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    spans = documents_to_spans(docs).cache()

    # run 1: first half
    first = spans.limit(20)
    write_output(extract_pipeline(first), out_path, run_id="run-1", metrics_path=metrics_path)
    committed = spark.read.parquet(out_path)
    assert committed.count() == 20

    # resume: anti-join against committed doc_ids leaves the second half
    remaining = resume_filter(spans, committed)
    assert remaining.count() == spans.count() - 20

    # run 2: the rest
    write_output(extract_pipeline(remaining), out_path, run_id="run-2", metrics_path=metrics_path)
    committed = spark.read.parquet(out_path)
    assert committed.count() == spans.count()
    assert committed.select("doc_id").distinct().count() == spans.count()
    # nothing left to do
    assert resume_filter(spans, committed).count() == 0

    # metrics: one row per doc per run, with per-partition lineage fields
    metrics = spark.read.parquet(metrics_path)
    assert metrics.count() == spans.count()
    assert set(metrics.columns) >= {
        "doc_id", "n_pages", "n_spans_in", "n_spans_out", "partition_id", "run_id", "ts",
    }
    assert metrics.filter(F.col("run_id") == "run-1").count() == 20
    # metrics agree with the committed output
    joined = metrics.alias("m").join(
        committed.alias("c"), "doc_id"
    ).filter(F.col("m.n_spans_out") != F.col("c.n_spans_out"))
    assert joined.count() == 0
