"""Structured Streaming variant of the extraction pipeline.

The reference has no true streaming surface — its API mode is a
request/response wrapper around the same batch processor
(/root/reference/api.py:31-93, utils/task.py:28-62). The streaming-native
equivalent of "documents arrive, get extracted, results are collectable"
is:

    readStream (new spans-table files / Iceberg appends)
      → the SAME extraction kernel via mapInArrow (stateless per document,
        so it is trivially streamable — no watermark needed)
      → writeStream with per-micro-batch checkpointing
        (exactly the reference's at-most-once-per-doc task registry,
        utils/task.py:12-24, but with durable state)

plus a windowed metrics stream standing in for the /collect polling
surface: per-window counts of processed documents and spans.

Everything here reuses the batch kernel — one code path, two execution
modes (Spark's own batch/streaming unification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swissgeol_ocr_spark.plans.config import ExtractConfig
from swissgeol_ocr_spark.plans.pipeline import OUT_SCHEMA, _extract_batches
from swissgeol_ocr_spark.sources.corpus import spans_schema_ddl


def read_spans_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a spans-table directory (new parquet files =
    new documents; Iceberg appends behave the same on a cluster)."""
    schema = f"doc_id string, spans {spans_schema_ddl()}"
    return spark.readStream.schema(schema).parquet(path)


def extract_stream(stream_df: DataFrame, config: ExtractConfig | None = None) -> DataFrame:
    """Stateless streaming extraction: the batch kernel applied per
    micro-batch. No shuffle, no state store — each document is independent
    (reference processes them one by one, main.py:71)."""
    config = config or ExtractConfig()
    return stream_df.mapInArrow(
        lambda it: _extract_batches(it, config), OUT_SCHEMA
    )


def metrics_stream(extracted: DataFrame, window: str = "1 minute") -> DataFrame:
    """Windowed processing metrics (the /collect polling surface,
    api.py:63-93, as a streaming aggregate): per processing-time window,
    documents and spans processed."""
    return (
        extracted.withColumn("_now", F.current_timestamp())
        .withWatermark("_now", "0 seconds")
        .groupBy(F.window("_now", window))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans_out").alias("n_spans_out"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_docs",
            "n_spans_out",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_path: str,
    config: ExtractConfig | None = None,
):
    """End-to-end streaming job: spans-dir → extraction → parquet sink with
    checkpoint/resume (exactly-once file sink semantics replace the
    reference's skip-existing anti-join in streaming mode)."""
    stream = read_spans_stream(spark, in_path)
    extracted = extract_stream(stream, config)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
