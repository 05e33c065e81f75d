"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline end-to-end on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the training-data operators, with DuckDB oracles
(see swissgeol_ocr_spark/plans/queries.py for the registry and the
reference file:line mapping).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the north-rule spans corpus from the sf0.001
    documents table and run the full extraction pipeline (C1→C2/C3→T1/T6→
    T5→R1-R6→C5/C6→ordered emission); returns one row per document with
    its ordered output span sequence."""
    from swissgeol_ocr_spark.plans.pipeline import configure_spark, extract_pipeline
    from swissgeol_ocr_spark.plans.queries import _mega_hint
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    configure_spark(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = documents_to_spans(docs)
    # flagship shape: two consumer branches (passthrough + kernel) share
    # the pipeline's exchange, which materializes the synthesis once
    return extract_pipeline(spans, has_mega=_mega_hint(spans))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from swissgeol_ocr_spark.plans.queries import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from swissgeol_ocr_spark.plans.queries import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
