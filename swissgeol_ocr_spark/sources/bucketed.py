"""Bucketed spans tables — the co-location layer for 100 TB steady state.

At fleet scale the spans corpus and the extraction output both live as
tables bucketed by ``hash(doc_id)`` (Iceberg bucket partition transform /
Spark ``bucketBy``). Then:

* the kernel consumes scan output directly — the north rule's explicit
  repartition becomes a no-op (``extract_pipeline(..., repartition=False)``)
* the skip-existing resume anti-join (reference main.py:36-41) is
  **shuffle-free**: both sides are pre-hashed on the join key, so the plan
  is scan ⋈ scan with zero Exchange operators — verified by
  tests/test_bucketed.py against the physical plan.

Parquet ``bucketBy`` tables stand in for Iceberg bucket transforms in this
sandbox; the co-location property is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Persist as a doc_id-bucketed, intra-bucket-sorted table."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def resume_join_bucketed(
    spark: SparkSession, input_table: str, done_table: str
) -> DataFrame:
    """Skip-existing over two co-bucketed tables: a sort-merge anti-join
    with no shuffle on either side."""
    inp = spark.table(input_table)
    done = spark.table(done_table).select("doc_id")
    return inp.join(done, "doc_id", "left_anti")
