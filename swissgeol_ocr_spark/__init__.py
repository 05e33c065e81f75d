"""swissgeol_ocr_spark — a PySpark-native document-extraction engine.

A from-scratch reimplementation of the *capabilities* of
swisstopo/swissgeol-ocr (reference at /root/reference, read-only) as an
idiomatic Spark DataFrame pipeline over an Iceberg-style table of
interleaved text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind, text, media_ref, offset, page_no,
                                  x0, y0, x1, y1, confidence, orientation>>)

The layout-analysis engine (reading order, boilerplate stripping,
confidence filtering, tiling/dedup, derotation) runs entirely inside
vectorized pandas/Arrow UDFs — no per-row Python, no network OCR calls.

Layout:
    functions/   pure numpy geometry + Spark column helpers (text ops,
                 similarity search)
    operators/   the per-page layout kernels (reading order, clean,
                 confidence, tiling, extract)
    sources/     synthetic corpus generation, read/resume helpers
    plans/       DataFrame pipeline composition, config, salting
    streaming/   Structured Streaming variant of the pipeline
"""

__version__ = "0.1.0"
