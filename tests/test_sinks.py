"""Sink + checkpoint/resume round-trip tests (reference S3/S4/S5/E3
semantics: skip-existing via committed doc_ids, output + metrics commit).

The roundtrip runs once per sink backend: ``parquet`` always, ``iceberg``
when a live catalog is configured (this container ships no Iceberg jar, so
the iceberg leg skips cleanly here and activates unchanged on a cluster
image that has one — the gating itself is tested unconditionally below)."""

import pytest

from pyspark.sql import functions as F

from swissgeol_ocr_spark.plans.pipeline import (
    extract_pipeline,
    iceberg_catalog,
    read_committed,
    resolve_sink_backend,
    resume_filter,
    write_output,
)
from swissgeol_ocr_spark.sources.corpus import documents_to_spans


def test_sink_backend_gating(spark):
    """Backend resolution on a session without the Iceberg jar: auto falls
    back to parquet, an explicitly requested iceberg sink fails at resolve
    time (not at first write), unknown names are rejected — and a catalog
    that is CONFIGURED but whose jar is absent still resolves to parquet
    (config alone must not flip the sink; Class.forName is the gate)."""
    assert iceberg_catalog(spark) is None
    assert resolve_sink_backend(spark, "auto") == "parquet"
    assert resolve_sink_backend(spark, "parquet") == "parquet"
    with pytest.raises(RuntimeError, match="iceberg"):
        resolve_sink_backend(spark, "iceberg")
    with pytest.raises(ValueError):
        resolve_sink_backend(spark, "delta")
    spark.conf.set(
        "spark.sql.catalog.sinktest", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert iceberg_catalog(spark) is None  # class not loadable
        assert resolve_sink_backend(spark, "auto") == "parquet"
    finally:
        spark.conf.unset("spark.sql.catalog.sinktest")


def test_iceberg_probe_survives_stale_entry(tmp_path):
    """The catalog probe must keep scanning past a stale entry (configured
    catalog whose jar is absent) instead of giving up — one stale entry
    plus one live catalog must still resolve to the live one, whatever the
    conf dict's iteration order. No Iceberg jar ships in this container,
    so the live catalog is a COMPILED stand-in class whose name marks it
    as Iceberg, on the classpath of a fresh JVM (driver extraClassPath
    can't change after launch, hence the subprocess): this executes the
    conf-scan → Class.forName → backend-resolution path for real — 'auto'
    flips to iceberg and an explicit 'iceberg' request stops raising.
    The writeTo() data path itself still needs the real runtime jar (see
    BASELINE.md)."""
    import os
    import shutil
    import subprocess
    import sys
    import textwrap

    if shutil.which("javac") is None:
        pytest.skip("no javac in this environment")
    src = tmp_path / "FakeIcebergCatalog.java"
    src.write_text("public class FakeIcebergCatalog {}\n")
    subprocess.run(["javac", "-d", str(tmp_path), str(src)], check=True)

    script = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        from swissgeol_ocr_spark.plans.pipeline import (
            iceberg_catalog, resolve_sink_backend,
        )
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.extraClassPath", {str(tmp_path)!r})
            .config("spark.sql.catalog.aaastale",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.live", "FakeIcebergCatalog")
            .getOrCreate()
        )
        got = iceberg_catalog(spark)
        assert got == "live", f"probe found {{got!r}}, not the live catalog"
        assert resolve_sink_backend(spark, "auto") == "iceberg"
        assert resolve_sink_backend(spark, "iceberg") == "iceberg"
        spark.stop()
        print("PROBE-OK")
        """
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert "PROBE-OK" in out.stdout, out.stdout + "\n" + out.stderr[-2000:]


@pytest.fixture(params=["parquet", "iceberg"])
def sink_backend(request, spark):
    if request.param == "iceberg" and iceberg_catalog(spark) is None:
        pytest.skip("no loadable Iceberg catalog configured in this session")
    return request.param


def test_write_resume_roundtrip(spark, sf_dir, tmp_path, sink_backend):
    if sink_backend == "iceberg":
        cat = iceberg_catalog(spark)
        out_path = f"{cat}.sinktest.out"
        metrics_path = f"{cat}.sinktest.metrics"
    else:
        out_path = str(tmp_path / "out")
        metrics_path = str(tmp_path / "metrics")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    spans = documents_to_spans(docs).cache()

    # run 1: first half
    first = spans.limit(20)
    write_output(
        extract_pipeline(first), out_path, run_id="run-1",
        metrics_path=metrics_path, backend=sink_backend,
    )
    committed = read_committed(spark, out_path, backend=sink_backend)
    assert committed.count() == 20

    # resume: anti-join against committed doc_ids leaves the second half
    remaining = resume_filter(spans, committed)
    assert remaining.count() == spans.count() - 20

    # run 2: the rest
    write_output(
        extract_pipeline(remaining), out_path, run_id="run-2",
        metrics_path=metrics_path, backend=sink_backend,
    )
    committed = read_committed(spark, out_path, backend=sink_backend)
    assert committed.count() == spans.count()
    assert committed.select("doc_id").distinct().count() == spans.count()
    # nothing left to do
    assert resume_filter(spans, committed).count() == 0

    # metrics: one row per doc per run, with per-partition lineage fields
    metrics = read_committed(spark, metrics_path, backend=sink_backend)
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


def test_quarantine_poison_row(monkeypatch):
    """A document whose kernel raises must not kill the batch: it lands with
    empty output and an error status (driver-side invocation of the Arrow
    kernel driver, no Spark needed)."""
    import pyarrow as pa

    from swissgeol_ocr_spark.plans import pipeline as pl
    from swissgeol_ocr_spark.plans.config import ExtractConfig

    real = pl.extract_document

    def poisoned(kinds, texts, *args, **kwargs):
        if texts and texts[0] == "POISON":
            raise ValueError("boom")
        return real(kinds, texts, *args, **kwargs)

    monkeypatch.setattr(pl, "extract_document", poisoned)

    in_type = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()),
             ("offset", pa.int32()), ("page_no", pa.int32()), ("x0", pa.float64()),
             ("y0", pa.float64()), ("x1", pa.float64()), ("y1", pa.float64()),
             ("confidence", pa.float64()), ("orientation", pa.float64())]
        )
    )

    def span(text):
        return {"kind": "text", "text": text, "media_ref": "", "offset": 0,
                "page_no": 0, "x0": 10.0, "y0": 10.0, "x1": 100.0, "y1": 20.0,
                "confidence": 1.0, "orientation": 0.0}

    batch = pa.RecordBatch.from_arrays(
        [pa.array(["good", "bad", "good2"]),
         pa.array([[span("hello")], [span("POISON")], [span("world")]], type=in_type)],
        names=["doc_id", "spans"],
    )
    # aggressive strategy: every doc goes through the kernel (the
    # non-aggressive no-media fast path would bypass the poisoned kernel)
    out = list(pl._extract_batches(iter([batch]), ExtractConfig(use_aggressive_strategy=True)))[0]
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows["good"]["status"] == "ok" and rows["good"]["n_spans_out"] == 1
    assert rows["good2"]["status"] == "ok"
    assert rows["bad"]["status"] == "error:ValueError"
    assert rows["bad"]["spans_out"] == [] and rows["bad"]["n_spans_out"] == 0


def test_run_manifest_snapshot(spark, sf_dir, tmp_path):
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans as d2s

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    out_path, metrics_path = str(tmp_path / "o"), str(tmp_path / "m")
    write_output(extract_pipeline(d2s(docs)), out_path, "r1", metrics_path)
    manifest = spark.read.parquet(metrics_path + "_manifest").collect()
    assert len(manifest) == 1
    row = manifest[0]
    assert row.run_id == "r1" and row.n_docs == 12 and row.n_quarantined == 0
    assert row.n_ok == 12 and row.n_spans_out > 0


def test_submit_script_end_to_end(spark, sf_dir, tmp_path, monkeypatch):
    """scripts/submit_extract.py main() drives the full job incl. resume."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import submit_extract

    from swissgeol_ocr_spark.sources.corpus import documents_to_spans as d2s

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    in_path = str(tmp_path / "in")
    d2s(docs).write.parquet(in_path)
    out_path, metrics_path = str(tmp_path / "out"), str(tmp_path / "met")

    argv = ["prog", "--input", in_path, "--output", out_path,
            "--metrics", metrics_path, "--run-id", "rA"]
    monkeypatch.setattr(sys, "argv", argv)
    # keep the shared test session alive: getOrCreate returns it; stop is a no-op here
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    submit_extract.main()
    assert spark.read.parquet(out_path).count() == 10

    # resume run: everything done → nothing appended
    argv2 = argv[:-1] + ["rB"] + ["--done", out_path]
    monkeypatch.setattr(sys, "argv", argv2)
    submit_extract.main()
    assert spark.read.parquet(out_path).count() == 10


def test_salvage_normalizes_malformed_inputs():
    """P2 salvage repair semantics: null strings -> '', non-finite geometry
    -> 0 with inverted corners swapped, confidence clipped to [0,1],
    null/negative page numbers -> 0."""
    import numpy as np

    from swissgeol_ocr_spark.operators.extract import salvage_document_inputs

    kinds, texts, media, offs, pages, rects, confs, orients = salvage_document_inputs(
        ["text", None],
        [None, "w"],
        ["", None],
        [0, None],
        [None, -3],
        np.array([[100.0, 20.0, 10.0, float("nan")], [0.0, 0.0, 1.0, 1.0]]),
        np.array([float("nan"), 1.5]),
        np.array([float("inf"), 0.0]),
    )
    assert kinds == ["text", ""] and texts == ["", "w"] and media == ["", ""]
    assert offs.tolist() == [0, 0] and pages.tolist() == [0, 0]
    assert rects[0].tolist() == [10.0, 0.0, 100.0, 20.0]  # swapped + definite
    assert confs.tolist() == [0.0, 1.0] and orients.tolist() == [0.0, 0.0]


def test_salvage_retries_failed_kernel(monkeypatch):
    """A document whose kernel raises is salvaged + retried; only a row
    that still raises after repair is quarantined (the test above pins the
    repair itself; POISON here raises on BOTH attempts, FLAKY only when the
    text has not been nulled out by the repair pass)."""
    import pyarrow as pa

    from swissgeol_ocr_spark.plans import pipeline as pl
    from swissgeol_ocr_spark.plans.config import ExtractConfig

    real = pl.extract_document

    def poisoned(kinds, texts, *args, **kwargs):
        if texts and texts[0] == "POISON":
            raise ValueError("boom")
        if texts and texts[0] is None:
            raise ValueError("null text")  # repaired to '' by salvage
        return real(kinds, texts, *args, **kwargs)

    monkeypatch.setattr(pl, "extract_document", poisoned)

    in_type = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()),
             ("offset", pa.int32()), ("page_no", pa.int32()), ("x0", pa.float64()),
             ("y0", pa.float64()), ("x1", pa.float64()), ("y1", pa.float64()),
             ("confidence", pa.float64()), ("orientation", pa.float64())]
        )
    )

    def span(text):
        return {"kind": "text", "text": text, "media_ref": "", "offset": 0,
                "page_no": 0, "x0": 10.0, "y0": 10.0, "x1": 100.0, "y1": 20.0,
                "confidence": 1.0, "orientation": 0.0}

    batch = pa.RecordBatch.from_arrays(
        [pa.array(["dead", "flaky", "ok"]),
         pa.array([[span("POISON")], [span(None)], [span("fine")]], type=in_type)],
        names=["doc_id", "spans"],
    )
    # aggressive: force the kernel path (see test_quarantine_poison_row)
    out = list(pl._extract_batches(iter([batch]), ExtractConfig(use_aggressive_strategy=True)))[0]
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows["ok"]["status"] == "ok"
    assert rows["dead"]["status"] == "error:ValueError"
    assert rows["flaky"]["status"] == "salvaged"
    assert rows["flaky"]["n_spans_out"] == 1  # repaired row still extracted


def test_salvage_totality_property():
    """Property: for ANY garbage input arrays (hypothesis-generated), the
    salvage pass either repairs the row into something the kernel accepts
    or the batch driver quarantines it — never an uncaught crash, never a
    lost row."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from swissgeol_ocr_spark.operators.extract import (
        extract_document,
        salvage_document_inputs,
    )
    from swissgeol_ocr_spark.plans.config import ExtractConfig

    weird_str = st.one_of(st.none(), st.text(max_size=6), st.just("media"))
    weird_num = st.one_of(
        st.none(), st.integers(-5, 5),
        st.sampled_from([float("nan"), float("inf"), -float("inf"), 1e300]),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(weird_str, weird_str, weird_str, weird_num, weird_num,
                      weird_num, weird_num, weird_num, weird_num,
                      weird_num, weird_num),
            max_size=8,
        )
    )
    def check(rows):
        kinds = [r[0] for r in rows]
        texts = [r[1] for r in rows]
        media = [r[2] for r in rows]

        def arr(idx):
            return np.array(
                [float(r[idx]) if r[idx] is not None else np.nan for r in rows],
                dtype=np.float64,
            )

        rects = (
            np.stack([arr(5), arr(6), arr(7), arr(8)], axis=1)
            if rows else np.zeros((0, 4))
        )
        repaired = salvage_document_inputs(
            kinds, texts, media, arr(3), arr(4), rects, arr(9), arr(10)
        )
        out = extract_document(*repaired, ExtractConfig())
        # repaired rows always extract; offsets dense
        assert [o for (_, _, _, o) in out] == list(range(len(out)))

    check()
