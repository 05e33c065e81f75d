"""O3 task-registry semantics, mirroring the reference's api/task behavior
(/root/reference/api.py:31-93, utils/task.py:28-62): 400/422/204 on submit,
at-most-one in-flight task per doc_id, has_finished:false while running,
result delivered exactly once (poll-after-done → 422), failed target →
has_finished:true with an error body, re-submit after collection starts a
fresh task."""

import threading

import pytest

from swissgeol_ocr_spark.streaming.tasks import (
    BAD_REQUEST,
    NO_CONTENT,
    OK,
    UNPROCESSABLE_ENTITY,
    TaskRegistry,
)

KNOWN = {"doc-1", "doc-2"}


def test_submit_validation_and_existence():
    reg = TaskRegistry(exists=KNOWN.__contains__, run=lambda d: d.upper(),
                       synchronous=True)
    assert reg.submit("") == BAD_REQUEST            # api.py:37-41
    assert reg.submit("doc-404") == UNPROCESSABLE_ENTITY  # api.py:49-53
    assert not reg.has_task("doc-404")
    assert reg.submit("doc-1") == NO_CONTENT


def test_result_delivered_exactly_once_then_resubmit_runs_again():
    runs = []
    reg = TaskRegistry(exists=KNOWN.__contains__,
                       run=lambda d: runs.append(d) or f"out:{d}",
                       synchronous=True)
    assert reg.submit("doc-1") == NO_CONTENT
    status, body = reg.collect("doc-1")
    assert (status, body) == (OK, {"has_finished": True, "data": "out:doc-1"})
    # task.collect_result deleted the entry: poll-after-done is 422
    assert reg.collect("doc-1") == (UNPROCESSABLE_ENTITY, None)
    # registry is empty again → a re-submit starts a FRESH task
    assert reg.submit("doc-1") == NO_CONTENT
    assert runs == ["doc-1", "doc-1"]


def test_at_most_one_in_flight_and_poll_while_running():
    gate = threading.Event()
    started = threading.Event()
    runs = []

    def slow(doc_id):
        runs.append(doc_id)
        started.set()
        assert gate.wait(30)
        return f"out:{doc_id}"

    reg = TaskRegistry(exists=KNOWN.__contains__, run=slow)
    assert reg.submit("doc-1") == NO_CONTENT
    assert started.wait(30)
    # re-submit while running: 204 but NO second task (task.start → False)
    assert reg.submit("doc-1") == NO_CONTENT
    # poll while running: has_finished false, nothing removed
    assert reg.collect("doc-1") == (OK, {"has_finished": False, "data": None})
    assert reg.collect("doc-1") == (OK, {"has_finished": False, "data": None})
    gate.set()
    # drain: result becomes available exactly once
    import time
    deadline = time.time() + 30
    while time.time() < deadline:
        status, body = reg.collect("doc-1")
        if status == OK and body["has_finished"]:
            break
        time.sleep(0.01)
    assert body == {"has_finished": True, "data": "out:doc-1"}
    assert runs == ["doc-1"]
    assert reg.collect("doc-1") == (UNPROCESSABLE_ENTITY, None)


def test_failed_target_is_finished_with_error_and_removed():
    def boom(doc_id):
        raise RuntimeError("kaput")

    reg = TaskRegistry(exists=KNOWN.__contains__, run=boom, synchronous=True)
    assert reg.submit("doc-2") == NO_CONTENT
    status, body = reg.collect("doc-2")
    assert status == OK
    assert body == {"has_finished": True, "error": "Internal Server Error"}
    assert reg.collect("doc-2") == (UNPROCESSABLE_ENTITY, None)


def test_registry_over_extraction_kernel(spark, sf_dir):
    """The registry fronting the real engine: exists = membership in the
    documents table, run = the extraction kernel on that document's spans
    (the reference's process() body, api.py:96+)."""
    import numpy as np

    from swissgeol_ocr_spark.operators.extract import extract_document
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    spans = {
        r.doc_id: r.spans
        for r in documents_to_spans(docs).collect()
    }
    cfg = ExtractConfig()

    def run(doc_id):
        ss = spans[doc_id]
        return extract_document(
            [s.kind for s in ss], [s.text for s in ss],
            [s.media_ref for s in ss],
            np.array([s.offset for s in ss], dtype=np.int64),
            np.array([s.page_no for s in ss], dtype=np.int64),
            np.array([[s.x0, s.y0, s.x1, s.y1] for s in ss], dtype=np.float64),
            np.array([s.confidence for s in ss], dtype=np.float64),
            np.array([s.orientation for s in ss], dtype=np.float64),
            cfg,
        )

    reg = TaskRegistry(exists=spans.__contains__, run=run, synchronous=True)
    some_id = next(iter(spans))
    assert reg.submit("nope") == UNPROCESSABLE_ENTITY
    assert reg.submit(some_id) == NO_CONTENT
    status, body = reg.collect(some_id)
    assert status == OK and body["has_finished"]
    assert len(body["data"]) > 0                      # ordered span sequence
    assert reg.collect(some_id) == (UNPROCESSABLE_ENTITY, None)


def test_durable_registry_recovers_completed_after_restart():
    """Restart recovery (DurableTaskRegistry): a doc completed and
    committed by a previous driver epoch answers has_finished from the
    durable record, exactly once per epoch; unknown docs still 422;
    in-flight-at-crash docs (never committed) re-run normally."""
    from swissgeol_ocr_spark.streaming.tasks import DurableTaskRegistry

    committed = {"doc-1": {"doc_id": "doc-1", "n_spans_out": 7, "status": "ok"}}
    runs = []
    reg = DurableTaskRegistry(
        exists=KNOWN.__contains__,
        run=lambda d: runs.append(d) or f"out:{d}",
        synchronous=True,
        completed_lookup=committed.get,
    )
    # restarted driver: never saw doc-1, but the table has it
    status, body = reg.collect("doc-1")
    assert status == OK and body["has_finished"]
    assert body["data"]["n_spans_out"] == 7
    assert runs == []                                  # no re-run forced
    # delivered once per epoch — the reference's delete-after-collect
    assert reg.collect("doc-1") == (UNPROCESSABLE_ENTITY, None)
    # a re-submit after recovery starts a FRESH task (reference semantics)
    assert reg.submit("doc-1") == NO_CONTENT
    status, body = reg.collect("doc-1")
    assert body == {"has_finished": True, "data": "out:doc-1"}
    assert runs == ["doc-1"]
    # doc-2 was in flight at crash time: not committed -> plain 422, then
    # a submit runs it for real
    assert reg.collect("doc-2") == (UNPROCESSABLE_ENTITY, None)
    assert reg.submit("doc-2") == NO_CONTENT
    assert reg.collect("doc-2")[1]["data"] == "out:doc-2"
    # live dict wins over the durable record while a task is registered
    reg2 = DurableTaskRegistry(
        exists=KNOWN.__contains__, run=lambda d: "fresh",
        synchronous=True, completed_lookup=committed.get,
    )
    assert reg2.submit("doc-1") == NO_CONTENT
    assert reg2.collect("doc-1")[1]["data"] == "fresh"


def test_durable_registry_over_committed_metrics_table(spark, tmp_path, sf_dir):
    """End-to-end restart: run 1 commits output+metrics via write_output;
    a NEW registry (the restarted driver) built over the committed metrics
    table answers collect() for the committed docs without re-running."""
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline, write_output
    from swissgeol_ocr_spark.sources.corpus import documents_to_spans
    from swissgeol_ocr_spark.streaming.tasks import (
        DurableTaskRegistry,
        metrics_completed_lookup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    out, metrics = str(tmp_path / "out"), str(tmp_path / "metrics")
    write_output(extract_pipeline(documents_to_spans(docs)), out, "epoch-1",
                 metrics_path=metrics, backend="parquet")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    reg = DurableTaskRegistry(
        exists=lambda d: True,
        run=lambda d: pytest.fail("recovery must not re-run committed docs"),
        synchronous=True,
        completed_lookup=metrics_completed_lookup(spark, metrics, backend="parquet"),
    )
    status, body = reg.collect(str(ids[0]))
    assert status == OK and body["has_finished"]
    assert body["data"]["run_id"] == "epoch-1"
    assert body["data"]["n_spans_out"] >= 0
    # a doc the epoch never processed is a plain 422
    assert reg.collect("never-seen") == (UNPROCESSABLE_ENTITY, None)
