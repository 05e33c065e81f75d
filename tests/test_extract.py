"""End-to-end tests for the per-document extraction kernel
(operators/extract.py), mirroring the reference's per-page orchestration
(/root/reference/ocr/__init__.py:102-145) on span fixtures from
FIXTURES.md §5."""

import numpy as np
import pytest

from swissgeol_ocr_spark.operators.extract import extract_document
from swissgeol_ocr_spark.plans.config import ExtractConfig


def _doc(spans, config=None):
    """spans: list of (kind, text, media_ref, page_no, rect, conf, orient)."""
    kinds = [s[0] for s in spans]
    texts = [s[1] for s in spans]
    media = [s[2] for s in spans]
    pages = np.array([s[3] for s in spans], dtype=np.int64)
    rects = np.array([s[4] for s in spans], dtype=np.float64)
    confs = np.array([s[5] if len(s) > 5 else 1.0 for s in spans], dtype=np.float64)
    orients = np.array([s[6] if len(s) > 6 else 0.0 for s in spans], dtype=np.float64)
    offsets = np.arange(len(spans), dtype=np.int64)
    return extract_document(
        kinds, texts, media, offsets, pages, rects, confs, orients,
        config or ExtractConfig(),
    )


def test_born_digital_passthrough():
    # FIXTURES.md §5 born_digital: text spans, no media → untouched
    out = _doc(
        [
            ("text", "Hello", "", 0, (10, 10, 100, 20)),
            ("text", "World", "", 0, (10, 30, 100, 40)),
        ]
    )
    assert out == [("text", "Hello", "", 0), ("text", "World", "", 1)]


def test_scan_with_stale_ocr_reextracted():
    # FIXTURES.md §5 scan_with_stale_ocr: media covering the page + hidden
    # ocr-text → stale OCR stripped, re-extracted in reading order. The two
    # ocr-text spans arrive in bottom-then-top order; extraction reorders.
    out = _doc(
        [
            ("media", "", "img-1", 0, (0, 0, 600, 800)),
            ("ocr-text", "second line", "", 0, (50, 120, 300, 132)),
            ("ocr-text", "first line", "", 0, (50, 100, 300, 112)),
        ]
    )
    assert out == [
        ("media", "", "img-1", 0),
        ("ocr-text", "first line", "", 1),
        ("ocr-text", "second line", "", 2),
    ]


def test_text_under_image_treated_as_scan():
    # FIXTURES.md §5 text_under_image (Tiefenbrunnen/Lostorf, util.py:10-15):
    # visible text fully covered by a later image → page is scanned; the
    # covered text is stripped and re-emitted as new OCR in reading order.
    out = _doc(
        [
            ("text", "covered B", "", 0, (50, 120, 300, 132)),
            ("text", "covered A", "", 0, (50, 100, 300, 112)),
            ("media", "", "scan-1", 0, (0, 0, 600, 800)),
        ]
    )
    assert out == [
        ("media", "", "scan-1", 0),
        ("ocr-text", "covered A", "", 1),
        ("ocr-text", "covered B", "", 2),
    ]


def test_low_confidence_lines_dropped():
    # C5: block avg below threshold → only very confident lines survive
    out = _doc(
        [
            ("media", "", "img", 0, (0, 0, 600, 800)),
            ("ocr-text", "good", "", 0, (50, 100, 300, 112), 0.9),
            ("ocr-text", "bad", "", 0, (50, 114, 300, 126), 0.3),
        ]
    )
    texts = [t for _, t, _, _ in out]
    assert "good" in texts and "bad" not in texts


def test_aggressive_keeps_visible_text_and_masks_reocr():
    # aggressive strategy: visible text stays in the base layer AND the
    # mask suppresses re-OCR overlapping it (C3+C6)
    cfg = ExtractConfig(use_aggressive_strategy=True)
    out = _doc(
        [
            ("text", "visible", "", 0, (50, 100, 300, 112)),
            ("ocr-text", "hidden dup", "", 0, (50, 100, 300, 112)),
            ("ocr-text", "hidden other", "", 0, (50, 300, 300, 312)),
        ],
        cfg,
    )
    # 'visible' survives as base layer; 'hidden dup' overlaps visible ink →
    # kept in base too (clean.py:74-90); 'hidden other' over blank page is
    # stripped and re-emitted via OCR, but its rect does not touch the mask
    assert ("text", "visible", "", 0) == out[0]
    kinds_texts = [(k, t) for k, t, _, _ in out]
    assert ("ocr-text", "hidden dup") in kinds_texts
    assert ("ocr-text", "hidden other") in kinds_texts


def test_multi_page_ordering_and_dense_offsets():
    out = _doc(
        [
            ("text", "p2", "", 2, (10, 10, 100, 20)),
            ("text", "p1", "", 1, (10, 10, 100, 20)),
        ]
    )
    assert out == [("text", "p1", "", 0), ("text", "p2", "", 1)]


def test_empty_document():
    assert _doc([]) == []


def test_reading_order_two_columns_in_extraction():
    # full pipeline: scanned page whose stale OCR forms two columns + banner
    spans = [("media", "", "scan", 0, (0, 0, 600, 800))]
    spans.append(("ocr-text", "banner", "", 0, (100, 0, 500, 14)))
    for i in range(3):
        spans.append(("ocr-text", f"right-{i}", "", 0, (320, 30 + 14 * i, 560, 42 + 14 * i)))
    for i in range(3):
        spans.append(("ocr-text", f"left-{i}", "", 0, (40, 30 + 14 * i, 280, 42 + 14 * i)))
    out = _doc(spans)
    texts = [t for k, t, _, _ in out if k == "ocr-text"]
    assert texts == ["banner", "left-0", "left-1", "left-2", "right-0", "right-1", "right-2"]


def test_word_level_extraction_builds_lines():
    # E1 layout detection: word-granularity detections grouped into lines
    # with the word-join space rule (draw.py:34-39) before reading order
    cfg = ExtractConfig(use_aggressive_strategy=False, build_lines_from_words=True)
    spans = [("media", "", "scan", 0, (0, 0, 600, 800))]
    # line 1: "Hello world" as two word spans (gap → space)
    spans.append(("ocr-text", "Hello", "", 0, (50, 100, 90, 112), 0.9))
    spans.append(("ocr-text", "world", "", 0, (95, 101, 140, 112), 0.9))
    # line 2: "foobar" split with NO gap (next.x0 == cur.x1 → no space)
    spans.append(("ocr-text", "foo", "", 0, (50, 120, 70, 132), 0.9))
    spans.append(("ocr-text", "bar", "", 0, (70, 121, 95, 132), 0.9))
    out = _doc(spans, cfg)
    texts = [t for k, t, _, _ in out if k == "ocr-text"]
    assert texts == ["Hello world", "foobar"]
