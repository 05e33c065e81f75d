"""Kernel tests for tiling, dedup, classification, cleaning, confidence
filtering, derotation and text assembly — each pinned against the
reference's semantics (file:line cites in the operator docstrings)."""

import math

import numpy as np
import pytest

from tests.geom_ref import Rect, fast_intersection, x_overlap
from swissgeol_ocr_spark.operators.assemble import join_words, lines_from_words
from swissgeol_ocr_spark.operators.classify import (
    encode_kinds,
    find_old_ocr_spans,
    is_digitally_born,
)
from swissgeol_ocr_spark.operators.clean import clean_old_ocr_aggressive
from swissgeol_ocr_spark.operators.confidence import filter_blocks
from swissgeol_ocr_spark.operators.derotate import (
    derotate_quad,
    rotation_degrees,
    unit_to_rect_transform,
)
from swissgeol_ocr_spark.operators.mask import PageMask
from swissgeol_ocr_spark.operators.tiling import clip_rects, combine_text_lines


class TestClipRects:
    """Exact vectors from /root/reference/tests/test_textract.py:7-28."""

    def test_small_page_single_tile(self):
        assert clip_rects(1000, 1000) == [(0, 0, 1000, 1000)]

    def test_large_square(self):
        assert clip_rects(3000, 3000) == [
            (0, 0, 3000, 3000),
            (0, 0, 2000, 2000),
            (0, 1600, 2000, 3000),
            (1600, 0, 3000, 2000),
            (1600, 1600, 3000, 3000),
        ]

    def test_wide(self):
        assert clip_rects(5000, 200) == [
            (0, 0, 5000, 200),
            (0, 0, 2000, 200),
            (1600, 0, 3600, 200),
            (3200, 0, 5000, 200),
        ]

    def test_tall(self):
        assert clip_rects(200, 5000) == [
            (0, 0, 200, 5000),
            (0, 0, 200, 2000),
            (0, 1600, 200, 3600),
            (0, 3200, 200, 5000),
        ]


class TestCombineTextLines:
    def test_identical_line_not_duplicated(self):
        r = np.array([[0, 0, 100, 10]], dtype=np.float64)
        rects, idx = combine_text_lines(r, [0], r.copy(), [1])
        assert idx == [1]  # old dropped (covered by new), new kept — net one line

    def test_disjoint_lines_both_kept(self):
        r1 = np.array([[0, 0, 100, 10]], dtype=np.float64)
        r2 = np.array([[0, 20, 100, 30]], dtype=np.float64)
        rects, idx = combine_text_lines(r1, [0], r2, [1])
        assert idx == [0, 1]

    def test_60_percent_rule(self):
        # coverage is measured against the NEW line's own area
        # (textract.py:126-131): ≤60% → kept, >60% → dropped
        base = np.array([[0, 0, 100, 10]], dtype=np.float64)
        half = np.array([[50, 0, 150, 10]], dtype=np.float64)
        rects, idx = combine_text_lines(base, [0], half, [1])
        assert idx == [0, 1]  # 50% of new covered by base → kept
        seventy = np.array([[30, 0, 130, 10]], dtype=np.float64)
        rects, idx = combine_text_lines(base, [0], seventy, [1])
        # both directions apply (textract.py:121-122): 70% of OLD is covered
        # by new → old dropped first, then new survives against the rest
        assert idx == [1]


class TestDigitallyBorn:
    def _run(self, spans):
        kinds = encode_kinds([s[0] for s in spans])
        rects = np.array([s[1] for s in spans], dtype=np.float64)
        return is_digitally_born(kinds, rects)

    def test_text_only_page_is_born_digital(self):
        assert self._run([("text", (10, 10, 100, 20))])

    def test_empty_page_is_born_digital(self):
        assert self._run([("path", (0, 0, 0, 0))])

    def test_scan_image_only(self):
        assert not self._run([("media", (0, 0, 600, 800))])

    def test_text_then_covering_image_is_scanned(self):
        # Tiefenbrunnen/Lostorf pattern (util.py:10-15): OCR text drawn as
        # fill-text then covered by the scan image.
        assert not self._run(
            [("text", (50, 50, 200, 60)), ("media", (0, 0, 600, 800))]
        )

    def test_image_then_text_on_top_is_born_digital(self):
        assert self._run(
            [("media", (0, 0, 600, 800)), ("text", (50, 50, 200, 60))]
        )

    def test_empty_text_rect_ignored(self):
        assert not self._run(
            [("text", (10, 10, 10, 10)), ("media", (0, 0, 600, 800))]
        )


class TestFindOldOcr:
    def _run(self, spans):
        kinds = encode_kinds([s[0] for s in spans])
        rects = np.array([s[1] for s in spans], dtype=np.float64)
        return find_old_ocr_spans(kinds, rects)

    def test_ignore_text_always_stripped(self):
        assert self._run(
            [("ocr-text", (10, 10, 100, 20)), ("media", (0, 0, 600, 800))]
        ) == [0]

    def test_covered_visible_text_also_stripped(self):
        spans = [
            ("text", (50, 50, 200, 60)),
            ("media", (0, 0, 600, 800)),
            ("ocr-text", (50, 70, 200, 80)),
        ]
        assert self._run(spans) == [0, 2]

    def test_uncovered_text_kept(self):
        spans = [
            ("text", (50, 50, 200, 60)),
            ("media", (100, 100, 300, 300)),
            ("ocr-text", (50, 70, 200, 80)),
        ]
        assert self._run(spans) == [2]


class TestCleanAggressive:
    def _run(self, spans, w=600, h=800):
        kinds = encode_kinds([s[0] for s in spans])
        rects = np.array([s[1] for s in spans], dtype=np.float64)
        return clean_old_ocr_aggressive(kinds, rects, w, h)

    def test_hidden_ocr_over_blank_area_stripped(self):
        removed, mask = self._run([("ocr-text", (10, 10, 100, 20))])
        assert removed == [0]
        assert not mask.intersects(10, 10, 100, 20)

    def test_ocr_text_over_visible_ink_kept(self):
        # digitally-born docs draw text as fill-path then add ignore-text to
        # make it selectable (clean.py:74-76) — must be preserved
        removed, mask = self._run(
            [("path", (10, 10, 100, 20)), ("ocr-text", (10, 10, 100, 20))]
        )
        assert removed == []
        assert mask.intersects(10, 10, 100, 20)

    def test_text_covered_by_later_image_stripped_and_mask_lowered(self):
        removed, mask = self._run(
            [("text", (50, 50, 200, 60)), ("media", (0, 0, 600, 800))]
        )
        assert removed == [0]
        assert not mask.intersects(50, 50, 200, 60)

    def test_text_after_image_survives(self):
        removed, mask = self._run(
            [("media", (0, 0, 600, 800)), ("text", (50, 50, 200, 60))]
        )
        assert removed == []
        assert mask.intersects(50, 50, 200, 60)

    def test_word_in_separate_image_20pct_rule(self):
        # ocr-text over ink that covers <20% of its 10%-shrunk rect → strip
        removed, _ = self._run(
            [("path", (10, 10, 12, 20)), ("ocr-text", (10, 10, 100, 20))]
        )
        assert removed == [1]


class TestMask:
    def test_rounding_semantics(self):
        # mask.py:9-10 — round() + inclusive upper bound
        m = PageMask(100, 100)
        m.add_rect(10.4, 10.4, 20.4, 20.4)  # rounds to [10:21, 10:21]
        assert m.intersects(20, 20, 30, 30)
        assert not m.intersects(21, 21, 30, 30)

    def test_coverage_ratio(self):
        m = PageMask(100, 100)
        m.add_rect(0, 0, 49, 99)
        assert m.coverage_ratio(0, 0, 99, 99) == pytest.approx(0.5, abs=0.01)


class TestConfidenceFilter:
    def test_two_tier_thresholds(self):
        # T=0.7: low-avg block keeps only conf > 0.85; high-avg block keeps
        # conf > avg/2 (applyocr.py:94-112)
        rects = np.array(
            [[0, 0, 10, 10], [0, 20, 10, 30], [0, 40, 10, 50], [0, 60, 10, 70]],
            dtype=np.float64,
        )
        conf = np.array([0.9, 0.3, 0.95, 0.8])
        # block A = lines 0,1 → avg 0.6 < 0.7 → thr 0.85 → keeps only 0
        # block B = lines 2,3 → avg 0.875 ≥ 0.7 → thr 0.4375 → keeps both
        kept = filter_blocks([[0, 1], [2, 3]], conf, rects, None, 0.7)
        assert kept == [0, 2, 3]

    def test_boundary_strictness(self):
        # strictly greater-than (applyocr.py:110)
        rects = np.array([[0, 0, 10, 10], [0, 20, 10, 30]], dtype=np.float64)
        conf = np.array([0.85, 0.2])  # avg 0.525 < 0.7 → thr 0.85; 0.85 not > 0.85
        assert filter_blocks([[0, 1]], conf, rects, None, 0.7) == []

    def test_mask_suppression(self):
        rects = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float64)
        conf = np.array([1.0, 1.0])
        mask = PageMask(100, 100)
        mask.add_rect(0, 0, 10, 10)
        assert filter_blocks([[0, 1]], conf, rects, mask, 0.7) == [1]


class TestDerotate:
    def test_rotation_degrees(self):
        assert rotation_degrees(0, 0, 1, 0) == 0.0
        assert rotation_degrees(0, 0, 0, 1) == 90.0
        assert rotation_degrees(0, 0, -1, 0) == 180.0 or rotation_degrees(0, 0, -1, 0) == -180.0

    def test_unit_transform(self):
        f = unit_to_rect_transform(100, 200, 300, 600)
        assert f(0, 0) == (100, 200)
        assert f(1, 1) == (300, 600)
        assert f(0.5, 0.5) == (200, 400)

    def test_snap_small_angle_to_horizontal_band(self):
        # A quad tilted 5° snaps to 0° → straightened band around the
        # vertical middle with the true line height (textline.py:90-96).
        h = 800.0
        t = math.radians(5)
        # rect (100,100)-(200,110) rotated by 5° about (0, h)
        corners = [(100, 100), (200, 100), (200, 110), (100, 110)]
        quad = []
        for (x, y) in [corners[0], corners[1], corners[2], corners[3]]:
            dx, dy = x - 0, y - h
            quad.append((dx * math.cos(t) - dy * math.sin(t), dx * math.sin(t) + dy * math.cos(t) + h))
        rect, eff = derotate_quad(quad, 5.0, h)
        # snapped to 0° → NO derotation is applied (the detected angle is
        # treated as an error, textline.py:79-82); the rect is the tilted
        # quad's bbox straightened to a line-height band (textline.py:90-96)
        assert eff == 0.0
        x0, y0, x1, y1 = rect
        qx = [p[0] for p in quad]
        qy = [p[1] for p in quad]
        assert x0 == pytest.approx(min(qx), abs=1e-9)
        assert x1 == pytest.approx(max(qx), abs=1e-9)
        assert (y1 - y0) == pytest.approx(10, abs=1e-3)  # true line height
        assert (y0 + y1) / 2 == pytest.approx((min(qy) + max(qy)) / 2, abs=1e-9)

    def test_large_angle_not_snapped(self):
        h = 800.0
        quad = [(100, 100), (200, 100), (200, 110), (100, 110)]
        rect, eff = derotate_quad(quad, 45.0, h)
        assert eff == 45.0


class TestAssemble:
    def test_join_words_space_rule(self):
        # explicit space iff next.x0 > cur.x1 (draw.py:34-39)
        rects = np.array(
            [[0, 0, 30, 10], [35, 0, 60, 10], [60, 0, 90, 10]], dtype=np.float64
        )
        assert join_words(["Hello", "big", "world"], rects) == "Hello bigworld"

    def test_lines_from_words_grouping(self):
        texts = ["one", "two", "three", "four"]
        rects = np.array(
            [
                [0, 0, 30, 10],
                [40, 1, 70, 11],   # same band as "one"
                [0, 20, 30, 30],
                [40, 21, 70, 31],  # same band as "three"
            ],
            dtype=np.float64,
        )
        lines = lines_from_words(texts, rects)
        assert [t for t, _, _ in lines] == ["one two", "three four"]


class TestGeom:
    def test_empty_union_semantics(self):
        assert (Rect() | Rect(10, 10, 20, 20)).as_tuple() == (10, 10, 20, 20)

    def test_x_overlap_strict(self):
        assert x_overlap(Rect(0, 0, 10, 10), Rect(10, 0, 20, 10)) == 0.0
        assert x_overlap(Rect(0, 0, 11, 10), Rect(10, 0, 20, 10)) == 1.0

    def test_fast_intersection_open(self):
        assert not fast_intersection(Rect(0, 0, 10, 10), Rect(10, 10, 20, 20))
        assert fast_intersection(Rect(0, 0, 11, 11), Rect(10, 10, 20, 20))

    def test_intersect_area_zero_when_disjoint(self):
        assert Rect(0, 0, 10, 10).intersect(Rect(20, 20, 30, 30)).get_area() == 0.0


def test_lines_from_words_fast_path_matches_numpy_formulas():
    """The finite-value fast path (running min/max line rects +
    list-based join order) must equal the numpy per-line formulas it
    replaced, rect-for-rect and text-for-text; a NaN coordinate must
    take the numpy fallback (NaN-propagating rect) without crashing."""
    import numpy as np

    from swissgeol_ocr_spark.operators.assemble import join_words, lines_from_words

    rng = np.random.default_rng(55)
    for _ in range(150):
        n = int(rng.integers(1, 50))
        x0 = rng.uniform(0, 500, n)
        y0 = rng.uniform(0, 700, n)
        w = rng.uniform(1, 60, n)
        h = rng.uniform(5, 18, n)
        r = np.stack([x0, y0, x0 + w, y0 + h], axis=1)
        texts = [f"w{i}" for i in range(n)]
        for text, rect, idx in lines_from_words(texts, r):
            wr = r[idx]
            assert rect == (
                float(wr[:, 0].min()), float(wr[:, 1].min()),
                float(wr[:, 2].max()), float(wr[:, 3].max()),
            )
            assert text == join_words([texts[i] for i in idx], wr)
    bad = np.array([[10.0, 10.0, 40.0, 22.0], [float("nan"), 10.0, 80.0, 22.0]])
    out = lines_from_words(["a", "b"], bad)
    assert len(out) == 1 and np.isnan(out[0][1][0])
