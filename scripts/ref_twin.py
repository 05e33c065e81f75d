"""Independent reference-shaped twin of the extraction kernel.

Purpose: the golden parquets (tests/golden/*.parquet) must NOT be produced
by the same kernel they validate. This module is a naive, object-per-line,
set/list-based reimplementation that mirrors the REFERENCE's own code
shape-for-shape (pymupdf objects replaced by a tiny Rect class; the
Textract network call replaced by the span-native candidate detections,
per the north star):

* Rect / x_overlap / fast_intersection     /root/reference/ocr/util.py:38-68
* Mask (integer-rounded raster)            /root/reference/ocr/mask.py:4-23
* is_digitally_born fold                   /root/reference/ocr/util.py:4-35
* find_old_ocr (conservative strip)        /root/reference/ocr/preprocess/clean.py:7-42
* clean_old_ocr_aggressive sweep           /root/reference/ocr/preprocess/clean.py:57-120
* clip_rects + combine_text_lines (60%)    /root/reference/ocr/textract/textract.py:98-131
* ReadingOrderGeometry / ReadingOrderColumn / sort_lines
                                           /root/reference/ocr/readingorder.py:22-223
* two-tier confidence filter + mask        /root/reference/ocr/applyocr.py:94-112
* word→line grouping + space rule          /root/reference/ocr/draw.py:26-39 band test

It imports NOTHING from swissgeol_ocr_spark. The only deliberate
difference from the reference: the reference iterates Python sets of
objects, so exact ties in its min(...) selections resolve by memory
address (nondeterministic); here every collection preserves input order,
so ties resolve by lowest input index — the same deterministic rule the
Spark kernel documents (operators/readingorder.py module docstring).

Pure Python + numpy (numpy only for the Mask raster, like the reference).
Deliberately naive and slow — clarity over speed; it runs once per golden
regeneration over the sf0.01 corpus.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Geometry primitives (pymupdf.Rect stand-in + util.py helpers)
# ---------------------------------------------------------------------------


class Rect:
    """Minimal pymupdf.Rect stand-in: value semantics, identity-hashable
    like the reference's Rect objects inside Python sets."""

    __slots__ = ("x0", "y0", "x1", "y1")

    def __init__(self, x0: float, y0: float, x1: float, y1: float):
        self.x0, self.y0, self.x1, self.y1 = float(x0), float(y0), float(x1), float(y1)

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    @property
    def is_empty(self) -> bool:
        # pymupdf: empty iff no positive area
        return self.x0 >= self.x1 or self.y0 >= self.y1

    def include_rect(self, other: "Rect") -> "Rect":
        return Rect(
            min(self.x0, other.x0), min(self.y0, other.y0),
            max(self.x1, other.x1), max(self.y1, other.y1),
        )

    def contains(self, other: "Rect") -> bool:
        return (
            self.x0 <= other.x0 <= other.x1 <= self.x1
            and self.y0 <= other.y0 <= other.y1 <= self.y1
        )

    def intersect_area(self, other: "Rect") -> float:
        w = min(self.x1, other.x1) - max(self.x0, other.x0)
        h = min(self.y1, other.y1) - max(self.y0, other.y0)
        return w * h if (w > 0 and h > 0) else 0.0

    def get_area(self) -> float:
        return max(self.width * self.height, 0.0)


def x_overlap(rect1: Rect, rect2: Rect) -> float:
    """util.py:38-52."""
    if (rect1.x0 < rect2.x1) and (rect2.x0 < rect1.x1):
        return min(rect1.x1, rect2.x1) - max(rect1.x0, rect2.x0)
    return 0.0


def fast_intersection(rect1: Rect, rect2: Rect) -> bool:
    """util.py:55-68."""
    return (
        rect1.x0 < rect2.x1 and rect2.x0 < rect1.x1
        and rect1.y0 < rect2.y1 and rect2.y0 < rect1.y1
    )


class Mask:
    """mask.py:4-23 — integer-rounded page raster."""

    def __init__(self, width: float, height: float):
        self.mask = np.zeros((round(width), round(height)))

    def _submask(self, rect: Rect) -> np.ndarray:
        return self.mask[
            round(rect.x0) : round(rect.x1) + 1, round(rect.y0) : round(rect.y1) + 1
        ]

    def add_rect(self, rect: Rect) -> None:
        self._submask(rect).fill(1)

    def remove_rect(self, rect: Rect) -> None:
        self._submask(rect).fill(0)

    def intersects(self, rect: Rect) -> bool:
        return bool(np.any(self._submask(rect)))

    def coverage_ratio(self, rect: Rect) -> float:
        submask = self._submask(rect)
        if submask.size == 0:
            return float("nan")
        return float(np.sum(submask)) / float(submask.size)


# ---------------------------------------------------------------------------
# Span model: one input span = (kind, text, media_ref, page, rect, conf,
# orient); inside a page we carry Span objects with their position in the
# page's draw order (identity for the sets the reference keeps).
# ---------------------------------------------------------------------------


class Span:
    __slots__ = ("pos", "kind", "text", "media_ref", "rect", "confidence", "orientation")

    def __init__(self, pos, kind, text, media_ref, rect, confidence, orientation):
        self.pos = pos  # position within the page draw order
        self.kind = kind
        self.text = text
        self.media_ref = media_ref
        self.rect = rect
        self.confidence = confidence
        self.orientation = orientation


# ---------------------------------------------------------------------------
# C1 / C2 / C3 — bboxlog folds (util.py:4-35, clean.py:7-42, clean.py:57-120)
# ---------------------------------------------------------------------------


def is_digitally_born(page_spans: list[Span]) -> bool:
    """util.py:4-35 fold, span kinds standing in for bboxlog box types:
    text↔fill-text/stroke-text, media↔fill-image/fill-imgmask."""
    text_bbox_union = Rect(0.0, 0.0, 0.0, 0.0)  # pymupdf.Rect() empty union
    have_text = False
    all_text_covered = False
    has_image = False
    for s in page_spans:
        if s.kind == "text" and not s.rect.is_empty:
            all_text_covered = False
            if have_text:
                text_bbox_union = text_bbox_union.include_rect(s.rect)
            else:
                text_bbox_union = s.rect
                have_text = True
        if s.kind == "media":
            has_image = True
            if s.rect.contains(text_bbox_union):
                all_text_covered = True
    union_empty = not have_text
    return not (has_image and (union_empty or all_text_covered))


def find_old_ocr(page_spans: list[Span]) -> list[Span]:
    """clean.py:7-42 — conservative strip: the ignore-text spans, plus the
    visible text spans when a single image covers them all."""
    ignore_text = []
    visible_text = []
    text_bbox_union = Rect(0.0, 0.0, 0.0, 0.0)
    have_text = False
    all_text_covered = False
    for s in page_spans:
        if s.kind == "text" and not s.rect.is_empty:
            all_text_covered = False
            if have_text:
                text_bbox_union = text_bbox_union.include_rect(s.rect)
            else:
                text_bbox_union = s.rect
                have_text = True
            visible_text.append(s)
        if s.kind == "media":
            if s.rect.contains(text_bbox_union):
                all_text_covered = True
        if s.kind == "ocr-text":
            ignore_text.append(s)
    if all_text_covered:
        return visible_text + ignore_text
    return ignore_text


def clean_old_ocr_aggressive(
    page_spans: list[Span], page_w: float, page_h: float
) -> tuple[list[Span], Mask]:
    """clean.py:57-120 — order-sensitive visibility sweep. Returns the
    invisible (stripped) spans sorted by page position, plus the mask of
    still-visible ink."""
    mask = Mask(page_w, page_h)
    possibly_visible_text: list[Span] = []
    invisible_text: list[Span] = []

    for s in page_spans:
        if s.kind == "ocr-text":
            if not mask.intersects(s.rect):
                invisible_text.append(s)
            else:
                shrunk = Rect(
                    s.rect.x0 + 0.1 * s.rect.width,
                    s.rect.y0 + 0.1 * s.rect.height,
                    s.rect.x1 - 0.1 * s.rect.width,
                    s.rect.y1 - 0.1 * s.rect.height,
                )
                if mask.coverage_ratio(shrunk) < 0.2:
                    invisible_text.append(s)
        if s.kind in ("text", "path") and not s.rect.is_empty:
            mask.add_rect(s.rect)
            possibly_visible_text.append(s)
        if s.kind == "media":
            to_be_removed = [t for t in possibly_visible_text if s.rect.contains(t.rect)]
            for t in to_be_removed:
                invisible_text.append(t)
                possibly_visible_text.remove(t)
            mask.remove_rect(s.rect)

    return sorted(invisible_text, key=lambda t: t.pos), mask


# ---------------------------------------------------------------------------
# T1 / T6 — tiling + asymmetric 60% dedup (textract.py:98-131)
# ---------------------------------------------------------------------------

MAX_DIMENSION_POINTS = 2000


def clip_rects(main_rect: Rect) -> list[Rect]:
    """textract.py:98-117."""
    overlap = MAX_DIMENSION_POINTS // 5
    if main_rect.width <= MAX_DIMENSION_POINTS and main_rect.height <= MAX_DIMENSION_POINTS:
        return [main_rect]
    x_starts = list(range(0, int(main_rect.width - overlap), MAX_DIMENSION_POINTS - overlap)) or [0]
    y_starts = list(range(0, int(main_rect.height - overlap), MAX_DIMENSION_POINTS - overlap)) or [0]
    rects = [main_rect]
    for x0 in x_starts:
        for y0 in y_starts:
            rects.append(
                Rect(
                    max(main_rect.x0, float(x0)),
                    max(main_rect.y0, float(y0)),
                    min(float(x0) + MAX_DIMENSION_POINTS, main_rect.x1),
                    min(float(y0) + MAX_DIMENSION_POINTS, main_rect.y1),
                )
            )
    return rects


class TextLine:
    """textline.py stand-in: a candidate detection (rect + text + conf)."""

    __slots__ = ("rect", "text", "confidence", "pos")

    def __init__(self, rect: Rect, text: str, confidence: float, pos: int):
        self.rect = rect
        self.text = text
        self.confidence = confidence
        self.pos = pos  # candidate order, identity for tie-breaks


def not_covered_in(line: TextLine, other_lines: list[TextLine]) -> bool:
    """textract.py:126-131."""
    return not any(
        other.rect.intersect_area(line.rect) > 0.6 * line.rect.get_area()
        for other in other_lines
    )


def combine_text_lines(lines1: list[TextLine], lines2: list[TextLine]) -> list[TextLine]:
    """textract.py:120-123."""
    keep_lines = [line for line in lines1 if not_covered_in(line, lines2)]
    keep_lines.extend([line for line in lines2 if not_covered_in(line, keep_lines)])
    return keep_lines


# ---------------------------------------------------------------------------
# R1-R6 — reading order (readingorder.py:22-223), object-per-line
# ---------------------------------------------------------------------------


class ReadingOrderGeometry:
    """readingorder.py:29-87."""

    __slots__ = ("rect",)

    def __init__(self, rect: Rect):
        self.rect = rect

    @property
    def x_middle(self) -> float:
        return (self.rect.x0 + self.rect.x1) / 2

    @property
    def y_middle(self) -> float:
        return (self.rect.y0 + self.rect.y1) / 2

    @property
    def sort_key(self) -> float:
        return self.rect.x0 + 2 * self.rect.y0

    def needs_to_come_before(self, other: "ReadingOrderGeometry") -> bool:
        top_left_condition = (
            self.x_middle < other.x_middle and self.y_middle <= other.y_middle
        ) or (self.x_middle <= other.x_middle and self.y_middle < other.y_middle)
        left_condition = self.x_middle < other.rect.x0 and (
            self.y_middle < other.rect.y1 or self.rect.y0 < other.y_middle
        )
        top_condition = self.y_middle < other.rect.y0 and (
            self.x_middle < other.rect.x1 or self.rect.x0 < other.x_middle
        )
        return top_left_condition or left_condition or top_condition

    def distance_after(self, other: "ReadingOrderGeometry") -> float:
        left = math.hypot(self.rect.x0 - other.rect.x0, self.rect.y0 - other.rect.y1)
        middle = math.hypot(self.x_middle - other.x_middle, self.rect.y0 - other.rect.y1)
        right = math.hypot(self.rect.x1 - other.rect.x1, self.rect.y0 - other.rect.y1)
        return min(left, middle, right)


class TextLineReadingOrder:
    __slots__ = ("line", "geometry", "idx")

    def __init__(self, line: TextLine, idx: int = 0):
        self.line = line
        self.geometry = ReadingOrderGeometry(line.rect)
        self.idx = idx  # position in all_lines — the deterministic tie id


class ReadingOrderColumn:
    """readingorder.py:90-163."""

    __slots__ = ("rect", "bottom_of_first_line", "top_of_last_line")

    def __init__(self, rect: Rect, bottom_of_first_line: float, top_of_last_line: float):
        self.rect = rect
        self.bottom_of_first_line = bottom_of_first_line
        self.top_of_last_line = top_of_last_line

    def add_line_before(self, line: TextLine) -> "ReadingOrderColumn":
        return ReadingOrderColumn(
            rect=self.rect.include_rect(line.rect),
            bottom_of_first_line=line.rect.y1,
            top_of_last_line=self.top_of_last_line,
        )

    def is_interrupted_by(self, rect: Rect) -> bool:
        y_middle = (rect.y0 + rect.y1) / 2
        return (
            fast_intersection(rect, self.rect)
            and self.bottom_of_first_line < y_middle < self.top_of_last_line
        )

    def can_be_extended_by(self, geometry: ReadingOrderGeometry) -> bool:
        return (
            geometry.y_middle > self.top_of_last_line
            and geometry.rect.y0 - self.rect.y1 < (self.rect.height + geometry.rect.height)
            and (
                x_overlap(self.rect, geometry.rect) > 0.8 * geometry.rect.width
                or x_overlap(self.rect, geometry.rect) > 0.9 * self.rect.width
            )
        )

    def is_accurately_extended_by(self, geometry: ReadingOrderGeometry) -> bool:
        return (
            self.can_be_extended_by(geometry)
            and (
                x_overlap(self.rect, geometry.rect)
                > 0.6 * max(self.rect.width, geometry.rect.width)
            )
            and (self.rect.y1 < geometry.rect.y1)
        )

    @classmethod
    def current_column(
        cls,
        current_line: TextLineReadingOrder,
        preceding_lines: list[TextLineReadingOrder],
        all_lines: list[TextLineReadingOrder],
    ) -> "ReadingOrderColumn":
        other_lines = [l for l in all_lines if l is not current_line]
        column = ReadingOrderColumn(
            rect=current_line.geometry.rect,
            bottom_of_first_line=current_line.geometry.rect.y1,
            top_of_last_line=current_line.geometry.rect.y0,
        )
        accurate_extension_count = sum(
            1 for line in other_lines if column.is_accurately_extended_by(line.geometry)
        )
        for line in reversed(preceding_lines):
            new_column = column.add_line_before(line.line)
            other_lines.remove(line)

            if any(
                new_column.is_interrupted_by(other_line.geometry.rect)
                for other_line in other_lines
            ):
                break

            new_accurate_extension_count = sum(
                1 for l in other_lines if new_column.is_accurately_extended_by(l.geometry)
            )
            if new_accurate_extension_count < accurate_extension_count:
                break
            accurate_extension_count = new_accurate_extension_count

            column = new_column

        return column


def _min_by(lines, key):
    """Deterministic min: first minimal element in list order (= lowest
    candidate index, the documented tie rule)."""
    best = None
    best_key = None
    for line in lines:
        k = key(line)
        if best is None or k < best_key:
            best, best_key = line, k
    return best


def starting_line_for_next_block(remaining_lines):
    """readingorder.py:166-175."""
    candidate_lines = list(remaining_lines)
    selected_line = None
    while candidate_lines:
        selected_line = _min_by(candidate_lines, lambda l: l.geometry.sort_key)
        candidate_lines.remove(selected_line)
        candidate_lines = [
            line
            for line in candidate_lines
            if line.geometry.needs_to_come_before(selected_line.geometry)
        ]
    return selected_line


def sort_lines(text_lines: list[TextLine]) -> list[list[TextLine]]:
    """readingorder.py:178-223 — returns blocks of TextLines in reading
    order (the reference wraps them in ReadingOrderBlock; we only need the
    grouping + order)."""
    all_lines = [TextLineReadingOrder(line, i) for i, line in enumerate(text_lines)]
    remaining_lines = list(all_lines)
    blocks = []

    while remaining_lines:
        current_line = starting_line_for_next_block(remaining_lines)
        remaining_lines.remove(current_line)
        current_block = [current_line]

        while remaining_lines:
            next_line = None

            column = ReadingOrderColumn.current_column(
                current_line, current_block[:-1], all_lines
            )
            in_column_lines = [
                line for line in remaining_lines
                if column.can_be_extended_by(line.geometry)
            ]
            if len(in_column_lines):
                highest_following = _min_by(in_column_lines, lambda l: l.geometry.rect.y0)
                candidates = [
                    line
                    for line in in_column_lines
                    if line.geometry.needs_to_come_before(highest_following.geometry)
                    or line is highest_following
                ]
                next_line = _min_by(candidates, lambda l: l.geometry.rect.x0)

            if not next_line:
                following = [
                    line for line in remaining_lines
                    if line.geometry.distance_after(current_line.geometry) < 20
                ]
                if len(following):
                    next_line = _min_by(following, lambda l: l.geometry.rect.y0)

            if not next_line:
                break

            current_line = next_line
            remaining_lines.remove(current_line)

            if any(
                line.geometry.needs_to_come_before(current_line.geometry)
                for line in remaining_lines
            ):
                remaining_lines.append(current_line)
                # keep the index ordering every later min(...) tie-breaks on
                # (the reference's set has no order; ours is the documented
                # lowest-input-index rule)
                remaining_lines.sort(key=lambda l: l.idx)
                break

            current_block.append(current_line)

        blocks.append([l.line for l in current_block])
    return blocks


# ---------------------------------------------------------------------------
# C5/C6 — two-tier confidence filter + mask suppression (applyocr.py:94-112)
# ---------------------------------------------------------------------------


def apply_confidence_filter(
    blocks: list[list[TextLine]], mask: Mask, confidence_threshold: float
) -> list[TextLine]:
    draw_lines = []
    for lines in blocks:
        line_confidence_values = [line.confidence for line in lines]
        avg_confidence = sum(line_confidence_values) / len(line_confidence_values)
        if avg_confidence < confidence_threshold:
            line_confidence_threshold = (1 + confidence_threshold) / 2
        else:
            line_confidence_threshold = avg_confidence / 2
        for line in lines:
            if not mask.intersects(line.rect):
                if line.confidence > line_confidence_threshold:
                    draw_lines.append(line)
    return draw_lines


# ---------------------------------------------------------------------------
# E1 — word→line grouping + the draw.py:34-39 space rule
# ---------------------------------------------------------------------------


def join_words(word_lines: list[TextLine]) -> str:
    """Left-to-right join; explicit space iff the next word starts strictly
    right of this word's end (draw.py:34-39). Stable sort by x0."""
    # stable sort by x0 only: equal-x0 words keep insertion (scan) order,
    # matching a stable argsort
    ordered = sorted(word_lines, key=lambda w: w.rect.x0)
    parts = []
    for i, w in enumerate(ordered):
        parts.append(w.text)
        if i + 1 < len(ordered) and ordered[i + 1].rect.x0 > w.rect.x1:
            parts.append(" ")
    return "".join(parts)


def lines_from_words(word_spans: list[TextLine]) -> list[TextLine]:
    """Group word detections into text lines by the draw.py:26-32 band
    test (a word belongs to a line iff its vertical middle lies inside the
    line's band AND the band middle lies inside the word's extent), greedy
    scan in (y0, x0) order, most-recent line first. Line confidence = mean
    of word confidences."""
    ordered = sorted(word_spans, key=lambda w: (w.rect.y0, w.rect.x0, w.pos))
    groups: list[list[TextLine]] = []
    bands: list[tuple[float, float]] = []
    for w in ordered:
        ym = (w.rect.y0 + w.rect.y1) / 2
        placed = False
        for li in range(len(groups) - 1, -1, -1):
            b0, b1 = bands[li]
            band_mid = (b0 + b1) / 2
            if b0 < ym < b1 and w.rect.y0 < band_mid < w.rect.y1:
                groups[li].append(w)
                bands[li] = (min(b0, w.rect.y0), max(b1, w.rect.y1))
                placed = True
                break
        if not placed:
            groups.append([w])
            bands.append((w.rect.y0, w.rect.y1))

    out = []
    for i, g in enumerate(groups):
        rect = Rect(
            min(w.rect.x0 for w in g), min(w.rect.y0 for w in g),
            max(w.rect.x1 for w in g), max(w.rect.y1 for w in g),
        )
        conf = float(np.mean([w.confidence for w in g]))
        out.append(TextLine(rect, join_words(g), conf, i))
    return out


# ---------------------------------------------------------------------------
# O2 — per-page and per-document composition (ocr/__init__.py:102-145)
# ---------------------------------------------------------------------------

CONFIDENCE_THRESHOLD = 0.7
MAX_LINES_PER_PAGE = 5_000
MAX_PAGE_MASK_AREA = 100_000_000.0


def _extract_page(
    page_spans: list[Span],
    aggressive: bool,
    build_lines_from_words: bool,
) -> list[tuple[str, str, str]]:
    """One page in draw order → emitted (kind, text, media_ref) sequence."""
    page_w = max(1.0, float(math.ceil(max(s.rect.x1 for s in page_spans))))
    page_h = max(1.0, float(math.ceil(max(s.rect.y1 for s in page_spans))))
    if page_w * page_h > MAX_PAGE_MASK_AREA:
        return [(s.kind, s.text, s.media_ref) for s in page_spans]

    if aggressive:
        removed, mask = clean_old_ocr_aggressive(page_spans, page_w, page_h)
    else:
        if is_digitally_born(page_spans):
            return [(s.kind, s.text, s.media_ref) for s in page_spans]
        removed = find_old_ocr(page_spans)
        mask = Mask(page_w, page_h)

    removed_ids = {id(s) for s in removed}
    base = [s for s in page_spans if id(s) not in removed_ids]
    emitted = [(s.kind, s.text, s.media_ref) for s in base]

    # the stripped text-bearing spans are the candidate detections (what
    # OCR of the page image would report — Textract in the reference)
    candidates = [
        TextLine(s.rect, s.text, s.confidence, i)
        for i, s in enumerate(
            s for s in removed if s.kind in ("text", "ocr-text") and s.text != ""
        )
    ]
    if not candidates:
        return emitted
    if not build_lines_from_words and len(candidates) > MAX_LINES_PER_PAGE:
        return emitted

    if build_lines_from_words:
        candidates = lines_from_words(candidates)
        if not candidates:
            return emitted
        if len(candidates) > MAX_LINES_PER_PAGE:
            return emitted

    # T1/T6 — per-tile detection + cross-tile dedup, full page first
    text_lines: list[TextLine] = []
    page_rect = Rect(0.0, 0.0, page_w, page_h)
    for clip in clip_rects(page_rect):
        new_lines = [
            c for c in candidates
            if c.rect.x0 >= clip.x0 and c.rect.y0 >= clip.y0
            and c.rect.x1 <= clip.x1 and c.rect.y1 <= clip.y1
        ]
        text_lines = combine_text_lines(text_lines, new_lines)

    if not text_lines:
        return emitted

    blocks = sort_lines(text_lines)
    for line in apply_confidence_filter(blocks, mask, CONFIDENCE_THRESHOLD):
        emitted.append(("ocr-text", line.text, ""))
    return emitted


# ---------------------------------------------------------------------------
# P1/P2 — corrupt-input salvage (preprocess/preprocess_doc.py:8-49 page-tree
# repair + ocr/__init__.py:40-57 error-handling retry), row-at-a-time like
# the reference walks the page tree. Independent of the kernel's vectorized
# numpy form (operators/extract.salvage_document_inputs) — tests/test_twin.py
# pins the two equal on adversarial/hypothesis poison inputs.
# ---------------------------------------------------------------------------

_SALVAGE_INT_CAP = 2.0 ** 62  # exactly representable in float64, inside int64
_SALVAGE_COORD_CAP = 1e6


def _salvage_nonneg_int(v) -> int:
    """null / non-finite / negative → 0; finite huge → cap; truncate."""
    v = 0.0 if v is None else float(v)
    if not math.isfinite(v) or v < 0.0:
        v = 0.0
    if v > _SALVAGE_INT_CAP:
        v = _SALVAGE_INT_CAP
    return int(v)


def _salvage_coord(c) -> float:
    c = 0.0 if c is None else float(c)
    if not math.isfinite(c):
        c = 0.0
    return min(max(c, 0.0), _SALVAGE_COORD_CAP)


def twin_salvage(spans: list[tuple], offsets: list | None = None):
    """Best-effort repair of malformed span rows so extraction can be
    retried instead of quarantining the document: null strings → '',
    non-finite/out-of-range geometry zeroed/clamped, inverted rect corners
    swapped, confidence clipped to [0, 1], non-finite orientation → 0,
    page numbers (and ``offsets``, when given) made safe non-negative
    ints. Returns salvaged spans (and offsets when given)."""
    out = []
    for kind, text, media_ref, page, rect, conf, orient in spans:
        x0, y0, x1, y1 = (_salvage_coord(c) for c in rect)
        conf = 0.0 if conf is None else float(conf)
        if not math.isfinite(conf):
            conf = 0.0
        conf = min(max(conf, 0.0), 1.0)
        orient = 0.0 if orient is None else float(orient)
        if not math.isfinite(orient):
            orient = 0.0
        out.append(
            (
                "" if kind is None else kind,
                "" if text is None else text,
                "" if media_ref is None else media_ref,
                _salvage_nonneg_int(page),
                (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)),
                conf,
                orient,
            )
        )
    if offsets is None:
        return out
    return out, [_salvage_nonneg_int(v) for v in offsets]


def twin_extract(
    spans: list[tuple],
    aggressive: bool = False,
    build_lines_from_words: bool = False,
) -> list[tuple[str, str, str, int]]:
    """Extract one document; spans = [(kind, text, media_ref, page, rect4,
    conf, orient)] in array (draw) order. Returns the ordered output span
    sequence [(kind, text, media_ref, offset)] — the BASELINE.json
    span-sequence-equality contract."""
    if not spans:
        return []
    by_page: dict[int, list[Span]] = {}
    for pos, (kind, text, media_ref, page, rect, conf, orient) in enumerate(spans):
        by_page.setdefault(int(page), []).append(
            Span(pos, kind, text, media_ref, Rect(*rect), conf, orient)
        )
    out: list[tuple[str, str, str]] = []
    for page in sorted(by_page):
        page_spans = sorted(by_page[page], key=lambda s: s.pos)
        out.extend(_extract_page(page_spans, aggressive, build_lines_from_words))
    return [(k, t, m, i) for i, (k, t, m) in enumerate(out)]
