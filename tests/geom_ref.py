"""TEST-ONLY reference-parity fixture library: axis-aligned rectangle
primitives matching the PyMuPDF semantics the reference engine relies on
(the production kernels carry their own inlined scalar folds — this module
exists so tests can express expected values in the reference's own
vocabulary).

The reference (swisstopo/swissgeol-ocr) does all of its geometry through
``pymupdf.Rect`` / ``pymupdf.Point``.  We reimplement only the handful of
behaviours it actually uses, in pure Python/numpy, so the kernels carry no
native-library dependency and stay Arrow-serializable:

* union / ``include_rect`` with empty-rect handling
  (reference use: ``ocr/util.py:20-29``, ``ocr/readingorder.py:96-101``)
* ``contains`` for rect-in-rect tests (``ocr/util.py:32``,
  ``ocr/preprocess/clean.py:99``)
* ``intersect`` + ``get_area`` for the cross-tile dedup 60% rule
  (``ocr/textract/textract.py:126-131``)
* strict-inequality overlap predicates ``x_overlap`` / ``fast_intersection``
  (``ocr/util.py:38-66``)

All scalars are float64 — the reference runs CPython floats, and the
reading-order comparisons (e.g. ``distance_after < 20``) must not change
outcome due to float32 rounding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class Rect:
    """Minimal pymupdf.Rect stand-in (top-down y axis, like PDF viewers)."""

    x0: float = 0.0
    y0: float = 0.0
    x1: float = 0.0
    y1: float = 0.0

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0

    @property
    def is_empty(self) -> bool:
        # pymupdf: a rect is empty when width or height is not positive.
        return self.x0 >= self.x1 or self.y0 >= self.y1

    def get_area(self) -> float:
        if self.is_empty:
            return 0.0
        return (self.x1 - self.x0) * (self.y1 - self.y0)

    def include_rect(self, other: "Rect") -> "Rect":
        """Union, with pymupdf's empty-rect handling: empty | r == r."""
        if other.is_empty:
            return Rect(self.x0, self.y0, self.x1, self.y1)
        if self.is_empty:
            return Rect(other.x0, other.y0, other.x1, other.y1)
        return Rect(
            min(self.x0, other.x0),
            min(self.y0, other.y0),
            max(self.x1, other.x1),
            max(self.y1, other.y1),
        )

    __or__ = include_rect

    def contains(self, other: "Rect") -> bool:
        """rect-in-rect containment, pymupdf ``__contains__`` semantics:
        ``self.x0 <= r.x0 <= r.x1 <= self.x1`` (same for y)."""
        return (
            self.x0 <= other.x0 <= other.x1 <= self.x1
            and self.y0 <= other.y0 <= other.y1 <= self.y1
        )

    def intersect(self, other: "Rect") -> "Rect":
        """Intersection; may come out 'empty' (inverted) when disjoint,
        in which case get_area() == 0 — exactly what the T6 dedup needs."""
        return Rect(
            max(self.x0, other.x0),
            max(self.y0, other.y0),
            min(self.x1, other.x1),
            min(self.y1, other.y1),
        )

    def as_tuple(self) -> tuple[float, float, float, float]:
        return (self.x0, self.y0, self.x1, self.y1)


def x_overlap(r1: Rect, r2: Rect) -> float:
    """Horizontal overlap length; 0 when not strictly overlapping.

    Mirrors ``ocr/util.py:38-51`` (strict ``<`` comparisons).
    """
    if (r1.x0 < r2.x1) and (r2.x0 < r1.x1):
        return min(r1.x1, r2.x1) - max(r1.x0, r2.x0)
    return 0.0


def fast_intersection(r1: Rect, r2: Rect) -> bool:
    """Non-empty open intersection test (``ocr/util.py:53-66``)."""
    return (
        (r1.x0 < r2.x1)
        and (r2.x0 < r1.x1)
        and (r1.y0 < r2.y1)
        and (r2.y0 < r1.y1)
    )


def distance(x0: float, y0: float, x1: float, y1: float) -> float:
    return math.hypot(x1 - x0, y1 - y0)
