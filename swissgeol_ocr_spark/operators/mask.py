"""Dense page raster mask (C4) — the spatial keep-out predicate.

Reimplements ``/root/reference/ocr/mask.py:4-23`` exactly, including the
load-bearing integer rounding of rect corners (round() to nearest, with
the +1 inclusive upper bound on slices): where visible text already
exists, new OCR lines are suppressed (C6, ``ocr/applyocr.py:109``).

The raster is materialized per page *inside* the Arrow UDF and never
shuffled — it is a transient O(w·h) index giving O(1) rect-coverage
queries.

Quirk preserved for parity: a negative coordinate indexes from the page's
far edge (numpy slice semantics) — the reference's numpy mask behaves
identically (mask.py:9-10), so this is NOT "fixed" here. Corrupt rows
never reach it un-normalized: the salvage pass clamps repaired
coordinates to [0, 1e6] and the oversized-page guard bounds allocation
(operators/extract.py).
"""

from __future__ import annotations

import numpy as np


class PageMask:
    def __init__(self, width: float, height: float):
        # mask.py:5-7 — dimensions rounded to nearest integer
        self.mask = np.zeros((round(width), round(height)), dtype=np.uint8)
        # fast-path flag: a mask that has never had a rect added cannot
        # intersect anything (exact short-circuit — the non-aggressive C2
        # path allocates an all-zeros mask and queries it once per kept
        # line, which profiled at ~7% of the whole kernel)
        self._maybe_set = False

    def _sub(self, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
        # mask.py:9-10 — round() corners, +1 inclusive upper bound
        return self.mask[round(x0) : round(x1) + 1, round(y0) : round(y1) + 1]

    def add_rect(self, x0, y0, x1, y1) -> None:
        self._sub(x0, y0, x1, y1).fill(1)
        self._maybe_set = True

    def remove_rect(self, x0, y0, x1, y1) -> None:
        # _maybe_set stays conservatively True: the flag only ever
        # short-circuits the provably-all-zeros case
        self._sub(x0, y0, x1, y1).fill(0)

    def intersects(self, x0, y0, x1, y1) -> bool:
        if not self._maybe_set:
            return False
        return bool(np.any(self._sub(x0, y0, x1, y1)))

    def coverage_ratio(self, x0, y0, x1, y1) -> float:
        sub = self._sub(x0, y0, x1, y1)
        if sub.size == 0:
            # np.sum/np.size of an empty slice would divide 0/0 → nan in the
            # reference; only reachable for degenerate rects outside the page.
            return float("nan")
        return float(np.sum(sub)) / float(sub.size)
