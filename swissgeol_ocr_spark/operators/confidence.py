"""Two-tier confidence filter (C5) + mask suppression (C6).

Reimplements the per-block filter of /root/reference/ocr/applyocr.py:94-112:
per reading-order block, ``avg = mean(line confidences)``; a low-confidence
block (e.g. handwritten) only keeps very confident lines
(``thr = (1+T)/2``), a good block keeps anything not too far below its own
average (``thr = avg/2``). A line is also dropped when it intersects
still-visible text on the page mask (applyocr.py:109, C6).

This operator is SQL-expressible (window avg + CASE + filter) and is also
exposed relationally in the driver contract; here it is the in-kernel form
applied to the reading-order blocks.
"""

from __future__ import annotations

import numpy as np

from swissgeol_ocr_spark.operators.mask import PageMask


def filter_blocks(
    blocks: list[list[int]],
    confidences: np.ndarray,
    rects: np.ndarray,
    mask: PageMask | None,
    confidence_threshold: float,
) -> list[int]:
    """Kept line indices, in block order then intra-block reading order."""
    kept: list[int] = []
    for block in blocks:
        if not block:
            continue
        conf = confidences[block]
        avg = float(np.mean(conf))
        if avg < confidence_threshold:
            thr = (1.0 + confidence_threshold) / 2.0
        else:
            thr = avg / 2.0
        for i in block:
            x0, y0, x1, y1 = rects[i]
            if mask is not None and mask.intersects(x0, y0, x1, y1):
                continue
            if confidences[i] > thr:
                kept.append(i)
    return kept
