"""Aggressive old-OCR strip with visibility mask (C3).

Span-native reimplementation of ``clean_old_ocr_aggressive``
(/root/reference/ocr/preprocess/clean.py:57-120): a single forward sweep
over the page's draw operations in ``offset`` order. Visible ink (text,
vector paths) raises the mask; a later image lowers it and hides any text
rect it fully contains. An 'ocr-text' span is kept (treated as visible,
e.g. text drawn as fill-paths then made selectable) only when it overlaps
visible ink — tested with a 10%-shrunk rect and a 20% coverage allowance
(clean.py:79-90).

Returns the indices of spans to strip plus the visibility mask consumed by
the C6 suppression step. Order-sensitive and stateful by design — this is
the reason the spans carry a draw-order ``offset``.

Kind-mapping note: the single 'media' kind stands for BOTH of the
reference's raster ops, fill-image and fill-imgmask (classify.py mapping).
The reference's aggressive sweep lowers the mask / hides covered text only
on fill-image (clean.py:96), so when an input corpus distinguishes image
masks, a 'media' span that is really an imgmask slightly over-approximates
mask removal here. Split an 'imgmask' kind if the corpus model ever
carries the distinction.
"""

from __future__ import annotations

import numpy as np

from swissgeol_ocr_spark.operators.classify import KIND_MEDIA, KIND_OCR, KIND_PATH, KIND_TEXT
from swissgeol_ocr_spark.operators.mask import PageMask


def clean_old_ocr_aggressive(
    kinds: np.ndarray,
    rects: np.ndarray,
    page_width: float,
    page_height: float,
) -> tuple[list[int], PageMask]:
    """Single sweep (clean.py:65-104); returns (invisible span indices, mask)."""
    mask = PageMask(page_width, page_height)
    possibly_visible: dict[int, tuple[float, float, float, float]] = {}
    invisible: list[int] = []

    for i, (k, (x0, y0, x1, y1)) in enumerate(zip(kinds, rects)):
        if k == KIND_OCR:
            if not mask.intersects(x0, y0, x1, y1):
                invisible.append(i)
            else:
                w = x1 - x0
                h = y1 - y0
                shrunk = (x0 + 0.1 * w, y0 + 0.1 * h, x1 - 0.1 * w, y1 - 0.1 * h)
                cov = mask.coverage_ratio(*shrunk)
                # NaN (degenerate off-page shrunk rect) keeps the span, like
                # the reference (NaN < 0.2 is False).
                if cov < 0.2:
                    invisible.append(i)
        elif k in (KIND_TEXT, KIND_PATH) and not (x0 >= x1 or y0 >= y1):
            mask.add_rect(x0, y0, x1, y1)
            possibly_visible[i] = (x0, y0, x1, y1)
        elif k == KIND_MEDIA:
            covered = [
                j
                for j, (tx0, ty0, tx1, ty1) in possibly_visible.items()
                if x0 <= tx0 <= tx1 <= x1 and y0 <= ty0 <= ty1 <= y1
            ]
            for j in covered:
                invisible.append(j)
                del possibly_visible[j]
            mask.remove_rect(x0, y0, x1, y1)

    return sorted(invisible), mask
