"""Page tiling (T1) and cross-tile line dedup (T6).

Reimplements the reference's overlapping-window page decomposition
(``/root/reference/ocr/textract/textract.py:98-117``, constant at :19) and
the asymmetric 60%-area-coverage merge of per-tile line detections
(``textract.py:120-131``).

Spark view: the tile generator is a deterministic per-page explode
(2-D sliding windows with overlap); the dedup is a fuzzy-geometric
union-distinct — a spatial self-join with a "first wins" order. Both run
inside the per-page kernel; pages are small, so O(tiles·lines²) is bounded.
"""

from __future__ import annotations

import numpy as np

MAX_DIMENSION_POINTS = 2000.0  # textract.py:19
OVERLAP = MAX_DIMENSION_POINTS // 5  # = 400, textract.py:102


def clip_rects(width: float, height: float) -> list[tuple[float, float, float, float]]:
    """Tiles covering a (0,0,width,height) page, full page first, then the
    2000×2000 grid with 400pt overlap, column-major, each intersected with
    the page (textract.py:98-117; pinned by tests/test_textract.py:7-28)."""
    main = (0.0, 0.0, float(width), float(height))
    if width <= MAX_DIMENSION_POINTS and height <= MAX_DIMENSION_POINTS:
        return [main]
    step = int(MAX_DIMENSION_POINTS - OVERLAP)
    x_starts = list(range(0, int(width - OVERLAP), step)) or [0]
    y_starts = list(range(0, int(height - OVERLAP), step)) or [0]
    tiles = [main]
    for x0 in x_starts:
        for y0 in y_starts:
            tiles.append(
                (
                    max(0.0, float(x0)),
                    max(0.0, float(y0)),
                    min(float(x0) + MAX_DIMENSION_POINTS, float(width)),
                    min(float(y0) + MAX_DIMENSION_POINTS, float(height)),
                )
            )
    return tiles


def combine_text_lines(
    rects1: np.ndarray, idx1: list[int], rects2: np.ndarray, idx2: list[int]
) -> tuple[np.ndarray, list[int]]:
    """Merge two detections: keep a line unless ≥60% of its area is covered
    by a kept line from the other list (textract.py:120-131, both
    directions: old-vs-new first, then new-vs-kept).

    ``rects*`` are (n,4) float64, ``idx*`` parallel payload indices.
    Returns the kept rects + payload indices, preserving order.
    """
    keep_r: list[np.ndarray] = []
    keep_i: list[int] = []
    for k in range(rects1.shape[0]):
        if _not_covered_in(rects1[k], rects2):
            keep_r.append(rects1[k])
            keep_i.append(idx1[k])
    kept1 = np.array(keep_r, dtype=np.float64).reshape(-1, 4)
    for k in range(rects2.shape[0]):
        if _not_covered_in(rects2[k], kept1):
            keep_r.append(rects2[k])
            keep_i.append(idx2[k])
    return np.array(keep_r, dtype=np.float64).reshape(-1, 4), keep_i


def _not_covered_in(rect: np.ndarray, others: np.ndarray) -> bool:
    """True when no rect in ``others`` covers >60% of ``rect``'s area
    (textract.py:126-131). Vectorized intersection-area computation."""
    if others.shape[0] == 0:
        return True
    ix0 = np.maximum(others[:, 0], rect[0])
    iy0 = np.maximum(others[:, 1], rect[1])
    ix1 = np.minimum(others[:, 2], rect[2])
    iy1 = np.minimum(others[:, 3], rect[3])
    w = ix1 - ix0
    h = iy1 - iy0
    area = np.where((w > 0) & (h > 0), w * h, 0.0)
    own = max((rect[2] - rect[0]) * (rect[3] - rect[1]), 0.0)
    return not bool((area > 0.6 * own).any())
