"""Text assembly (E1 ordering semantics) and word→line grouping.

The reference emits a hidden text layer (/root/reference/ocr/draw.py); we
emit the ordered span sequence instead, but E1's *ordering and joining
rules* define how text is assembled:

* words on a line render left-to-right with an explicit space iff the next
  word starts strictly right of the current word's end
  (``next.x0 > cur.x1`` — draw.py:34-39, the OCRmyPDF trick)
* a word whose vertical middle falls outside the line's padded band gets
  its own vertical placement (draw.py:26-32) — i.e. it doesn't really
  belong to the line; our line builder uses the same band test to group
  word spans into lines in the first place
* block text is the space-join of its lines (readingorder.py:19-20)

``lines_from_words`` is the "from-scratch layout detection" step replacing
Textract: word spans with boxes are grouped into text lines by vertical
band overlap and ordered by x.
"""

from __future__ import annotations

import numpy as np


def join_words(texts: list[str], rects: np.ndarray) -> str:
    """Join a line's words left-to-right; explicit space iff the next word
    starts strictly right of this word's end (draw.py:34-39)."""
    order = np.argsort(rects[:, 0], kind="stable")
    parts: list[str] = []
    for pos, i in enumerate(order):
        parts.append(texts[i])
        if pos + 1 < len(order):
            nxt = order[pos + 1]
            if rects[nxt, 0] > rects[i, 2]:
                parts.append(" ")
    return "".join(parts)


def lines_from_words(
    texts: list[str], rects: np.ndarray
) -> list[tuple[str, tuple[float, float, float, float], list[int]]]:
    """Group word spans into text lines.

    Two words share a line when each word's vertical middle lies inside the
    other's vertical extent (mutual band overlap — the same test draw.py:27
    uses to detect words that do NOT belong to a line). Greedy left-to-right
    scan in (y, x) order; O(n·lines) per page.

    Returns [(line_text, line_rect, word_indices)] ordered top-down.
    """
    n = len(texts)
    if n == 0:
        return []
    rects = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    ym = (rects[:, 1] + rects[:, 3]) / 2.0
    order = np.lexsort((rects[:, 0], rects[:, 1]))
    lines: list[list[int]] = []
    bands: list[tuple[float, float]] = []  # evolving (y0, y1) per line
    for i in order:
        placed = False
        for li in range(len(lines) - 1, -1, -1):
            b0, b1 = bands[li]
            band_mid = (b0 + b1) / 2.0
            if b0 < ym[i] < b1 and rects[i, 1] < band_mid < rects[i, 3]:
                lines[li].append(int(i))
                bands[li] = (min(b0, rects[i, 1]), max(b1, rects[i, 3]))
                placed = True
                break
        if not placed:
            lines.append([int(i)])
            bands.append((float(rects[i, 1]), float(rects[i, 3])))

    out = []
    for word_idx in lines:
        wr = rects[word_idx]
        line_rect = (
            float(wr[:, 0].min()),
            float(wr[:, 1].min()),
            float(wr[:, 2].max()),
            float(wr[:, 3].max()),
        )
        text = join_words([texts[i] for i in word_idx], wr)
        out.append((text, line_rect, word_idx))
    return out


def block_text(line_texts: list[str]) -> str:
    """Space-join of a reading-order block's lines (readingorder.py:19-20)."""
    return " ".join(line_texts)
