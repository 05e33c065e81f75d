"""Reading-order resolution — the behavior-defining core of the engine.

A faithful, from-scratch reimplementation of the reference's greedy,
geometry-only text linearization (``/root/reference/ocr/readingorder.py``,
documented in ``/root/reference/docs/ReadingOrder.md``), rewritten over
numpy arrays so every inner scan is vectorized (the reference does
per-object Python; we do O(n) numpy per greedy step).

Semantics pinned against the reference (file:line cites):

* ``sort_key = x0 + 2*y0``                          readingorder.py:49-52
* ``needs_to_come_before`` — 3 disjunctive
  geometric conditions; deliberately NOT a
  partial order (cycles possible, must terminate)  readingorder.py:54-81
* ``distance_after`` — min of 3 corner distances    readingorder.py:83-87
* column tracking with 0.8/0.9/0.6 x-overlap
  thresholds + interruption + accurate-extender
  monotonicity                                      readingorder.py:90-163
* block-start fixpoint selection                    readingorder.py:166-175
* greedy next-line choice + push-back close         readingorder.py:178-223

Determinism note: the reference iterates Python ``set``s of objects, so
exact ties in its ``min(...)`` selections resolve by memory address
(nondeterministic). We resolve exact ties by lowest input index, which is
deterministic and agrees with the reference wherever the reference is
well-defined (all of its golden tests are tie-free).

Input: an (n, 4) float64 rect matrix. Output: blocks of input indices.
Complexity: O(n²) vectorized steps per page (reference: O(n²)–O(n³)
scalar); pages are bounded, documents parallelize across Spark tasks.
"""

from __future__ import annotations

import numpy as np

__all__ = ["sort_lines_indices", "needs_to_come_before", "sort_key"]


def sort_key(r: np.ndarray) -> np.ndarray:
    """Primary scan order: top-to-bottom dominant (readingorder.py:49-52)."""
    return r[:, 0] + 2.0 * r[:, 1]


def _mids(r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (r[:, 0] + r[:, 2]) / 2.0, (r[:, 1] + r[:, 3]) / 2.0


def needs_to_come_before(r: np.ndarray, xm: np.ndarray, ym: np.ndarray, j: int) -> np.ndarray:
    """Vectorized ``i needs_to_come_before j`` for all rows i.

    Mirrors readingorder.py:54-81: center-of-mass top-left, strictly-left
    with vertical overlap, strictly-above with horizontal overlap.
    """
    xmj, ymj = xm[j], ym[j]
    top_left = ((xm < xmj) & (ym <= ymj)) | ((xm <= xmj) & (ym < ymj))
    left = (xm < r[j, 0]) & ((ym < r[j, 3]) | (r[:, 1] < ymj))
    top = (ym < r[j, 1]) & ((xm < r[j, 2]) | (r[:, 0] < xmj))
    return top_left | left | top


def _needs_to_come_before_scalar(
    r: np.ndarray, xm: np.ndarray, ym: np.ndarray, i: int, js: np.ndarray
) -> np.ndarray:
    """``i needs_to_come_before j`` for a fixed i over an index array js."""
    xmi, ymi = xm[i], ym[i]
    top_left = ((xmi < xm[js]) & (ymi <= ym[js])) | ((xmi <= xm[js]) & (ymi < ym[js]))
    left = (xmi < r[js, 0]) & ((ymi < r[js, 3]) | (r[i, 1] < ym[js]))
    top = (ymi < r[js, 1]) & ((xmi < r[js, 2]) | (r[i, 0] < xm[js]))
    return top_left | left | top


def _distance_after(r: np.ndarray, xm: np.ndarray, idx: np.ndarray, j: int) -> np.ndarray:
    """min corner distance from each idx line's top edge to line j's bottom
    edge (readingorder.py:83-87): top-left→bottom-left, top-middle→
    bottom-middle, top-right→bottom-right."""
    dy = r[idx, 1] - r[j, 3]
    left = np.hypot(r[idx, 0] - r[j, 0], dy)
    middle = np.hypot(xm[idx] - xm[j], dy)
    right = np.hypot(r[idx, 2] - r[j, 2], dy)
    return np.minimum(np.minimum(left, middle), right)


class _Column:
    """ReadingOrderColumn (readingorder.py:90-124) on plain floats."""

    __slots__ = ("x0", "y0", "x1", "y1", "bottom_of_first_line", "top_of_last_line")

    def __init__(self, x0, y0, x1, y1, bottom_of_first_line, top_of_last_line):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.bottom_of_first_line = bottom_of_first_line
        self.top_of_last_line = top_of_last_line

    def add_line_before(self, lr: np.ndarray) -> "_Column":
        # rect union + the added (earlier) line's bottom becomes
        # bottom_of_first_line (readingorder.py:96-101)
        return _Column(
            min(self.x0, lr[0]),
            min(self.y0, lr[1]),
            max(self.x1, lr[2]),
            max(self.y1, lr[3]),
            lr[3],
            self.top_of_last_line,
        )

    def can_be_extended_by(
        self, r: np.ndarray, ym: np.ndarray, idx: np.ndarray
    ) -> np.ndarray:
        """Vectorized readingorder.py:107-117 over index array ``idx``."""
        rr = r[idx]
        width = rr[:, 2] - rr[:, 0]
        height = rr[:, 3] - rr[:, 1]
        col_h = self.y1 - self.y0
        col_w = self.x1 - self.x0
        ov = np.minimum(self.x1, rr[:, 2]) - np.maximum(self.x0, rr[:, 0])
        ov = np.where((self.x0 < rr[:, 2]) & (rr[:, 0] < self.x1), ov, 0.0)
        return (
            (ym[idx] > self.top_of_last_line)
            & (rr[:, 1] - self.y1 < (col_h + height))
            & ((ov > 0.8 * width) | (ov > 0.9 * col_w))
        )

    def is_accurately_extended_by(
        self, r: np.ndarray, ym: np.ndarray, idx: np.ndarray
    ) -> np.ndarray:
        """Vectorized readingorder.py:119-124."""
        rr = r[idx]
        width = rr[:, 2] - rr[:, 0]
        col_w = self.x1 - self.x0
        ov = np.minimum(self.x1, rr[:, 2]) - np.maximum(self.x0, rr[:, 0])
        ov = np.where((self.x0 < rr[:, 2]) & (rr[:, 0] < self.x1), ov, 0.0)
        return (
            self.can_be_extended_by(r, ym, idx)
            & (ov > 0.6 * np.maximum(col_w, width))
            & (self.y1 < rr[:, 3])
        )

    def is_interrupted_by_any(self, r: np.ndarray, ym: np.ndarray, idx: np.ndarray) -> bool:
        """Vectorized any(is_interrupted_by) (readingorder.py:103-105)."""
        rr = r[idx]
        inter = (
            (rr[:, 0] < self.x1)
            & (self.x0 < rr[:, 2])
            & (rr[:, 1] < self.y1)
            & (self.y0 < rr[:, 3])
        )
        within = (self.bottom_of_first_line < ym[idx]) & (ym[idx] < self.top_of_last_line)
        return bool(np.any(inter & within))


def _current_column(
    r: np.ndarray,
    ym: np.ndarray,
    current: int,
    preceding: list[int],
    n: int,
) -> _Column:
    """ReadingOrderColumn.current_column (readingorder.py:126-163).

    ``preceding`` = the current block minus its last line, in reading order.
    ``other`` starts as ALL page lines minus current (including lines already
    emitted in earlier blocks — faithful to the reference, which passes
    ``all_lines``), and preceding lines leave it as the column consumes them.
    """
    other = np.ones(n, dtype=bool)
    other[current] = False
    column = _Column(r[current, 0], r[current, 1], r[current, 2], r[current, 3],
                     r[current, 3], r[current, 1])
    idx = np.flatnonzero(other)
    accurate_count = int(np.count_nonzero(column.is_accurately_extended_by(r, ym, idx)))

    for li in reversed(preceding):
        new_column = column.add_line_before(r[li])
        other[li] = False
        idx = np.flatnonzero(other)

        if new_column.is_interrupted_by_any(r, ym, idx):
            break

        new_count = int(np.count_nonzero(new_column.is_accurately_extended_by(r, ym, idx)))
        if new_count < accurate_count:
            break
        accurate_count = new_count
        column = new_column

    return column


def _starting_line(r, xm, ym, keys, remaining: np.ndarray) -> int:
    """starting_line_for_next_block (readingorder.py:166-175): iterated
    min-by-sort-key restricted to must-precede predecessors (fixpoint)."""
    candidates = remaining.copy()
    selected = -1
    while candidates.any():
        idx = np.flatnonzero(candidates)
        selected = int(idx[np.argmin(keys[idx])])
        candidates[selected] = False
        must_precede = needs_to_come_before(r, xm, ym, selected)
        candidates &= must_precede
    return selected


def sort_lines_indices(rects: np.ndarray) -> list[list[int]]:
    """Linearize page lines into reading-order blocks of input indices.

    Faithful to ``sort_lines`` (readingorder.py:178-223) including the
    push-back block close at :216-218 that guarantees termination despite
    precedence cycles.
    """
    r = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    n = r.shape[0]
    if n == 0:
        return []
    xm, ym = _mids(r)
    keys = sort_key(r)

    remaining = np.ones(n, dtype=bool)
    blocks: list[list[int]] = []

    while remaining.any():
        current = _starting_line(r, xm, ym, keys, remaining)
        remaining[current] = False
        block = [current]

        while remaining.any():
            next_line = -1
            rem_idx = np.flatnonzero(remaining)

            # (i) lines that continue the current column (readingorder.py:193-202)
            column = _current_column(r, ym, current, block[:-1], n)
            in_col = rem_idx[column.can_be_extended_by(r, ym, rem_idx)]
            if in_col.size:
                highest = int(in_col[np.argmin(r[in_col, 1])])
                before_highest = _needs_before_set(r, xm, ym, in_col, highest)
                cand = np.append(before_highest, highest)
                next_line = int(cand[np.argmin(r[cand, 0])])

            # (ii) nearest direct continuation within 20pt (readingorder.py:204-208)
            if next_line < 0:
                dist = _distance_after(r, xm, rem_idx, current)
                following = rem_idx[dist < 20.0]
                if following.size:
                    next_line = int(following[np.argmin(r[following, 1])])

            if next_line < 0:
                break

            current = next_line
            remaining[current] = False

            # push-back close (readingorder.py:216-218): if anything still
            # remaining must precede the chosen line, restore it and close.
            rem_idx = np.flatnonzero(remaining)
            if rem_idx.size and bool(
                np.any(needs_to_come_before(r, xm, ym, current)[rem_idx])
            ):
                remaining[current] = True
                break

            block.append(current)

        blocks.append(block)

    return blocks


def _needs_before_set(r, xm, ym, idx: np.ndarray, j: int) -> np.ndarray:
    """Subset of ``idx`` whose lines need to come before line j."""
    mask = needs_to_come_before(r, xm, ym, j)[idx]
    return idx[mask]
