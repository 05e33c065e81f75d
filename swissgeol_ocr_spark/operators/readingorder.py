"""Reading-order resolution — the behavior-defining core of the engine.

A faithful, from-scratch reimplementation of the reference's greedy,
geometry-only text linearization (``/root/reference/ocr/readingorder.py``,
documented in ``/root/reference/docs/ReadingOrder.md``), rewritten over
numpy struct-of-arrays so every inner scan is one fused vectorized pass
(the reference does per-object Python; we do O(n) numpy per greedy step,
with the three column predicates — can-extend / accurately-extends /
is-interrupted — sharing a single overlap computation).

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
Complexity: O(n²) fused-vector steps per page (reference: O(n²)–O(n³)
scalar); pages are bounded, documents parallelize across Spark tasks.
"""

from __future__ import annotations

import numpy as np

try:  # native twin, built on first import; None → numpy path
    from swissgeol_ocr_spark.operators._native import (
        native_sort_lines as _native_sort_lines,
    )
except Exception:  # pragma: no cover — loader itself already degrades
    _native_sort_lines = None

__all__ = ["sort_lines_indices", "needs_to_come_before", "sort_key"]

_INF = np.inf


def sort_key(r: np.ndarray) -> np.ndarray:
    """Primary scan order: top-to-bottom dominant (readingorder.py:49-52)."""
    return r[:, 0] + 2.0 * r[:, 1]


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


class _Page:
    """Struct-of-arrays page state shared by every predicate evaluation.

    Carries preallocated scratch buffers reused by every fused predicate
    pass: the greedy loop evaluates O(n²) tiny vector expressions, and heap
    allocation of temporaries — not FLOPs — dominates and destroys
    multi-process scaling (allocator contention across executor workers).
    Every ufunc below writes into these buffers via ``out=``.
    """

    __slots__ = (
        "r", "x0", "y0", "x1", "y1", "xm", "ym", "w", "h", "keys", "n",
        "ov", "f1", "f2", "fm", "b1", "b2", "b3", "can", "acc", "intr",
        "ntb", "other",
    )

    def __init__(self, r: np.ndarray):
        self.r = r
        self.x0 = np.ascontiguousarray(r[:, 0])
        self.y0 = np.ascontiguousarray(r[:, 1])
        self.x1 = np.ascontiguousarray(r[:, 2])
        self.y1 = np.ascontiguousarray(r[:, 3])
        self.xm = (self.x0 + self.x1) / 2.0
        self.ym = (self.y0 + self.y1) / 2.0
        self.w = self.x1 - self.x0
        self.h = self.y1 - self.y0
        self.keys = self.x0 + 2.0 * self.y0
        n = r.shape[0]
        self.n = n
        self.ov = np.empty(n)
        self.f1 = np.empty(n)
        self.f2 = np.empty(n)
        self.fm = np.empty(n)
        self.other = np.empty(n, dtype=bool)
        self.b1 = np.empty(n, dtype=bool)
        self.b2 = np.empty(n, dtype=bool)
        self.b3 = np.empty(n, dtype=bool)
        self.can = np.empty(n, dtype=bool)
        self.acc = np.empty(n, dtype=bool)
        self.intr = np.empty(n, dtype=bool)
        self.ntb = np.empty(n, dtype=bool)

    def masked_argmin(self, vals: np.ndarray, mask: np.ndarray) -> int:
        """argmin of ``vals`` over ``mask`` (lowest index on ties), -1 when
        the mask is empty — allocation-free via the ``fm`` scratch."""
        fm = self.fm
        fm.fill(_INF)
        np.copyto(fm, vals, where=mask)
        j = int(fm.argmin())
        return j if fm[j] != _INF else -1

    def needs_to_come_before(self, j: int) -> np.ndarray:
        """Fused, allocation-free ``i needs_to_come_before j`` for all i
        (readingorder.py:54-81); result lives in the ``ntb`` buffer."""
        x0, y0, xm, ym = self.x0, self.y0, self.xm, self.ym
        xmj, ymj = xm[j], ym[j]
        ntb, b1, b2, b3 = self.ntb, self.b1, self.b2, self.b3
        # top_left: (xm<xmj & ym<=ymj) | (xm<=xmj & ym<ymj)
        np.less(xm, xmj, out=ntb)
        np.less_equal(ym, ymj, out=b1)
        ntb &= b1
        np.less_equal(xm, xmj, out=b2)
        np.less(ym, ymj, out=b3)
        b2 &= b3
        ntb |= b2
        # left: xm < r[j].x0 & (ym < r[j].y1 | y0 < ymj)
        np.less(ym, self.y1[j], out=b1)
        np.less(y0, ymj, out=b2)
        b1 |= b2
        np.less(xm, self.x0[j], out=b3)
        b1 &= b3
        ntb |= b1
        # top: ym < r[j].y0 & (xm < r[j].x1 | x0 < xmj)
        np.less(xm, self.x1[j], out=b1)
        np.less(x0, xmj, out=b2)
        b1 |= b2
        np.less(ym, self.y0[j], out=b3)
        b1 &= b3
        ntb |= b1
        return ntb


def _column_masks(
    p: _Page,
    cx0: float, cy0: float, cx1: float, cy1: float,
    bofl: float, toll: float,
    want_interrupt: bool,
):
    """One fused, allocation-free pass computing, for every page line:

    * can   — ReadingOrderColumn.can_be_extended_by (readingorder.py:107-117)
    * acc   — is_accurately_extended_by (readingorder.py:119-124)
    * intr  — is_interrupted_by (readingorder.py:103-105), optional

    The three share the x-overlap computation the reference evaluates
    independently per predicate per line. Results live in the page's
    ``can``/``acc``/``intr`` scratch buffers (consumed before the next call).
    """
    ov, f1, f2 = p.ov, p.f1, p.f2
    can, acc, intr, b1, b2 = p.can, p.acc, p.intr, p.b1, p.b2
    # x_overlap: min(cx1, x1) - max(cx0, x0), clamped at 0 (ov>0 ⇔ strict overlap)
    np.minimum(cx1, p.x1, out=ov)
    np.maximum(cx0, p.x0, out=f1)
    ov -= f1
    np.maximum(ov, 0.0, out=ov)
    col_w = cx1 - cx0
    col_h = cy1 - cy0
    # can: ym > toll  &  y0 - cy1 < col_h + h  &  (ov > .8w | ov > .9col_w)
    np.multiply(p.w, 0.8, out=f1)
    np.less(f1, ov, out=can)
    np.less(col_w * 0.9, ov, out=b1)
    can |= b1
    np.greater(p.ym, toll, out=b1)
    can &= b1
    # y0 - cy1 < col_h + h, kept in the reference's exact expression shape
    # (readingorder.py:110) — float rounding must not flip the comparison
    np.subtract(p.y0, cy1, out=f2)
    np.add(p.h, col_h, out=f1)
    np.less(f2, f1, out=b2)
    can &= b2
    # acc: can & ov > .6*max(col_w, w) & cy1 < y1
    np.maximum(p.w, col_w, out=f1)
    f1 *= 0.6
    np.less(f1, ov, out=acc)
    acc &= can
    np.less(cy1, p.y1, out=b1)
    acc &= b1
    if not want_interrupt:
        return can, acc, None
    # intr: fast_intersection(rect, col) & bofl < ym < toll
    np.less(p.x0, cx1, out=intr)
    np.less(cx0, p.x1, out=b1)
    intr &= b1
    np.less(p.y0, cy1, out=b1)
    intr &= b1
    np.less(cy0, p.y1, out=b1)
    intr &= b1
    np.greater(p.ym, bofl, out=b1)
    intr &= b1
    np.less(p.ym, toll, out=b1)
    intr &= b1
    return can, acc, intr


def _current_column(
    p: _Page, current: int, preceding: list[int]
) -> tuple[float, float, float, float, float, float]:
    """ReadingOrderColumn.current_column (readingorder.py:126-163).

    ``preceding`` = the current block minus its last line, in reading order.
    ``other`` starts as ALL page lines minus current (including lines already
    emitted in earlier blocks — faithful to the reference, which passes
    ``all_lines``), and preceding lines leave it as the column consumes them.

    Returns (x0, y0, x1, y1, bottom_of_first_line, top_of_last_line).

    The walk over reversed(preceding) is evaluated as ONE (K×n) matrix pass:
    prefix column rects are cumulative min/max, the shrinking ``other`` set
    is a step-index comparison, and the accept/break scan happens on the
    precomputed per-step interruption flags and accurate-extender counts —
    identical comparisons to the reference's sequential walk, K× fewer
    ufunc dispatches.
    """
    cx0, cy0, cx1, cy1 = p.x0[current], p.y0[current], p.x1[current], p.y1[current]
    bofl, toll = p.y1[current], p.y0[current]
    if not preceding:
        # the walk has nothing to consume; the initial accurate-extender
        # count is only ever used for comparisons inside the walk
        return cx0, cy0, cx1, cy1, bofl, toll

    other = p.other
    other.fill(True)
    other[current] = False

    _, acc, _ = _column_masks(p, cx0, cy0, cx1, cy1, bofl, toll, False)
    acc &= other
    acc_init = int(np.count_nonzero(acc))

    walk = np.array(list(reversed(preceding)), dtype=np.int64)
    K = walk.shape[0]
    # prefix column rects after adding walk[0..k] (add_line_before,
    # readingorder.py:96-101): running union + the added line's bottom
    colx0 = np.minimum.accumulate(np.minimum(cx0, p.x0[walk]))
    coly0 = np.minimum.accumulate(np.minimum(cy0, p.y0[walk]))
    colx1 = np.maximum.accumulate(np.maximum(cx1, p.x1[walk]))
    coly1 = np.maximum.accumulate(np.maximum(cy1, p.y1[walk]))
    bofls = p.y1[walk]

    # other_k excludes current and walk[0..k]: walk[m] leaves at step m
    leave_step = np.full(p.n, K, dtype=np.int64)
    leave_step[walk] = np.arange(K)
    leave_step[current] = -1
    other_kn = leave_step[None, :] > np.arange(K)[:, None]  # (K, n)

    c0, c1 = colx0[:, None], colx1[:, None]
    r0, r1 = coly0[:, None], coly1[:, None]
    bf = bofls[:, None]
    x0n, y0n, x1n, y1n = p.x0[None, :], p.y0[None, :], p.x1[None, :], p.y1[None, :]
    ymn, wn, hn = p.ym[None, :], p.w[None, :], p.h[None, :]

    # x_overlap per (step, line)
    ov = np.minimum(c1, x1n) - np.maximum(c0, x0n)
    np.maximum(ov, 0.0, out=ov)
    col_w = c1 - c0
    col_h = r1 - r0
    # can_be_extended_by (readingorder.py:107-117)
    can = (
        (ymn > toll)
        & ((y0n - r1) < (col_h + hn))
        & ((ov > 0.8 * wn) | (ov > 0.9 * col_w))
    )
    # is_accurately_extended_by (readingorder.py:119-124)
    acc_kn = can & (ov > 0.6 * np.maximum(col_w, wn)) & (r1 < y1n)
    acc_kn &= other_kn
    acc_counts = acc_kn.sum(axis=1)
    # is_interrupted_by (readingorder.py:103-105)
    intr_kn = (
        (x0n < c1) & (c0 < x1n) & (y0n < r1) & (r0 < y1n)
        & (bf < ymn) & (ymn < toll)
    )
    intr_kn &= other_kn
    intr_any = intr_kn.any(axis=1)

    prev_counts = np.empty(K, dtype=acc_counts.dtype)
    prev_counts[0] = acc_init
    prev_counts[1:] = acc_counts[:-1]
    violation = intr_any | (acc_counts < prev_counts)
    b = int(np.argmax(violation)) if bool(violation.any()) else K

    if b == 0:
        return cx0, cy0, cx1, cy1, bofl, toll
    k = b - 1
    return (
        float(colx0[k]), float(coly0[k]), float(colx1[k]), float(coly1[k]),
        float(bofls[k]), toll,
    )


def _starting_line(p: _Page, remaining: np.ndarray) -> int:
    """starting_line_for_next_block (readingorder.py:166-175): iterated
    min-by-sort-key restricted to must-precede predecessors (fixpoint)."""
    candidates = remaining.copy()
    selected = -1
    while True:
        sel = p.masked_argmin(p.keys, candidates)
        if sel < 0:
            break
        selected = sel
        candidates[selected] = False
        candidates &= p.needs_to_come_before(selected)
        if not candidates.any():
            return selected
    return selected


def sort_lines_indices(rects: np.ndarray) -> list[list[int]]:
    """Linearize page lines into reading-order blocks of input indices.

    Faithful to ``sort_lines`` (readingorder.py:178-223) including the
    push-back block close at :216-218 that guarantees termination despite
    precedence cycles.

    Dispatches to the native C twin (operators/_readingorder.c via
    operators/_native.py) when it built successfully: the greedy loop is
    O(n²) TINY vector predicates per page, and at 8-40 lines/page numpy's
    per-ufunc dispatch cost — not FLOPs — dominated the whole extraction
    kernel (profiled ~70% of ms/doc; native cut words-path extraction
    ~2.5×). The C file transcribes the numpy expressions shape-for-shape
    and is built with FP contraction off, so the outputs are
    bit-identical — pinned by test_native_matches_numpy_random plus the
    golden/twin suites. Any build/load failure falls back to the numpy
    path below; SPARK_GRAFT_NO_NATIVE=1 forces the fallback.
    """
    r = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    # NaN geometry stays on the numpy path: numpy's minimum/maximum
    # PROPAGATE NaN where C's ternary comparisons select an operand, so
    # bit-parity is only contracted for finite rects (all real inputs —
    # the salvage pass clamps repaired geometry and the corpus is finite
    # by construction; this guard makes the contract airtight instead of
    # probabilistic). One vectorized check per page.
    if _native_sort_lines is not None and r.size and not np.isnan(r).any():
        res = _native_sort_lines(r)
        if res is not None:
            return res
    p = _Page(r)
    n = p.n
    if n == 0:
        return []

    remaining = np.ones(n, dtype=bool)
    n_remaining = n
    blocks: list[list[int]] = []

    while n_remaining:
        current = _starting_line(p, remaining)
        remaining[current] = False
        n_remaining -= 1
        block = [current]

        while n_remaining:
            next_line = -1

            # (i) lines that continue the current column (readingorder.py:193-202)
            cx0, cy0, cx1, cy1, bofl, toll = _current_column(p, current, block[:-1])
            can, _, _ = _column_masks(p, cx0, cy0, cx1, cy1, bofl, toll, False)
            can &= remaining  # can buffer free until the next _column_masks
            highest = p.masked_argmin(p.y0, can)
            if highest >= 0:
                cand = p.needs_to_come_before(highest)
                cand &= can
                cand[highest] = True
                next_line = p.masked_argmin(p.x0, cand)

            # (ii) nearest direct continuation within 20pt (readingorder.py:204-208)
            # distance_after = min corner distance, top edge → current bottom
            if next_line < 0:
                ov, f1, f2, b1 = p.ov, p.f1, p.f2, p.b1
                np.subtract(p.y0, p.y1[current], out=f1)  # dy
                np.subtract(p.x0, p.x0[current], out=f2)
                np.hypot(f2, f1, out=ov)
                np.subtract(p.xm, p.xm[current], out=f2)
                np.hypot(f2, f1, out=f2)
                np.minimum(ov, f2, out=ov)
                np.subtract(p.x1, p.x1[current], out=f2)
                np.hypot(f2, f1, out=f2)
                np.minimum(ov, f2, out=ov)
                np.less(ov, 20.0, out=b1)
                b1 &= remaining
                next_line = p.masked_argmin(p.y0, b1)

            if next_line < 0:
                break

            current = next_line
            remaining[current] = False
            n_remaining -= 1

            # push-back close (readingorder.py:216-218): if anything still
            # remaining must precede the chosen line, restore it and close.
            if n_remaining:
                ntb = p.needs_to_come_before(current)
                ntb &= remaining
                if ntb.any():
                    remaining[current] = True
                    n_remaining += 1
                    break

            block.append(current)

        blocks.append(block)

    return blocks
