"""Property-based tests (hypothesis) for the equality-defining kernels.

The reference consumes *sets* of lines (readingorder.py:179) and must
terminate despite precedence cycles — these properties hold for arbitrary
geometry, not just the golden layouts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from swissgeol_ocr_spark.operators.assemble import lines_from_words
from swissgeol_ocr_spark.operators.readingorder import sort_lines_indices
from swissgeol_ocr_spark.operators.tiling import combine_text_lines

rect_strategy = st.tuples(
    st.floats(0, 500, allow_nan=False, width=32),
    st.floats(0, 700, allow_nan=False, width=32),
    st.floats(1, 300, allow_nan=False, width=32),
    st.floats(1, 30, allow_nan=False, width=32),
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


@settings(max_examples=60, deadline=None)
@given(st.lists(rect_strategy, min_size=0, max_size=30))
def test_sort_lines_total_and_unique(rects):
    """Every line emitted exactly once, for any geometry (termination +
    completeness, reference test_readingorder_lines.py:53-60 generalized)."""
    blocks = sort_lines_indices(np.array(rects, dtype=np.float64).reshape(-1, 4))
    emitted = sorted(i for b in blocks for i in b)
    assert emitted == list(range(len(rects)))


@settings(max_examples=30, deadline=None)
@given(st.lists(rect_strategy, min_size=2, max_size=15), st.randoms())
def test_sort_lines_permutation_invariant_modulo_ties(rects, rnd):
    """Input order must not change the linearization when every selector
    coordinate is tie-free (the reference consumes a set and resolves exact
    ties by set iteration order — nondeterministic even for itself — so
    restrict to inputs where min-by-sort-key, min-by-y0 and min-by-x0 are
    all unambiguous; our deterministic tie-break is input index)."""
    n = len(rects)
    keys = {round(r[0] + 2 * r[1], 9) for r in rects}
    x0s = {round(r[0], 9) for r in rects}
    y0s = {round(r[1], 9) for r in rects}
    if len(keys) != n or len(x0s) != n or len(y0s) != n:
        return  # exact selector ties → reference itself is nondeterministic
    arr = np.array(rects, dtype=np.float64)
    base = [tuple(arr[i] for i in b) for b in sort_lines_indices(arr)]
    perm = list(range(len(rects)))
    rnd.shuffle(perm)
    arr2 = arr[perm]
    shuffled = [tuple(arr2[i] for i in b) for b in sort_lines_indices(arr2)]
    base_flat = [tuple(r) for b in base for r in b]
    shuf_flat = [tuple(r) for b in shuffled for r in b]
    assert base_flat == shuf_flat


@settings(max_examples=60, deadline=None)
@given(st.lists(rect_strategy, min_size=0, max_size=20),
       st.lists(rect_strategy, min_size=0, max_size=20))
def test_combine_idempotent_union(r1, r2):
    """T6 merge invariants: output payloads ⊆ inputs, no duplicates, and
    merging a result with itself keeps exactly the same payload set."""
    a = np.array(r1, dtype=np.float64).reshape(-1, 4)
    b = np.array(r2, dtype=np.float64).reshape(-1, 4)
    rects, idx = combine_text_lines(a, list(range(len(r1))), b,
                                    [len(r1) + i for i in range(len(r2))])
    assert len(idx) == len(set(idx))
    assert set(idx) <= set(range(len(r1) + len(r2)))
    rects2, idx2 = combine_text_lines(rects, idx, rects.copy(), list(idx))
    assert set(idx2) == set(idx)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcxyz", min_size=1, max_size=5),
                          rect_strategy), min_size=0, max_size=25))
def test_lines_from_words_partition(items):
    """Word→line grouping is a partition: every word lands in exactly one
    line, and each line's rect covers its words."""
    texts = [t for t, _ in items]
    rects = np.array([r for _, r in items], dtype=np.float64).reshape(-1, 4)
    lines = lines_from_words(texts, rects)
    seen = sorted(i for _, _, widx in lines for i in widx)
    assert seen == list(range(len(items)))
    for _, (lx0, ly0, lx1, ly1), widx in lines:
        for i in widx:
            x0, y0, x1, y1 = rects[i]
            assert lx0 <= x0 and ly0 <= y0 and lx1 >= x1 and ly1 >= y1
