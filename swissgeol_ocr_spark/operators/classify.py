"""Page classification (C1) and conservative old-OCR detection (C2).

Span-native reimplementations of the reference's bboxlog folds:

* ``is_digitally_born``  — /root/reference/ocr/util.py:4-35
* ``find_old_ocr_spans`` — /root/reference/ocr/preprocess/clean.py:7-42

Span kinds map onto the reference's bboxlog box types:

    'text'     ↔ fill-text / stroke-text   (visible text draw)
    'path'     ↔ fill-path                 (vector ink)
    'media'    ↔ fill-image / fill-imgmask (raster content)
    'ocr-text' ↔ ignore-text               (invisible/hidden OCR layer)

Both are order-sensitive folds over the page's spans in ``offset`` order —
exactly what the spans array gives us. They run per page inside the Arrow
kernel; no Spark shuffle is involved.
"""

from __future__ import annotations

import numpy as np

# integer kind codes used throughout the kernels; unknown kind strings map
# to KIND_OTHER, which no kernel matches — exactly how the reference
# tolerates and ignores unknown bboxlog/block types
# (tests/test_textract.py:146-152)
KIND_TEXT = 0
KIND_PATH = 1
KIND_MEDIA = 2
KIND_OCR = 3
KIND_OTHER = 4

KIND_CODES = {"text": KIND_TEXT, "path": KIND_PATH, "media": KIND_MEDIA, "ocr-text": KIND_OCR}
KIND_NAMES = {v: k for k, v in KIND_CODES.items()}


def encode_kinds(kinds: "list[str]") -> np.ndarray:
    return np.array([KIND_CODES.get(k, KIND_OTHER) for k in kinds], dtype=np.int8)


def is_digitally_born(kinds: np.ndarray, rects: np.ndarray) -> bool:
    """A page is digitally born iff it has visible text not all covered by a
    single image, or no image at all (util.py:4-35).

    Fold in draw (offset) order: visible text grows the union and resets the
    covered flag; an image containing the whole union sets it. Empty text
    rects are ignored (util.py:26-27). Scalar fold — no Rect objects; the
    pymupdf empty-union quirk (Rect() == (0,0,0,0), contained iff the image
    covers the origin) is preserved exactly.
    """
    ux0 = uy0 = ux1 = uy1 = 0.0  # pymupdf.Rect() — the empty union
    have_text = False
    all_text_covered = False
    has_image = False
    rl = rects.tolist()
    for i, k in enumerate(kinds.tolist()):
        if k == KIND_TEXT:
            x0, y0, x1, y1 = rl[i]
            if x0 < x1 and y0 < y1:  # non-empty
                all_text_covered = False
                if have_text:
                    if x0 < ux0: ux0 = x0
                    if y0 < uy0: uy0 = y0
                    if x1 > ux1: ux1 = x1
                    if y1 > uy1: uy1 = y1
                else:
                    ux0, uy0, ux1, uy1 = x0, y0, x1, y1
                    have_text = True
        elif k == KIND_MEDIA:
            has_image = True
            x0, y0, x1, y1 = rl[i]
            if x0 <= ux0 <= ux1 <= x1 and y0 <= uy0 <= uy1 <= y1:
                all_text_covered = True
    union_empty = not have_text
    return not (has_image and (union_empty or all_text_covered))


def find_old_ocr_spans(kinds: np.ndarray, rects: np.ndarray) -> list[int]:
    """Indices of spans to strip as stale OCR (clean.py:7-42).

    Always the 'ocr-text' (ignore-text) spans; additionally the visible
    text spans when they are all covered by a single image (the
    Tiefenbrunnen/Lostorf pattern, clean.py:17-19).
    """
    ignore_idx: list[int] = []
    visible_idx: list[int] = []
    ux0 = uy0 = ux1 = uy1 = 0.0
    have_text = False
    all_text_covered = False
    rl = rects.tolist()
    for i, k in enumerate(kinds.tolist()):
        if k == KIND_TEXT:
            x0, y0, x1, y1 = rl[i]
            if x0 < x1 and y0 < y1:
                all_text_covered = False
                if have_text:
                    if x0 < ux0: ux0 = x0
                    if y0 < uy0: uy0 = y0
                    if x1 > ux1: ux1 = x1
                    if y1 > uy1: uy1 = y1
                else:
                    ux0, uy0, ux1, uy1 = x0, y0, x1, y1
                    have_text = True
                visible_idx.append(i)
        elif k == KIND_MEDIA:
            x0, y0, x1, y1 = rl[i]
            if x0 <= ux0 <= ux1 <= x1 and y0 <= uy0 <= uy1 <= y1:
                all_text_covered = True
        elif k == KIND_OCR:
            ignore_idx.append(i)
    if all_text_covered:
        return visible_idx + ignore_idx
    return ignore_idx
