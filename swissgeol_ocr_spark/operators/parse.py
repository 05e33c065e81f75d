"""Detection-response parsing (S7): flat block graph → typed line records.

The reference validates raw OCR JSON into a block graph and resolves it
into a Document→Page→Line→Word tree
(/root/reference/ocr/textract/textract_schema.py:88-118), then builds the
enriched per-line records via coordinate transform + derotation
(/root/reference/ocr/textline.py:29-57). This module reproduces that
resolution from plain dicts — no pydantic, no network — so raw detection
JSON (e.g. a landed Textract response table) can be ingested into the
spans model with `from_json` + this kernel.

Semantics pinned by tests/test_parse.py against the reference's own
golden response fixture (tests/test_textract.py:31-152): coordinate
transform, confidence/100 rescale, rotation from the first word's polygon
edge (on the raw normalized points, textline.py:41-42), derotation with
the 25° snap, unknown block types ignored.

Divergence note: a LINE block with no WORD children yields a literal ``[]``
element inside the reference's line list (textline.py:37-38 returns []
from a list comprehension context) — an inert artifact; we drop such
lines instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from swissgeol_ocr_spark.operators.derotate import derotate_quad, rotation_degrees


@dataclass
class ParsedWord:
    text: str
    derotated_rect: tuple[float, float, float, float]
    orientation: float


@dataclass
class ParsedLine:
    text: str
    orientation: float
    derotated_rect: tuple[float, float, float, float]
    rect: tuple[float, float, float, float]
    confidence: float
    words: list[ParsedWord]


def _scale_point(p: dict, sx: float, sy: float, tx: float, ty: float):
    return (p["X"] * sx + tx, p["Y"] * sy + ty)


def _derotate_block(block: dict, rotate: float, sx, sy, tx, ty, page_height: float):
    pts = block["Geometry"]["Polygon"]
    quad = [_scale_point(p, sx, sy, tx, ty) for p in (pts[0], pts[1], pts[-2], pts[-1])]
    return derotate_quad(quad, rotate, page_height)


def text_lines_from_response(
    response: dict,
    clip_rect: tuple[float, float, float, float],
    page_height: float,
) -> list[ParsedLine]:
    """Resolve the first PAGE's LINE/WORD blocks into ParsedLine records.

    ``clip_rect`` defines the unit-square→page transform
    (textract.py:22-24): (x, y) → (x0 + x·w, y0 + y·h).
    """
    blocks = response.get("Blocks", [])
    by_id = {b["Id"]: b for b in blocks if "Id" in b}
    x0, y0, x1, y1 = clip_rect
    sx, sy, tx, ty = (x1 - x0), (y1 - y0), x0, y0

    pages = [b for b in blocks if b.get("BlockType") == "PAGE"]
    if not pages:
        return []

    lines: list[ParsedLine] = []
    for child_id in _child_ids(pages[0]):
        line = by_id.get(child_id)
        if line is None or line.get("BlockType") != "LINE":
            continue  # unknown block types are ignored (test_textract.py:146-152)
        word_blocks = [
            by_id[wid]
            for wid in _child_ids(line)
            if wid in by_id and by_id[wid].get("BlockType") == "WORD"
        ]
        if not word_blocks:
            continue  # see divergence note in the module docstring

        # rotation of the first word applies to the whole line
        # (textline.py:40-42), computed on the RAW normalized polygon points
        first_pts = word_blocks[0]["Geometry"]["Polygon"]
        rotate = round(
            rotation_degrees(
                first_pts[0]["X"], first_pts[0]["Y"], first_pts[1]["X"], first_pts[1]["Y"]
            )
        )

        derot_rect, orientation = _derotate_block(line, rotate, sx, sy, tx, ty, page_height)
        bbox = line["Geometry"]["BoundingBox"]
        rect = (
            bbox["Left"] * sx + tx,
            bbox["Top"] * sy + ty,
            (bbox["Left"] + bbox["Width"]) * sx + tx,
            (bbox["Top"] + bbox["Height"]) * sy + ty,
        )
        words = []
        for wb in word_blocks:
            w_rect, w_orient = _derotate_block(wb, rotate, sx, sy, tx, ty, page_height)
            words.append(ParsedWord(wb.get("Text", ""), w_rect, w_orient))

        lines.append(
            ParsedLine(
                text=line.get("Text", ""),
                orientation=orientation,
                derotated_rect=derot_rect,
                rect=rect,
                confidence=(line.get("Confidence") or 0.0) / 100.0,
                words=words,
            )
        )
    return lines


def _child_ids(block: dict) -> list[str]:
    out: list[str] = []
    for rel in block.get("Relationships", []) or []:
        if rel.get("Type") == "CHILD":
            out.extend(rel.get("Ids", []))
    return out
