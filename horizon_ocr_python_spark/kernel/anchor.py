"""K9 spatial anchoring — attach bounding boxes to fused fields.

Semantics pinned to the reference's `_anchor_fields_spatially`
(pipeline/orchestrator.py:1190-1302). Four match strategies, in priority
order, against the document's text lines and tables; nothing matches ->
bbox stays None (no false anchoring):

1. exact word match   — tightest box, best word by confidence
2. exact line match   — full-line equality after strip/lower
3. substring span     — contiguous substring of a line -> merged boxes of
                        the overlapping words (cursor scan); fallback to
                        the whole line's bbox
4. table cell match   — first cell with a bbox whose text equals the value

Inputs are plain dicts (the Arrow-batch-friendly form):
    line: {text, bbox: (x1,y1,x2,y2) | None, page, words: [word]}
    word: {text, bbox, confidence}
    table: {rows: [[str]], cells: [{text, bbox, page?}]}  (cells optional)
Strategy 1-3 also return the matched line's page so multi-page documents
anchor fields to the right page (the reference gets page from candidates
built in its per-page loop; our dataset form recovers it at anchor time).
"""

from __future__ import annotations

from typing import Any, Optional

_NULLISH = ("n/a", "none", "null", "")


def normalize_value(value: Any) -> str:
    """orchestrator.py:1231-1232."""
    return str(value).strip().lower()


def merge_bboxes(boxes: list[tuple]) -> tuple:
    """Envelope of (x1,y1,x2,y2) boxes (orchestrator.py:1234-1240)."""
    return (min(b[0] for b in boxes), min(b[1] for b in boxes),
            max(b[2] for b in boxes), max(b[3] for b in boxes))


def find_field_anchor(value: Any, text_lines: list[dict],
                      tables: Optional[list[dict]] = None
                      ) -> tuple[Optional[tuple], Optional[int]]:
    """Run the 4 strategies; returns (bbox, page) or (None, None)."""
    norm = normalize_value(value)
    if not norm or norm in _NULLISH:
        return None, None

    # 1) exact word match: best word by confidence across all lines
    best_word, best_page = None, None
    for tl in text_lines:
        for w in tl.get("words") or []:
            if w["text"].strip().lower() == norm and w.get("bbox") is not None:
                if best_word is None or w.get("confidence", 0.0) > best_word.get("confidence", 0.0):
                    best_word, best_page = w, tl.get("page")
    if best_word is not None:
        return tuple(best_word["bbox"]), best_page

    # 2) exact line match
    for tl in text_lines:
        if tl["text"].strip().lower() == norm and tl.get("bbox") is not None:
            return tuple(tl["bbox"]), tl.get("page")

    # 3) substring span -> merged word boxes (cursor scan, orchestrator.py:1259-1281).
    # The reference's match condition is `norm in line_lower and tl.words`:
    # a matching line WITHOUT words is skipped (later lines — and stage 4
    # table cells — can still anchor). Once a matching line WITH words is
    # found, the scan stops there: merged span boxes if any, else that
    # line's whole bbox (returned even when it is None).
    for tl in text_lines:
        line_lower = tl["text"].lower()
        if norm in line_lower and tl.get("words"):
            start_idx = line_lower.index(norm)
            end_idx = start_idx + len(norm)
            span_boxes = []
            cursor = 0
            for w in tl["words"]:
                w_start = line_lower.find(w["text"].lower(), cursor)
                if w_start == -1:
                    continue
                w_end = w_start + len(w["text"])
                if w_end > start_idx and w_start < end_idx and w.get("bbox") is not None:
                    span_boxes.append(w["bbox"])
                cursor = w_end
            if span_boxes:
                return merge_bboxes(span_boxes), tl.get("page")
            if tl.get("bbox") is not None:  # fallback: whole line
                return tuple(tl["bbox"]), tl.get("page")
            return None, None  # worded match has no bbox: stop, no false anchoring

    # 4) table cell match: the FIRST text-matching cell decides — its
    # bbox-or-None is returned (orchestrator.py _find_bbox stops at the
    # first equal cell rather than scanning for one that carries a box).
    for tbl in tables or []:
        for cell in tbl.get("cells") or []:
            if cell.get("text", "").strip().lower() == norm:
                if cell.get("bbox") is not None:
                    return tuple(cell["bbox"]), cell.get("page")
                return None, None

    return None, None


def anchor_fields(fields: list[dict], text_lines: list[dict],
                  tables: Optional[list[dict]] = None) -> list[dict]:
    """Anchor fused fields in place (orchestrator.py:1290-1302): only fields
    with bbox=None are searched; a hit also back-fills candidates carrying
    the same value."""
    for field in fields:
        if field.get("bbox") is None and field.get("value") is not None:
            bbox, page = find_field_anchor(field["value"], text_lines, tables)
            if bbox:
                field["bbox"] = bbox
                if page is not None:
                    field["page"] = page
                for cand in field.get("candidates", []):
                    if cand.get("bbox") is None and cand.get("value") == field["value"]:
                        cand["bbox"] = bbox
                        if page is not None:
                            cand["page"] = page
    return fields
