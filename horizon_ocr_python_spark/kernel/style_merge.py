"""R6: fuzzy merge of PDF-native styled spans onto OCR text lines.

Semantics pinned to the reference's merge_pdf_styles_with_ocr
(extract/pdf_style_extractor.py:477-551):

- candidate spans: |span.y - line.y| <= tolerance (10px) AND
  |span.x - line.x| <= 2 * tolerance (x is deliberately more lenient)
- text gate: lowercased/stripped substring containment either way
- score: size of the CHARACTER-SET intersection of the two texts; the
  best-scoring span wins, first span wins ties (strict > comparison over
  the span list order)
- no match -> estimated style: font_size = round(clip(h * 0.75, 6, 72), 1),
  source 'estimated', confidence 0.5 (the reference's fallback block)

The dataset-level twin (operators/pagemodel.r6_style_merge) expresses the
same rule relationally: y-grid bucket join (equi), tolerance filters,
charset overlap via array_intersect, window rank.
"""

from __future__ import annotations

from typing import Any, Optional


def _line_xy(line: dict) -> tuple[float, float]:
    bbox = line.get("bbox") or {}
    y = bbox.get("y", bbox.get("y1", 0))
    x = bbox.get("x", bbox.get("x1", 0))
    return float(x), float(y)


def _estimated_style(line: dict) -> dict:
    bbox = line.get("bbox") or {}
    height = bbox.get("height", 15)
    if "y1" in bbox and "y2" in bbox:
        height = bbox["y2"] - bbox["y1"]
    return {
        "font_name": None,
        "font_size_estimated": round(max(6, min(72, height * 0.75)), 1),
        "bold": False,
        "italic": False,
        "color": "#000000",
        "source": "estimated",
        "confidence": 0.5,
    }


def estimate_style_from_bbox(text: str, bbox_height: float, y_position: float,
                             page_height: float,
                             role: Optional[str] = None) -> dict:
    """R5 full style estimate (pdf_style_extractor.py:192-258), the rule the
    orchestrator applies to every OCR line when PDF-native styles are absent
    (orchestrator.py:606-629, 775-777):

    - font_size = bbox_height * 0.75 clamped to [6, 72], rounded to 1
    - bold iff ALL-CAPS text or a heading role
    - role: given role, else 'title' when rel_y < 0.15 and size > 14,
      'sectionHeading' when size > 14, else 'paragraph'
    - font: Arial for headings, Times New Roman for body
    - confidence 0.5 (+0.15 with a role, +0.1 for ALL-CAPS, capped 0.8)
    """
    size = round(max(6.0, min(72.0, bbox_height * 0.75)), 1)
    is_bold = bool(text.isupper() or
                   (role is not None and
                    role.lower() in ("title", "sectionheading", "header")))
    rel_y = y_position / page_height if page_height > 0 else 0.0
    if role:
        likely_role = role.lower()
    elif rel_y < 0.15 and size > 14:
        likely_role = "title"
    elif size > 14:
        likely_role = "sectionheading"
    else:
        likely_role = "paragraph"
    font = ("Arial" if likely_role in ("title", "sectionheading", "header")
            else "Times New Roman")
    confidence = 0.5 + (0.15 if role else 0.0) + (0.1 if text.isupper() else 0.0)
    return {
        "font_name": font,
        "font_size": size,
        "bold": is_bold,
        "italic": False,
        "color": "#000000",
        "source": "estimated",
        "confidence": min(0.8, confidence),
    }


def match_span(line: dict, pdf_spans: list[dict],
               tolerance: float = 10.0) -> Optional[dict]:
    """Best-matching span for one OCR line, or None (the reference's inner
    loop, pdf_style_extractor.py:500-523)."""
    line_x, line_y = _line_xy(line)
    line_text = (line.get("text") or "").lower().strip()
    best_match, best_overlap = None, 0
    for span in pdf_spans:
        if abs(float(span["y"]) - line_y) > tolerance:
            continue
        if abs(float(span["x"]) - line_x) > tolerance * 2:
            continue
        span_text = (span.get("text") or "").lower().strip()
        if line_text in span_text or span_text in line_text:
            overlap = len(set(line_text) & set(span_text))
            if overlap > best_overlap:
                best_overlap = overlap
                best_match = span
    return best_match


def merge_pdf_styles_with_ocr(ocr_lines: list[dict], pdf_spans: list[dict],
                              tolerance: float = 10.0) -> list[dict]:
    """Attach a `style` dict to every OCR line, matched or estimated
    (mutates and returns ocr_lines, as the reference does)."""
    for line in ocr_lines:
        span = match_span(line, pdf_spans, tolerance)
        if span is not None:
            st: dict[str, Any] = span.get("style") or {}
            line["style"] = {
                "font_name": st.get("font_name"),
                "font_size": st.get("font_size"),
                "bold": bool(st.get("bold", False)),
                "italic": bool(st.get("italic", False)),
                "color": st.get("color", "#000000"),
                "source": st.get("source", "pdf_native"),
                "confidence": float(st.get("confidence", 0.9)),
            }
        else:
            line["style"] = _estimated_style(line)
    return ocr_lines
