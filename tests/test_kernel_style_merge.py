"""R6 fuzzy style<->OCR merge (kernel.style_merge) — reference tolerances
and selection rules (pdf_style_extractor.py:477-551)."""

from horizon_ocr_python_spark.kernel.style_merge import (
    match_span, merge_pdf_styles_with_ocr)

STYLE = {"font_name": "Helvetica", "font_size": 14.0, "bold": True,
         "italic": False, "color": "#102030", "source": "pdf_native",
         "confidence": 0.9}


def _span(text, x, y, style=STYLE):
    return {"text": text, "x": x, "y": y, "style": style}


def _line(text, x, y, height=None, y2=None):
    bbox = {"x": x, "y": y}
    if height is not None:
        bbox["height"] = height
    if y2 is not None:
        bbox = {"x1": x, "y1": y, "y2": y2}
    return {"text": text, "bbox": bbox}


class TestTolerances:
    def test_y_tolerance_10(self):
        line = _line("Invoice Total", 100, 200)
        assert match_span(line, [_span("invoice total", 100, 210)]) is not None
        assert match_span(line, [_span("invoice total", 100, 211)]) is None

    def test_x_tolerance_twice_y(self):
        line = _line("Invoice Total", 100, 200)
        assert match_span(line, [_span("invoice total", 120, 200)]) is not None
        assert match_span(line, [_span("invoice total", 121, 200)]) is None

    def test_text_containment_gate(self):
        line = _line("Invoice Total", 100, 200)
        # substring either direction passes
        assert match_span(line, [_span("THE INVOICE TOTAL LINE", 100, 200)]) is not None
        assert match_span(line, [_span("voice tot", 100, 200)]) is not None
        # no containment -> no match even at distance 0
        assert match_span(line, [_span("completely different", 100, 200)]) is None


class TestSelection:
    def test_best_charset_overlap_wins(self):
        line = _line("abcdef", 0, 0)
        spans = [_span("ab", 0, 5), _span("abcdefgh", 0, 9)]
        m = match_span(line, spans)
        assert m["text"] == "abcdefgh"  # 6 shared chars beats 2

    def test_tie_goes_to_first_span(self):
        line = _line("abc", 0, 0)
        spans = [_span("abcx", 0, 9), _span("abcy", 0, 0)]
        m = match_span(line, spans)
        assert m["text"] == "abcx"  # strict > keeps the earlier span


class TestMergeStyles:
    def test_match_copies_style(self):
        lines = [_line("Invoice Total", 100, 200)]
        merge_pdf_styles_with_ocr(lines, [_span("invoice total", 100, 205)])
        st = lines[0]["style"]
        assert st["font_name"] == "Helvetica" and st["font_size"] == 14.0
        assert st["bold"] is True and st["source"] == "pdf_native"

    def test_no_match_estimates_from_height(self):
        lines = [_line("orphan line", 0, 0, height=20)]
        merge_pdf_styles_with_ocr(lines, [])
        st = lines[0]["style"]
        assert st["source"] == "estimated" and st["confidence"] == 0.5
        assert st["font_size_estimated"] == 15.0  # 20 * 0.75

    def test_estimate_from_y1_y2_and_clipping(self):
        tall = [_line("x", 0, 0, y2=200)]  # height 200 -> clip at 72
        merge_pdf_styles_with_ocr(tall, [])
        assert tall[0]["style"]["font_size_estimated"] == 72.0
        tiny = [_line("x", 0, 0, height=2)]  # 1.5 -> clip at 6
        merge_pdf_styles_with_ocr(tiny, [])
        assert tiny[0]["style"]["font_size_estimated"] == 6.0

    def test_default_height_15(self):
        lines = [{"text": "x", "bbox": {"x": 0, "y": 0}}]
        merge_pdf_styles_with_ocr(lines, [])
        assert lines[0]["style"]["font_size_estimated"] == 11.2  # 15*0.75 rounded
