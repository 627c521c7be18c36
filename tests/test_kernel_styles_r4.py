"""R4 PDF-native style depth: font variants (bold/italic), fill color,
style structs on text_lines, bold in the reconstruction flat view."""

from horizon_ocr_python_spark.kernel import document, pdf_text

LINES = [(72.0, 72.0, "Bold Title", 24.0, "bold", "#1020ff"),
         (72.0, 130.0, "plain text", 12.0),
         (72.0, 190.0, "slanted", 12.0, "italic")]


class TestStyleExtraction:
    def test_font_variants_roundtrip(self):
        for compress in (False, True):
            for td in (False, True):
                pdf = pdf_text.build_pdf(LINES, compress=compress, use_td=td)
                got = [(ln["font_name"], ln["bold"], ln["italic"], ln["color"])
                       for ln in pdf_text.extract_pdf_text_lines(pdf)]
                assert got == [
                    ("Helvetica-Bold", True, False, "#1020ff"),
                    ("Helvetica", False, False, "#1020ff"),  # rg persists
                    ("Helvetica-Oblique", False, True, "#1020ff"),
                ], (compress, td)

    def test_color_resets_per_page_stream(self):
        pdf = pdf_text.build_pdf_pages([LINES, [(72.0, 72.0, "p2", 12.0)]])
        assert pdf_text.extract_pdf_text_lines(pdf)[-1]["color"] == "#000000"

    def test_style_flags_rule(self):
        assert pdf_text.style_flags("Helvetica-Bold") == (True, False)
        assert pdf_text.style_flags("Times-BoldItalic") == (True, True)
        assert pdf_text.style_flags("Helvetica-Oblique") == (False, True)
        assert pdf_text.style_flags("Courier") == (False, False)
        assert pdf_text.style_flags(None) == (False, False)

    def test_document_carries_style_struct(self):
        pdf = pdf_text.build_pdf(LINES)
        doc = document.extract_document("https://x/a.pdf", pdf)
        st = doc["pages"][0]["text_lines"][0]["style"]
        assert st == {"font_name": "Helvetica-Bold", "font_size": 24.0,
                      "bold": True, "italic": False, "color": "#1020ff",
                      "source": "pdf_native", "confidence": 0.9}
        # reconstruction flat view carries bold
        el = doc["reconstruction"]["elements"][0]
        assert el["text"] == "Bold Title" and el["bold"] is True

    def test_html_lines_have_no_style(self):
        doc = document.extract_document(
            "https://x/h", b"<html><body><p>Hello world text</p></body></html>")
        assert doc["pages"][0]["text_lines"][0]["style"] is None

    def test_generator_title_is_bold(self):
        from horizon_ocr_python_spark.sources import pages

        for i in range(200):
            p = pages.make_page(i, seed=42)
            if p["kind"] == "pdf":
                doc = document.extract_document(p["url"], p["html"])
                title_line = doc["pages"][0]["text_lines"][0]
                assert title_line["style"]["bold"] is True
                assert doc["raw_text"] == p["text"]  # byte identity holds
                break
