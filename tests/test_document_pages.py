"""Multi-page document model (S1), nested Document schema, FlateDecode/Td
PDF support, reconstruction block, and C7 config threading."""

import zlib

from horizon_ocr_python_spark.kernel import document, pdf_text
from horizon_ocr_python_spark.kernel.config import load_config

PAGE1 = [(72.0, 72.0, "Big Title", 24.0),
         (72.0, 130.0, "Invoice Number: INV-42", 12.0),
         (72.0, 190.0, "First page body", 12.0)]
PAGE2 = [(72.0, 72.0, "Second page body", 12.0),
         (72.0, 130.0, "Total: $12.50", 12.0)]


def _doc(compress=False, use_td=False, config=None):
    pdf = pdf_text.build_pdf_pages([PAGE1, PAGE2], compress=compress, use_td=use_td)
    return document.extract_document("https://x.example/a.pdf", pdf,
                                     warc_ts="2026-03-01", config=config)


class TestMultiPagePdf:
    def test_page_fanout(self):
        doc = _doc()
        assert doc["status"] == "ok"
        assert doc["page_count"] == 2
        assert [p["number"] for p in doc["pages"]] == [1, 2]
        assert len(doc["pages"][0]["text_lines"]) == 3
        assert len(doc["pages"][1]["text_lines"]) == 2

    def test_raw_text_spans_pages_in_reading_order(self):
        doc = _doc()
        assert doc["raw_text"] == ("Big Title\nInvoice Number: INV-42\n"
                                   "First page body\nSecond page body\nTotal: $12.50")
        # per-page raw_text is the page-local reading-order join
        assert doc["pages"][1]["raw_text"] == "Second page body\nTotal: $12.50"

    def test_flatedecode_and_td_byte_identical(self):
        plain = _doc()["raw_text"]
        assert _doc(compress=True)["raw_text"] == plain
        assert _doc(use_td=True)["raw_text"] == plain
        assert _doc(compress=True, use_td=True)["raw_text"] == plain

    def test_corrupt_compressed_page_contained(self):
        pdf = bytearray(pdf_text.build_pdf_pages([PAGE1, PAGE2], compress=True))
        i = pdf.find(b"stream\n") + len(b"stream\n")
        pdf[i:i + 4] = b"XXXX"  # corrupt page 1's deflate stream
        doc = document.extract_document("https://x.example/a.pdf", bytes(pdf))
        assert doc["status"] == "ok"  # contained, not thrown
        # page numbering preserved: surviving content is page 2
        assert doc["page_count"] == 2
        assert doc["raw_text"] == "Second page body\nTotal: $12.50"

    def test_fields_carry_true_pages_and_bboxes(self):
        doc = _doc()
        by_name = {f["name"]: f for f in doc["fields"]}
        assert by_name["invoice_number"]["page"] == 1
        assert by_name["total"]["page"] == 2
        for f in by_name.values():
            assert f["bbox"] is not None
            x1, y1, x2, y2 = f["bbox"]
            assert x1 < x2 and y1 < y2
        # candidates are full structures, chosen source is the pdf text layer
        inv = by_name["invoice_number"]
        assert inv["chosen_source"] == "pdf_text"
        assert inv["candidates"][0]["value"] == "INV-42"
        assert inv["candidates"][0]["page"] == 1

    def test_word_boxes_monotonic(self):
        doc = _doc()
        line = doc["pages"][0]["text_lines"][1]  # "Invoice Number: INV-42"
        words = line["words"]
        assert [w["text"] for w in words] == ["Invoice", "Number:", "INV-42"]
        xs = [w["bbox"][0] for w in words]
        assert xs == sorted(xs) and xs[0] == line["bbox"][0]
        assert words[-1]["bbox"][2] <= line["bbox"][2] + 1e-9


class TestReconstruction:
    def test_block_shape(self):
        rec = _doc()["reconstruction"]
        assert rec["version"] == "1.0"
        assert rec["pages"] == [
            {"page": 1, "width": 612, "height": 792},
            {"page": 2, "width": 612, "height": 792}]
        texts = [e["text"] for e in rec["elements"]]
        assert texts == ["Big Title", "Invoice Number: INV-42",
                         "First page body", "Second page body", "Total: $12.50"]
        assert all(e["type"] == "text" for e in rec["elements"])
        assert rec["fields_summary"]["invoice_number"] == "INV-42"

    def test_yband_dedup_inside_block(self):
        # same text twice in one y-band -> one element (reconstruction.py:173-199)
        lines = [(72.0, 72.0, "dup", 12.0), (80.0, 80.0, "dup", 12.0),
                 (72.0, 300.0, "dup", 12.0)]
        pdf = pdf_text.build_pdf(lines)
        doc = document.extract_document("https://x.example/d.pdf", pdf)
        texts = [e["text"] for e in doc["reconstruction"]["elements"]]
        assert texts == ["dup", "dup"]  # bands 1 and 6, not 3 copies


class TestConfigThreading:
    def test_min_block_chars_reaches_html(self):
        html = b"<html><body><p>Hello wonderful world</p><p>tiny</p></body></html>"
        base = document.extract_document("https://x.example/h", html)
        assert "tiny" in base["raw_text"]
        cfg = load_config(data={"extraction": {"min_block_chars": 10}},
                          env={}).to_dict()
        strict = document.extract_document("https://x.example/h", html, config=cfg)
        assert "tiny" not in strict["raw_text"]

    def test_max_link_density_reaches_html(self):
        html = (b"<html><body><p>Plain paragraph with many words here</p>"
                b'<p>See <a href="/x">this</a> in a long paragraph of many '
                b"additional words keeping density low</p></body></html>")
        cfg = load_config(data={"extraction": {"max_link_density": 0.05}},
                          env={}).to_dict()
        strict = document.extract_document("https://x.example/h", html, config=cfg)
        assert "additional" not in strict["raw_text"]
        base = document.extract_document("https://x.example/h", html)
        assert "additional" in base["raw_text"]

    def test_low_confidence_threshold_reaches_status(self):
        html = (b"<html><body><p>Invoice Number: INV-9</p></body></html>")
        base = document.extract_document("https://x.example/h", html)
        assert {f["status"] for f in base["fields"]} == {"validated"}
        cfg = load_config(data={"thresholds": {"low_confidence": 0.99}},
                          env={}).to_dict()
        strict = document.extract_document("https://x.example/h", html, config=cfg)
        # conf 0.9 < 0.99 -> no longer auto-validated
        assert {f["status"] for f in strict["fields"]} != {"validated"}

    def test_env_override_reaches_kernel(self):
        cfg = load_config(env={"HSP_EXTRACTION_MIN_BLOCK_CHARS": "10"}).to_dict()
        assert cfg["extraction"]["min_block_chars"] == 10
        html = b"<html><body><p>Hello wonderful world</p><p>tiny</p></body></html>"
        doc = document.extract_document("https://x.example/h", html, config=cfg)
        assert "tiny" not in doc["raw_text"]


class TestZlibRealness:
    def test_streams_actually_deflated(self):
        pdf = pdf_text.build_pdf_pages([PAGE1], compress=True)
        assert b"/FlateDecode" in pdf
        assert b"Big Title" not in pdf  # text not visible in compressed bytes
        # and the uncompressed build does carry it
        assert b"Big Title" in pdf_text.build_pdf_pages([PAGE1])

    def test_zlib_roundtrip_matches_plain(self):
        plain = pdf_text.extract_pdf_text_lines(pdf_text.build_pdf_pages([PAGE1, PAGE2]))
        comp = pdf_text.extract_pdf_text_lines(
            pdf_text.build_pdf_pages([PAGE1, PAGE2], compress=True))
        assert plain == comp
        assert zlib  # imported for documentation: stdlib-only dependency


class TestTextDensity:
    HTML = (b"<html><body>"
            b"<p>A clean paragraph of plain prose with many words and no markup</p>"
            b"<p><b>w</b><i>i</i><b>d</b><i>g</i><b>e</b><i>t</i>"
            b"<b>s</b><i>p</i><b>a</b><i>m</i></p>"
            b"</body></html>")

    def test_density_signal_exposed(self):
        from horizon_ocr_python_spark.kernel.html_extract import extract_html

        hx = extract_html(self.HTML)
        dens = {b["text"]: b["text_density"] for b in hx["blocks"]}
        prose = next(v for k, v in dens.items() if "prose" in k)
        widget = next(v for k, v in dens.items() if "prose" not in k)
        assert prose > 10 and widget < 1.5

    def test_default_off_keeps_contract(self):
        base = document.extract_document("https://x/h", self.HTML)
        assert "widgetspam" in base["raw_text"]

    def test_config_gate_drops_markup_heavy_block(self):
        cfg = load_config(data={"extraction": {"min_text_density": 3.0}},
                          env={}).to_dict()
        doc = document.extract_document("https://x/h", self.HTML, config=cfg)
        assert "widgetspam" not in doc["raw_text"]
        assert "clean paragraph" in doc["raw_text"]

    def test_env_override(self):
        cfg = load_config(env={"HSP_EXTRACTION_MIN_TEXT_DENSITY": "3.0"}).to_dict()
        assert cfg["extraction"]["min_text_density"] == 3.0
