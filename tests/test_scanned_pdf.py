"""Scanned/image-only PDF path (round-3): glyph codec round-trips, the
/Image XObject writer/reader, the chars<=100 scanned gate, per-page
containment, and generator byte-identity.

Reference analogues: io/pdf.py:117-142 (rasterize), pdf_style_extractor.py:
67-98 (scanned gate), orchestrator.py:631-816 (OCR path assembly)."""

import numpy as np
import pytest

from horizon_ocr_python_spark.kernel import (document, glyphs, pdf_text,
                                             preprocess)

LINES1 = [(36, 72, "Scan 7 alpha beta", 3),
          (36, 130, "Invoice Number: INV-42000099", 2),
          (36, 154, "Total: $1,234.56", 2)]
LINES2 = [(36, 72, "second page body here", 2)]
TEXT1 = [t for _, _, t, _ in LINES1]
TEXT2 = [t for _, _, t, _ in LINES2]


class TestGlyphCodec:
    def test_roundtrip_exact(self):
        out = glyphs.recognize_page(glyphs.render_page(LINES1))
        assert [ln["text"] for ln in out] == TEXT1
        assert all(ln["confidence"] == 1.0 for ln in out)

    def test_roundtrip_survives_preprocess(self):
        page = glyphs.render_page(LINES2)
        pre = preprocess.preprocess_for_ocr(page)  # deskew+denoise+CLAHE+sharpen
        gray = preprocess.to_gray(pre) if pre.ndim == 3 else pre
        assert [ln["text"] for ln in glyphs.recognize_page(gray)] == TEXT2

    def test_roundtrip_survives_jpeg(self):
        from horizon_ocr_python_spark.kernel import jpeg

        page = glyphs.render_page(LINES1)
        rgb = np.stack([page] * 3, axis=-1)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=90))
        assert [ln["text"] for ln in glyphs.recognize_page(dec[:, :, 0])] == TEXT1

    def test_alignment_search_absorbs_edge_erosion(self):
        """Blur can erase the first glyph's left column — a 1px x0 shift
        must not derail the fixed-pitch walk."""
        page = glyphs.render_page(LINES2).copy()
        ink_cols = np.flatnonzero((page < 128).any(axis=0))
        page[:, ink_cols[0]] = 255  # erode the leftmost ink column
        assert [ln["text"] for ln in glyphs.recognize_page(page)] == TEXT2

    def test_word_boxes_and_font_size(self):
        out = glyphs.recognize_page(glyphs.render_page(LINES1))
        assert out[0]["font_size"] == 21.0  # scale 3 title
        assert [w["text"] for w in out[1]["words"]] == \
            ["Invoice", "Number:", "INV-42000099"]
        x1, _, x2, _ = out[1]["words"][0]["bbox"]
        assert x2 > x1

    def test_glyphs_unique(self):
        maps = {glyphs.GLYPHS[c].tobytes() for c in glyphs.CHARSET if c != " "}
        assert len(maps) == len(glyphs.CHARSET) - 1


class TestImagePdf:
    @pytest.mark.parametrize("codec", ["flate", "dct"])
    def test_build_extract_roundtrip(self, codec):
        imgs = [glyphs.render_page(LINES1), glyphs.render_page(LINES2)]
        pdf = pdf_text.build_scanned_pdf(imgs, codec=codec)
        out = pdf_text.extract_pdf_images(pdf)
        assert len(out) == 2 and all(o is not None for o in out)
        assert pdf_text.sniff_type(pdf) == "pdf"
        # no text layer: the text walker sees zero lines, no phantom pages
        assert pdf_text.extract_pdf_text_lines(pdf) == []

    def test_corrupt_image_stream_contained(self):
        imgs = [glyphs.render_page(LINES1), glyphs.render_page(LINES2)]
        pdf = bytearray(pdf_text.build_scanned_pdf(imgs, codec="flate"))
        i = pdf.find(b"stream\n", pdf.find(b"/Subtype /Image")) + 7
        pdf[i:i + 4] = b"XXXX"
        out = pdf_text.extract_pdf_images(bytes(pdf))
        assert len(out) == 2 and out[0] is None and out[1] is not None


class TestScannedDocument:
    def _doc(self, codec="flate"):
        pdf = pdf_text.build_scanned_pdf(
            [glyphs.render_page(LINES1), glyphs.render_page(LINES2)],
            codec=codec)
        return document.extract_document("https://x/scan.pdf", pdf)

    @pytest.mark.parametrize("codec", ["flate", "dct"])
    def test_scanned_gate_takes_raster_path(self, codec):
        doc = self._doc(codec)
        assert doc["status"] == "ok"
        assert doc["page_count"] == 2
        assert doc["title"] == "Scan 7 alpha beta"
        assert doc["raw_text"] == "\n".join(TEXT1 + TEXT2)

    def test_fields_extracted_and_anchored(self):
        doc = self._doc()
        by_name = {f["name"]: f for f in doc["fields"]}
        assert by_name["invoice_number"]["value"] == "INV-42000099"
        assert by_name["total"]["value"] == "$1,234.56"
        # K9 anchoring works on glyph word boxes
        assert by_name["invoice_number"]["bbox"] is not None
        assert by_name["invoice_number"]["page"] == 1
        cands = by_name["invoice_number"]["candidates"]
        assert all(c["source"] == "ocr_fallback" for c in cands)

    def test_corrupt_page_contained(self):
        pdf = bytearray(pdf_text.build_scanned_pdf(
            [glyphs.render_page(LINES1), glyphs.render_page(LINES2)],
            codec="flate"))
        i = pdf.find(b"stream\n", pdf.find(b"/Subtype /Image")) + 7
        pdf[i:i + 4] = b"XXXX"
        doc = document.extract_document("https://x/scan.pdf", bytes(pdf))
        assert doc["status"] == "ok"
        assert doc["page_count"] == 2
        assert doc["raw_text"] == "\n".join(TEXT2)  # page 1 lost, page 2 kept

    def test_text_layer_pdfs_stay_on_native_path(self):
        pdf = pdf_text.build_pdf_pages(
            [[(72.0, 72.0, "Big Title here with many many chars", 24.0),
              (72.0, 130.0, "A body line that is comfortably over the "
                            "hundred character scanned gate threshold so "
                            "the native path is taken.", 12.0)]])
        doc = document.extract_document("https://x/a.pdf", pdf)
        assert doc["pages"][0]["text_lines"][0]["style"] is not None  # native


class TestGeneratorScanned:
    def test_scanned_rows_byte_identical(self):
        from horizon_ocr_python_spark.sources import pages

        n_scanned = 0
        for i in range(200):
            p = pages.make_page(i, seed=42)
            if p["kind"] != "scanned_pdf":
                continue
            n_scanned += 1
            doc = document.extract_document(p["url"], p["html"],
                                            p["warc_ts"], p["lang"])
            assert doc["status"] == "ok"
            assert doc["raw_text"] == p["text"], p["url"]
            assert doc["title"] == p["expected_title"]
        assert n_scanned >= 3  # the corpus actually carries scanned rows


class TestRasterTables:
    """Borderless-table detection on recognized glyph pages (O8 image-cell
    capture + the D13 whitespace-alignment shape on pixels)."""

    TABLE_LINES = [(36, 72, "Scan 3 alpha", 3),
                   (36, 120, "short body line one", 2),
                   (36, 150, "Invoice Number" + " " * 4 + "INV-42000012", 2),
                   (36, 174, "Date" + " " * 14 + "2026-03-01", 2),
                   (36, 198, "Total" + " " * 13 + "$1,234.56", 2),
                   (36, 240, "closing body line", 2)]

    def _doc(self):
        pdf = pdf_text.build_scanned_pdf(
            [glyphs.render_page(self.TABLE_LINES)], codec="flate")
        return document.extract_document("https://x/scan-t.pdf", pdf)

    def test_detector_finds_grid(self):
        from horizon_ocr_python_spark.kernel import table_model

        lines = glyphs.recognize_page(glyphs.render_page(self.TABLE_LINES))
        tables, consumed = table_model.detect_raster_tables(lines)
        assert len(tables) == 1
        assert tables[0]["rows"] == [["Invoice Number", "INV-42000012"],
                                     ["Date", "2026-03-01"],
                                     ["Total", "$1,234.56"]]
        assert consumed == {2, 3, 4}
        assert all(c["bbox"] is not None for c in tables[0]["cells"])

    def test_single_aligned_line_not_a_table(self):
        from horizon_ocr_python_spark.kernel import table_model

        lines = glyphs.recognize_page(glyphs.render_page(
            [(36, 72, "label" + " " * 5 + "value", 2),
             (36, 120, "plain body text", 2)]))
        tables, consumed = table_model.detect_raster_tables(lines)
        assert tables == [] and consumed == set()

    def test_table_text_excluded_from_raw_text(self):
        doc = self._doc()
        assert doc["raw_text"] == ("Scan 3 alpha\nshort body line one\n"
                                   "closing body line")
        assert len(doc["tables"]) == 1

    def test_fields_mined_and_anchored_to_cells(self):
        doc = self._doc()
        f = {f["name"]: f for f in doc["fields"]}
        assert f["invoice_number"]["value"] == "INV-42000012"
        assert f["total"]["value"] == "$1,234.56"
        assert f["invoice_number"]["bbox"] is not None  # strategy-4 cell box
        assert f["invoice_number"]["page"] == 1

    def test_table_region_reported(self):
        doc = self._doc()
        kinds = [r["type"] for r in doc["pages"][0]["layout_regions"]]
        assert "table" in kinds


class TestOrientationDetection:
    """O10 orientation detect (the Tesseract-OSD slot): recognition-score
    voting over the 4 page rotations, upright short-circuit."""

    PAGE = [(36, 72, "Scan 9 alpha beta", 3),
            (36, 130, "Invoice Number: INV-42000099", 2),
            (36, 154, "data spark table query", 2)]

    @pytest.mark.parametrize("stored_k", [0, 1, 2, 3])
    def test_all_rotations_recovered(self, stored_k):
        page = glyphs.render_page(self.PAGE)
        stored = np.rot90(page, -stored_k)
        lines, k, score = glyphs.recognize_with_osd(stored)
        assert k == stored_k
        assert [ln["text"] for ln in lines] == [t for _, _, t, _ in self.PAGE]
        assert score == 1.0

    def test_upright_short_circuits(self):
        """k=0 with a clean page must return after ONE recognition pass —
        pinned by the accept threshold semantics (score>=accept)."""
        page = glyphs.render_page(self.PAGE)
        lines, k, score = glyphs.recognize_with_osd(page, accept=0.9)
        assert k == 0 and score >= 0.9

    def test_blank_page_defaults_upright(self):
        blank = np.full((100, 100), 255, dtype=np.uint8)
        lines, k, score = glyphs.recognize_with_osd(blank)
        assert lines == [] and k == 0 and score == 0.0

    def test_rotated_scanned_pdf_pipeline(self):
        page = glyphs.render_page([(36, 72, "Scan 1 upside down", 3),
                                   (36, 130, "Total: $9.99", 2)])
        rot = np.ascontiguousarray(np.rot90(page, -2))
        pdf = pdf_text.build_scanned_pdf([rot], codec="dct")
        doc = document.extract_document("https://x/rot.pdf", pdf)
        assert doc["raw_text"] == "Scan 1 upside down\nTotal: $9.99"
        assert doc["title"] == "Scan 1 upside down"

    def test_sideways_page_dims_uprighted(self):
        page = glyphs.render_page([(36, 72, "Scan 2 sideways", 3),
                                   (36, 130, "body line here", 2)])
        rot = np.ascontiguousarray(np.rot90(page, -1))
        pdf = pdf_text.build_scanned_pdf([rot], codec="flate")
        doc = document.extract_document("https://x/side.pdf", pdf)
        meta = doc["pages"][0]["metadata"]
        assert (meta["width"], meta["height"]) == (612, 792)  # upright dims
        assert doc["raw_text"] == "Scan 2 sideways\nbody line here"


class TestTargetedReocr:
    """O7 targeted re-OCR with O4 positional write-back on the raster path:
    selection (calibrated threshold) -> threshold-sweep recompute ->
    reference acceptance rule -> in-place text+words update."""

    def _faded_pdf(self):
        lines = [(36, 72, "Scan 9 alpha", 3), (36, 130, "Total: $9.99", 2),
                 (36, 160, "healthy body line", 2)]
        page = glyphs.render_page(lines)
        faded = page.copy()
        ys, xs = np.where(faded < 128)
        mask = (ys >= 130) & (ys < 145) & (xs % 2 != 0)
        faded[ys[mask], xs[mask]] = 150  # haze: invisible at threshold 128
        return pdf_text.build_scanned_pdf([faded], codec="flate")

    def test_faded_line_recovered(self):
        doc = document.extract_document("https://x/f.pdf", self._faded_pdf())
        assert doc["raw_text"] == "Scan 9 alpha\nTotal: $9.99\nhealthy body line"

    def test_words_rebuilt_and_fields_anchor(self):
        doc = document.extract_document("https://x/f.pdf", self._faded_pdf())
        tl = doc["pages"][0]["text_lines"][1]
        assert [w["text"] for w in tl["words"]] == ["Total:", "$9.99"]
        f = {f["name"]: f for f in doc["fields"]}
        assert f["total"]["value"] == "$9.99"
        assert f["total"]["bbox"] is not None  # anchors on rebuilt words

    def test_enhanced_recognizer_direct(self):
        page = glyphs.render_page([(36, 72, "only line here", 2)])
        hazy = np.where(page < 128, np.uint8(150), page)  # fully hazed
        base = glyphs.recognize_page(hazy)
        assert base == []  # default threshold sees nothing
        new = glyphs.recognize_line_enhanced(hazy, (36.0, 72.0, 500.0, 86.0))
        assert new is not None and new["text"] == "only line here"
        assert new["bbox"][1] == 72.0  # page coordinates restored

    def test_healthy_lines_untouched(self):
        page = glyphs.render_page([(36, 72, "Scan 9 alpha", 3),
                                   (36, 130, "Total: $9.99", 2)])
        pdf = pdf_text.build_scanned_pdf([page], codec="flate")
        doc = document.extract_document("https://x/ok.pdf", pdf)
        assert doc["raw_text"] == "Scan 9 alpha\nTotal: $9.99"


class TestDualDecoder:
    """O3 dual-decoder arbitration (reference recognize_with_dual_models,
    trocr.py:293-323): hard threshold-sweep primary, soft contrast-
    normalized correlation secondary, strict-> picks the secondary."""

    BBOX = (36.0, 72.0, 600.0, 86.0)

    def _page(self):
        return glyphs.render_page([(36, 72, "Total: $9.99", 2)])

    def test_clean_page_primary_wins(self):
        ln, tag = glyphs.recognize_line_dual(self._page(), self.BBOX)
        assert tag == "hard" and ln["text"] == "Total: $9.99"

    def test_faint_ink_secondary_wins(self):
        faint = np.where(self._page() < 128, np.uint8(215), self._page())
        assert glyphs.recognize_line_enhanced(faint, self.BBOX) is None
        ln, tag = glyphs.recognize_line_dual(faint, self.BBOX)
        assert tag == "soft"
        assert ln["text"] == "Total: $9.99"
        assert [w["text"] for w in ln["words"]] == ["Total:", "$9.99"]

    def test_soft_decoder_contrast_normalizes(self):
        for ink in (80, 150, 215):
            img = np.where(self._page() < 128, np.uint8(ink), self._page())
            ln = glyphs.recognize_line_soft(img, self.BBOX)
            assert ln is not None and ln["text"] == "Total: $9.99", ink

    def test_blank_crop_returns_none(self):
        blank = np.full((100, 640), 255, dtype=np.uint8)
        assert glyphs.recognize_line_soft(blank, self.BBOX) is None
        ln, tag = glyphs.recognize_line_dual(blank, self.BBOX)
        assert ln is None and tag == "hard"
