"""O7 re-OCR kernel tests (reference tests/test_targeted_reocr.py semantics)
+ direct reference-fixture parity anchors (reference tests/conftest.py)."""

from horizon_ocr_python_spark.kernel import reocr
from horizon_ocr_python_spark.kernel.document import extract_document
from horizon_ocr_python_spark.kernel.pdf_text import build_pdf


def line(text, conf):
    return {"text": text, "confidence": conf, "source": "trocr"}


class TestReocrSelection:
    def test_below_threshold_selected(self):
        lines = [line("a", 0.5), line("b", 0.71), line("c", 0.69)]
        got = reocr.identify_low_confidence_lines(lines)
        assert [ln["text"] for ln in got] == ["a", "c"]

    def test_exactly_at_threshold_not_selected(self):
        assert reocr.identify_low_confidence_lines([line("x", 0.70)]) == []

    def test_worst_k_cap(self):
        lines = [line(f"l{i}", 0.60 - i * 0.01) for i in range(60)]
        got = reocr.identify_low_confidence_lines(lines, max_lines=50)
        assert len(got) == 50
        # worst (lowest confidence) kept: l59 (conf 0.01) .. l10 (conf 0.50)
        assert got[0]["text"] == "l59"
        assert all(ln["confidence"] <= 0.50 for ln in got)

    def test_custom_threshold(self):
        lines = [line("a", 0.45), line("b", 0.55)]
        got = reocr.identify_low_confidence_lines(lines, threshold=0.5)
        assert [ln["text"] for ln in got] == ["a"]


class TestReocrAcceptance:
    def test_improvement_rule(self):
        # improvement >= 0.05 accepted (targeted_reocr.py:440-443)
        assert reocr.reocr_result("a", 0.60, "b", 0.65)["improved"]
        assert reocr.reocr_result("a", 0.60, "b", 0.6499)["improved"] is False
        assert reocr.reocr_result("a", 0.60, "b", 0.58)["improved"] is False

    def test_process_applies_in_place(self):
        lines = [line("bad", 0.40), line("ok", 0.90), line("meh", 0.68)]

        def recompute(ln):
            return (ln["text"].upper(), ln["confidence"] + 0.10)

        stats = reocr.process_lines(lines, recompute)
        assert stats == {"total_processed": 2, "improved": 2, "failed": 0}
        assert lines[0]["text"] == "BAD" and lines[0]["source"] == "reocr"
        assert lines[1]["text"] == "ok"  # untouched: above threshold

    def test_process_rejects_non_improvements(self):
        lines = [line("bad", 0.40)]
        stats = reocr.process_lines(lines, lambda ln: ("worse", 0.41))
        assert stats == {"total_processed": 1, "improved": 0, "failed": 1}
        assert lines[0]["text"] == "bad"  # unchanged


class TestReferenceFixtureParity:
    """The reference conftest's synthetic one-page PDF (conftest.py:79-103):
    known strings at known positions. Our engine must extract them
    byte-identically and recover the fields."""

    FIXTURE_LINES = [
        (72.0, 72.0, "Test Document", 24.0),
        (72.0, 120.0, "This is a test invoice.", 12.0),
        (72.0, 150.0, "Invoice Number: INV-001", 12.0),
        (72.0, 180.0, "Date: 2024-01-15", 12.0),
        (72.0, 210.0, "Total: $1,234.56", 12.0),
    ]

    def test_fixture_pdf_extraction(self):
        pdf = build_pdf(self.FIXTURE_LINES)
        doc = extract_document("fixture://conftest.pdf", pdf)
        assert doc["status"] == "ok"
        assert doc["title"] == "Test Document"
        assert doc["raw_text"] == ("Test Document\n"
                                   "This is a test invoice.\n"
                                   "Invoice Number: INV-001\n"
                                   "Date: 2024-01-15\n"
                                   "Total: $1,234.56")

    def test_fixture_fields_and_validation(self):
        pdf = build_pdf(self.FIXTURE_LINES)
        doc = extract_document("fixture://conftest.pdf", pdf)
        fields = {f["name"]: f for f in doc["fields"]}
        assert fields["invoice_number"]["value"] == "INV-001"
        assert fields["date"]["value"] == "2024-01-15"
        assert fields["date"]["data_type"] == "date"
        assert fields["total"]["value"] == "$1,234.56"
        assert fields["total"]["data_type"] == "currency"
        # all three validate: invoice regex, parseable date, positive amount
        assert all(f["status"] == "validated"
                   for f in (fields["invoice_number"], fields["date"],
                             fields["total"]))
        assert doc["validation"]["passed"]
