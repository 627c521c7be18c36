"""K9 spatial anchoring — the four strategies of orchestrator.py:1190-1302,
mirroring the reference's own strategy tests (tests/test_pipeline.py:259-395)."""

from horizon_ocr_python_spark.kernel import anchor


def _word(text, x1, y1, x2, y2, conf=1.0):
    return {"text": text, "bbox": (x1, y1, x2, y2), "confidence": conf}


def _line(text, words, bbox, page=1):
    return {"text": text, "words": words, "bbox": bbox, "page": page}


LINES = [
    _line("Invoice Number: INV-001",
          [_word("Invoice", 10, 0, 60, 12), _word("Number:", 65, 0, 115, 12),
           _word("INV-001", 120, 0, 170, 12)],
          (10, 0, 170, 12), page=1),
    _line("Total: $1,234.56",
          [_word("Total:", 10, 20, 50, 32), _word("$1,234.56", 55, 20, 120, 32)],
          (10, 20, 120, 32), page=2),
]


class TestStrategies:
    def test_strategy1_exact_word(self):
        bbox, page = anchor.find_field_anchor("INV-001", LINES)
        assert bbox == (120, 0, 170, 12)
        assert page == 1

    def test_strategy1_best_confidence_wins(self):
        lines = [
            _line("x INV-9", [_word("INV-9", 0, 0, 10, 10, conf=0.4)], (0, 0, 10, 10)),
            _line("y INV-9", [_word("INV-9", 50, 50, 60, 60, conf=0.9)], (50, 50, 60, 60)),
        ]
        bbox, _ = anchor.find_field_anchor("inv-9", lines)
        assert bbox == (50, 50, 60, 60)

    def test_strategy2_exact_line(self):
        # value equals a whole line but no single word matches
        bbox, page = anchor.find_field_anchor("Total: $1,234.56", LINES)
        assert bbox == (10, 20, 120, 32)
        assert page == 2

    def test_strategy3_substring_span_merges_word_boxes(self):
        bbox, page = anchor.find_field_anchor("Number: INV-001", LINES)
        # merged envelope of words 2..3 of line 1
        assert bbox == (65, 0, 170, 12)
        assert page == 1

    def test_strategy3_falls_back_to_line_bbox(self):
        # substring matches inside a word ("nvoice Numb" spans no whole word
        # boundary scan failure -> line bbox fallback, orchestrator.py:1278-1281)
        lines = [_line("abcdef", [], (1, 2, 3, 4))]
        lines[0]["words"] = [{"text": "zzz", "bbox": None, "confidence": 1.0}]
        bbox, _ = anchor.find_field_anchor("cde", lines)
        assert bbox == (1, 2, 3, 4)

    def test_strategy4_table_cell(self):
        tables = [{"rows": [["Total", "$5.00"]],
                   "cells": [{"text": "$5.00", "bbox": (7, 8, 9, 10), "page": 3}]}]
        bbox, page = anchor.find_field_anchor("$5.00", [], tables)
        assert bbox == (7, 8, 9, 10)
        assert page == 3

    def test_no_match_returns_none(self):
        assert anchor.find_field_anchor("absent-value", LINES) == (None, None)

    def test_nullish_values_never_anchor(self):
        for v in ("", "  ", "N/A", "None", "null"):
            assert anchor.find_field_anchor(v, LINES) == (None, None)


class TestAnchorFields:
    def test_anchors_field_and_backfills_candidates(self):
        fields = [{
            "name": "invoice_number", "value": "INV-001", "bbox": None,
            "page": None,
            "candidates": [
                {"source": "pdf_text", "value": "INV-001", "bbox": None},
                {"source": "html_kv", "value": "OTHER", "bbox": None},
            ],
        }]
        anchor.anchor_fields(fields, LINES)
        assert fields[0]["bbox"] == (120, 0, 170, 12)
        assert fields[0]["page"] == 1
        assert fields[0]["candidates"][0]["bbox"] == (120, 0, 170, 12)
        assert fields[0]["candidates"][1]["bbox"] is None  # different value

    def test_existing_bbox_untouched(self):
        fields = [{"name": "n", "value": "INV-001", "bbox": (1, 1, 2, 2),
                   "candidates": []}]
        anchor.anchor_fields(fields, LINES)
        assert fields[0]["bbox"] == (1, 1, 2, 2)

    def test_merge_bboxes_envelope(self):
        assert anchor.merge_bboxes([(0, 5, 10, 15), (2, 1, 20, 9)]) == (0, 1, 20, 15)


class TestReferenceParity:
    """1:1 mirror of the reference's own anchoring scenarios
    (reference tests/test_pipeline.py:259-395), same strings and coords."""

    @staticmethod
    def _tl(text, x1, y1, x2, y2):
        parts = text.split()
        w_width = (x2 - x1) / max(len(parts), 1)
        words = [{"text": p,
                  "bbox": (x1 + i * w_width, y1, x1 + (i + 1) * w_width, y2),
                  "confidence": 0.95}
                 for i, p in enumerate(parts)]
        return {"text": text, "bbox": (x1, y1, x2, y2), "words": words, "page": 1}

    @staticmethod
    def _field(name, value):
        return {"name": name, "value": value, "confidence": 0.90,
                "status": "confident", "page": 1, "bbox": None,
                "chosen_source": "gpt_vision",
                "candidates": [{"source": "gpt_vision", "value": value,
                                "confidence": 0.90, "page": 1, "bbox": None}]}

    def test_exact_word_match(self):
        tl = self._tl("Invoice Number: INV-12345", 10, 20, 500, 40)
        f = self._field("invoice_number", "INV-12345")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is not None
        assert f["bbox"][0] > 10  # the word box, not the whole line

    def test_exact_line_match(self):
        tl = self._tl("ACME Corporation", 50, 100, 400, 130)
        f = self._field("vendor_name", "ACME Corporation")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is not None
        # NOTE: words cover the whole line here, so strategy 1/3 can fire
        # first with the same envelope — assert the reference's invariants
        assert f["bbox"][3] == 130

    def test_substring_match(self):
        tl = self._tl("Date: 2025-01-15 Ref: ABC", 10, 50, 600, 70)
        f = self._field("invoice_date", "2025-01-15")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is not None

    def test_table_cell_match(self):
        tbl = {"rows": [["$1,234.56"]],
               "cells": [{"row": 0, "col": 0, "text": "$1,234.56",
                          "bbox": (200, 300, 350, 330), "page": 1}]}
        f = self._field("total_amount", "$1,234.56")
        anchor.anchor_fields([f], [], [tbl])
        assert f["bbox"] is not None and f["bbox"][0] == 200

    def test_no_match_leaves_none(self):
        tl = self._tl("Completely unrelated text here", 10, 10, 400, 30)
        f = self._field("customer_name", "John Smith")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is None

    def test_skips_na_values(self):
        tl = self._tl("N/A", 10, 10, 50, 30)
        f = self._field("po_number", "N/A")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is None

    def test_candidate_bbox_updated(self):
        tl = self._tl("BOL-99887766", 100, 200, 300, 220)
        f = self._field("bol_number", "BOL-99887766")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is not None
        assert f["candidates"][0]["bbox"] is not None
        assert f["candidates"][0]["bbox"][0] == f["bbox"][0]

    def test_already_has_bbox_is_skipped(self):
        tl = self._tl("INV-999", 100, 200, 300, 220)
        f = self._field("invoice_number", "INV-999")
        f["bbox"] = (1, 2, 3, 4)
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] == (1, 2, 3, 4)

    def test_case_insensitive_match(self):
        tl = self._tl("acme corp", 50, 100, 300, 120)
        f = self._field("vendor_name", "ACME CORP")
        anchor.anchor_fields([f], [tl], [])
        assert f["bbox"] is not None


class TestFirstMatchStops:
    """Round-4 ADVICE fix: the reference's stage-3 condition is
    `norm in line_lower and tl.words` (orchestrator.py:1262) — a matching
    line WITHOUT words is SKIPPED (later lines / stage-4 cells can still
    anchor); the first matching line WITH words stops the scan and returns
    its bbox-or-None. Stage 4 stops at the first text-equal cell."""

    def test_strategy3_wordless_match_skipped_later_line_anchors(self):
        lines = [
            _line("pay total 42 now", [], None),   # matches but no words: skipped
            _line("total 42", [_word("total", 0, 0, 5, 5),
                               _word("42", 6, 0, 9, 5)], (0, 0, 9, 5)),
        ]
        bbox, page = anchor.find_field_anchor("total 4", lines)
        assert bbox == (0, 0, 9, 5) and page == 1

    def test_strategy3_wordless_match_skipped_table_cell_anchors(self):
        # HTML text lines are built with words=[] (document.py) — a value
        # appearing in body text AND a table cell must keep its cell anchor.
        lines = [_line("grand total 42", None, (3, 4, 5, 6), page=7)]
        tables = [{"rows": [["total 4"]],
                   "cells": [{"text": "total 4", "bbox": (9, 9, 11, 11),
                              "page": 2}]}]
        bbox, page = anchor.find_field_anchor("total 4", lines, tables)
        assert bbox == (9, 9, 11, 11) and page == 2

    def test_strategy3_no_worded_match_no_anchor(self):
        lines = [_line("grand total 42", None, (3, 4, 5, 6), page=7)]
        bbox, page = anchor.find_field_anchor("total 4", lines)
        assert bbox is None and page is None

    def test_strategy3_worded_boxless_match_stops(self):
        lines = [
            _line("pay total 42 now", [_word("pay", 0, 0, 3, 5)], None),
            _line("total 42", [_word("total", 0, 0, 5, 5)], (0, 0, 5, 5)),
        ]
        # first line has words and matches; span scan hits no overlapping
        # boxed word inside the span and the line bbox is None -> stop.
        bbox, page = anchor.find_field_anchor("total 42 now", lines)
        assert bbox is None and page is None

    def test_strategy4_first_boxless_cell_stops(self):
        tables = [{"rows": [["$5.00"]],
                   "cells": [{"text": "$5.00", "bbox": None},
                             {"text": "$5.00", "bbox": (1, 2, 3, 4)}]}]
        bbox, page = anchor.find_field_anchor("$5.00", [], tables)
        assert bbox is None and page is None
