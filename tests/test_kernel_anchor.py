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
