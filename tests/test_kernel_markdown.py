"""Markdown renderer tests — reference tests/test_markdown.py semantics
(badges, pct, size formatting, pipe-escaping, section structure,
idempotence)."""

from horizon_ocr_python_spark.kernel import markdown as M


class TestHelpers:
    def test_conf_badges(self):
        # markdown.py:21-29 thresholds
        assert M.conf_badge(0.95) == "🟢"
        assert M.conf_badge(0.9) == "🟢"
        assert M.conf_badge(0.75) == "🟡"
        assert M.conf_badge(0.7) == "🟡"
        assert M.conf_badge(0.55) == "🟠"
        assert M.conf_badge(0.5) == "🟠"
        assert M.conf_badge(0.2) == "🔴"

    def test_pct(self):
        assert M.pct(0.956) == "95.6%"
        assert M.pct(1.0) == "100.0%"

    def test_format_size(self):
        # markdown.py:69-75
        assert M.format_size(512) == "512 B"
        assert M.format_size(2048) == "2.0 KB"
        assert M.format_size(3 * 1024 * 1024) == "3.00 MB"

    def test_escape_md_pipes_and_newlines(self):
        assert M.escape_md("a|b") == "a\\|b"
        assert M.escape_md("a\nb") == "a b"


class TestRenderTable:
    def test_gfm_table(self):
        md = M.render_table_md([["Item", "Qty"], ["Widget", "5"]])
        lines = md.splitlines()
        assert lines[0] == "| Item | Qty |"
        assert lines[1] == "|---|---|"
        assert lines[2] == "| Widget | 5 |"

    def test_ragged_rows_padded(self):
        md = M.render_table_md([["a", "b", "c"], ["only-one"]])
        assert md.splitlines()[2] == "| only-one |  |  |"

    def test_cell_pipe_escaped(self):
        md = M.render_table_md([["a|b"]])
        assert "a\\|b" in md


class TestGenerate:
    DOC = {
        "metadata": {"url": "https://x.example/p", "file_type": "html",
                     "file_size_bytes": 1234, "lang": "en"},
        "title": "T|itle",
        "page_count": 1,
        "pages": [{"number": 1, "raw_text": "line1\nline2"}],
        "tables": [{"rows": [["K", "V"], ["Total", "$5"]]}],
        "fields": [{"name": "total", "value": "$5", "data_type": "currency",
                    "confidence": 0.92, "status": "validated"}],
        "validation": {"passed": True, "total_checks": 2, "passed_checks": 2,
                       "issues": []},
    }

    def test_sections_in_order(self):
        md = M.generate_markdown(self.DOC, generated_at="2026-01-01")
        idx = [md.index(s) for s in (
            "# Extraction Report", "## Document Information", "## Title",
            "## Page 1", "## Tables", "## Extracted Fields", "## Validation")]
        assert idx == sorted(idx)

    def test_field_row_badge(self):
        md = M.generate_markdown(self.DOC)
        assert "| total | $5 | currency | 🟢 92.0% | validated |" in md

    def test_title_pipe_escaped(self):
        md = M.generate_markdown(self.DOC)
        assert "> T\\|itle" in md

    def test_deterministic_and_idempotent(self):
        a = M.generate_markdown(self.DOC, generated_at="2026-01-01")
        b = M.generate_markdown(self.DOC, generated_at="2026-01-01")
        assert a == b
        # no timestamp -> no "Generated on" line (injectable determinism)
        assert "Generated on" not in M.generate_markdown(self.DOC)
