"""HTML extraction kernel + byte-identity over the synthetic generator.

The generator computes expected text from its own parameters (never by
running the extractor), so these are true oracle checks of the per-row
invariant: byte-identical extracted text per url.
"""

from horizon_ocr_python_spark.kernel import document, html_extract, pdf_text
from horizon_ocr_python_spark.sources import pages as pages_gen


SIMPLE = b"""<!DOCTYPE html><html><head><title>My Title</title>
<script>ignored()</script><style>.x{}</style></head>
<body>
<nav><a href="/a">Home</a> <a href="/b">About</a></nav>
<h1>Heading One</h1>
<p>First paragraph with enough text.</p>
<p>Second paragraph.</p>
<div class="sidebar"><p>Sidebar junk</p></div>
<footer><p>Copyright 2026</p></footer>
</body></html>"""


class TestHtmlExtract:
    def test_title(self):
        assert html_extract.extract_html(SIMPLE)["title"] == "My Title"

    def test_boilerplate_stripped(self):
        raw = html_extract.extract_html(SIMPLE)["raw_text"]
        assert raw == "Heading One\nFirst paragraph with enough text.\nSecond paragraph."
        assert "Sidebar" not in raw and "Copyright" not in raw and "Home" not in raw

    def test_link_density_drop(self):
        html = (b"<html><body><p>A real paragraph of content text.</p>"
                b"<p><a href='/x'>link one</a> <a href='/y'>link two</a> ok</p>"
                b"</body></html>")
        ex = html_extract.extract_html(html)
        assert ex["raw_text"] == "A real paragraph of content text."
        dropped = [b for b in ex["blocks"] if b["dropped"]]
        assert any(b["drop_reason"] == "link_density" for b in dropped)

    def test_tables_extracted(self):
        html = (b"<html><body><table>"
                b"<tr><th>Item</th><th>Qty</th><th>Price</th></tr>"
                b"<tr><td>Widget</td><td>5</td><td>$10.00</td></tr>"
                b"</table></body></html>")
        tables = html_extract.extract_html(html)["tables"]
        assert [t["rows"] for t in tables] == [[["Item", "Qty", "Price"],
                                                ["Widget", "5", "$10.00"]]]
        # round-3 rich model rides along: one 1x1 cell per grid slot here
        assert len(tables[0]["cells"]) == 6
        assert (tables[0]["n_rows"], tables[0]["n_cols"]) == (2, 3)

    def test_table_text_not_in_raw_text(self):
        html = (b"<html><body><p>Body text here.</p>"
                b"<table><tr><td>CellA</td></tr></table></body></html>")
        ex = html_extract.extract_html(html)
        assert ex["raw_text"] == "Body text here."

    def test_entities_and_whitespace_collapse(self):
        # entity refs resolve; all whitespace (incl. &nbsp;) collapses to ' '
        html = "<html><body><p>A &amp; B\n\n   C&nbsp;D</p></body></html>".encode()
        assert html_extract.extract_html(html)["raw_text"] == "A & B C D"

    def test_malformed_html_survives(self):
        html = b"<html><body><p>Unclosed para<div>And a div</body>"
        ex = html_extract.extract_html(html)
        assert "Unclosed para" in ex["raw_text"]

    def test_deterministic(self):
        assert html_extract.extract_html(SIMPLE) == html_extract.extract_html(SIMPLE)

    def test_role_attr_boilerplate(self):
        html = (b"<html><body><div role='navigation'><p>Nav stuff here</p></div>"
                b"<p>Real content paragraph.</p></body></html>")
        assert html_extract.extract_html(html)["raw_text"] == "Real content paragraph."


class TestGeneratorByteIdentity:
    def test_html_pages_byte_identical(self):
        n_checked = 0
        for p in pages_gen.generate_pages(60, seed=42):
            doc = document.extract_document(p["url"], p["html"], p["warc_ts"], p["lang"])
            assert doc["status"] == "ok", doc["error"]
            assert doc["raw_text"] == p["text"], (
                f"byte mismatch for {p['url']} ({p['kind']}):\n"
                f"GOT:\n{doc['raw_text']!r}\nWANT:\n{p['text']!r}")
            assert doc["title"] == p["expected_title"]
            n_checked += 1
        assert n_checked == 60

    def test_expected_fields_extracted(self):
        for p in pages_gen.generate_pages(30, seed=7):
            doc = document.extract_document(p["url"], p["html"], p["warc_ts"], p["lang"])
            got = {f["name"]: str(f["value"]) for f in doc["fields"]}
            for k, v in p["expected_fields"].items():
                assert got.get(k) == v, (p["url"], k, got.get(k), v)

    def test_generator_deterministic(self):
        a = pages_gen.generate_pages(10, seed=42)
        b = pages_gen.generate_pages(10, seed=42)
        assert [(x["url"], x["html"]) for x in a] == [(x["url"], x["html"]) for x in b]

    def test_host_skew_exists(self):
        hosts = [p["url"].split("/")[2] for p in pages_gen.generate_pages(500, seed=42)]
        counts = sorted((hosts.count(h) for h in set(hosts)), reverse=True)
        assert counts[0] >= 5 * counts[-1]  # Zipf head is much heavier


class TestPdfExtract:
    def test_roundtrip(self):
        lines = [(72.0, 72.0, "Test Document", 24.0),
                 (72.0, 150.0, "Invoice Number: INV-001", 12.0),
                 (72.0, 180.0, "Date: 2024-01-15", 12.0),
                 (72.0, 210.0, "Total: $1,234.56", 12.0)]
        pdf = pdf_text.build_pdf(lines)
        assert pdf[:5] == b"%PDF-"
        ex = pdf_text.extract_pdf(pdf)
        assert ex["title"] == "Test Document"
        assert ex["raw_text"] == ("Test Document\nInvoice Number: INV-001\n"
                                  "Date: 2024-01-15\nTotal: $1,234.56")

    def test_escaping(self):
        pdf = pdf_text.build_pdf([(72, 100, "Parens (and) \\ backslash", 12)])
        lines = pdf_text.extract_pdf_text_lines(pdf)
        assert lines[0]["text"] == "Parens (and) \\ backslash"

    def test_sniff(self):
        assert pdf_text.sniff_type(b"%PDF-1.4 etc") == "pdf"
        assert pdf_text.sniff_type(b"<!DOCTYPE html><html>") == "html"
        assert pdf_text.sniff_type(b"\x89PNG\r\n\x1a\nxxxx") == "image"
        assert pdf_text.sniff_type(b"\xff\xd8\xff\xe0") == "image"


class TestDocumentAssembly:
    def test_error_containment(self):
        doc = document.extract_document("http://x", None)
        assert doc["status"] in ("ok", "error")  # never raises
        bad = document.extract_document("http://x", b"\x00\x01binarygarbage")
        assert bad["status"] in ("ok", "error")

    def test_doc_id_deterministic(self):
        assert document.doc_id_for_url("u") == document.doc_id_for_url("u")
        assert len(document.doc_id_for_url("u")) == 64

    def test_validation_summary(self):
        p = pages_gen.make_page(3, seed=42)
        doc = document.extract_document(p["url"], p["html"], p["warc_ts"], p["lang"])
        v = doc["validation"]
        assert v["total_checks"] == v["passed_checks"] + v["failed_checks"]
        assert v["passed"] == (v["failed_checks"] == 0)

    def test_fields_fused_from_kv_and_table(self):
        # generator emits each field both as a "Key: Value" line and a table
        # row -> two sources -> status should reflect multi-source agreement
        p = pages_gen.make_page(5, seed=42)
        if p["kind"] != "html":
            p = pages_gen.make_page(6, seed=42)
        doc = document.extract_document(p["url"], p["html"], p["warc_ts"], p["lang"])
        by_name = {f["name"]: f for f in doc["fields"]}
        inv = by_name["invoice_number"]
        assert {c["source"] for c in inv["candidates"]} == {"html_kv", "html_table"}
