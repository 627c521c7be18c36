"""Real-world HTML edge cases: comments, nested tables, attribute quirks,
script content with embedded markup, deep nesting, mixed-encoding bytes."""

from horizon_ocr_python_spark.kernel import html_extract as H


def raw(html: bytes) -> str:
    return H.extract_html(html)["raw_text"]


class TestComments:
    def test_comments_ignored(self):
        html = b"<html><body><p>keep this text</p><!-- <p>ghost</p> --></body></html>"
        assert raw(html) == "keep this text"

    def test_conditional_comments_ignored(self):
        html = (b"<html><body><!--[if IE]><p>ie only junk</p><![endif]-->"
                b"<p>real content here</p></body></html>")
        assert raw(html) == "real content here"


class TestScriptsAndStyles:
    def test_script_with_embedded_markup(self):
        # CDATA-content elements: the parser must not resurface the </p>
        html = (b"<html><body><script>var s = '<p>not text</p>';</script>"
                b"<p>actual paragraph</p></body></html>")
        assert raw(html) == "actual paragraph"

    def test_style_with_selectors(self):
        html = (b"<html><body><style>p > a { color: red }</style>"
                b"<p>visible text here</p></body></html>")
        assert raw(html) == "visible text here"


class TestNestedTables:
    def test_outer_table_only(self):
        # only depth-1 tables are captured as grids; inner-table text must
        # not leak into body raw_text either
        html = (b"<html><body><p>before table</p><table>"
                b"<tr><td>A</td><td><table><tr><td>inner</td></tr></table></td></tr>"
                b"</table><p>after table</p></body></html>")
        ex = H.extract_html(html)
        assert ex["raw_text"] == "before table\nafter table"
        assert len(ex["tables"]) == 1

    def test_table_inside_boilerplate_not_in_body(self):
        html = (b"<html><body><footer><table><tr><td>footer cell</td></tr>"
                b"</table></footer><p>main text body</p></body></html>")
        ex = H.extract_html(html)
        assert ex["raw_text"] == "main text body"


class TestAttributes:
    def test_unquoted_and_weird_attrs(self):
        html = (b"<html><body><p class=lead data-x='1' checked>text with "
                b"unquoted attrs</p></body></html>")
        assert raw(html) == "text with unquoted attrs"

    def test_class_substring_not_false_positive(self):
        # 'navigator' contains 'nav' but is not a boilerplate token
        html = (b"<html><body><div class='navigator-widget-x'>"
                b"<p>should this survive?</p></div>"
                b"<p>plain one</p></body></html>")
        ex = H.extract_html(html)
        # 'widget' IS a boilerplate token joined by '-': dropped — but
        # 'navigator' alone is not:
        html2 = (b"<html><body><div class='navigator'>"
                 b"<p>survives fine here</p></div></body></html>")
        assert raw(html2) == "survives fine here"
        assert "plain one" in ex["raw_text"]


class TestStructure:
    def test_deep_nesting_no_recursion_issues(self):
        html = b"<html><body>" + b"<div>" * 300 + b"<p>deep text</p>" \
            + b"</div>" * 300 + b"</body></html>"
        assert "deep text" in raw(html)

    def test_unclosed_everything(self):
        html = b"<html><body><p>first para<p>second para<li>item"
        out = raw(html)
        assert "first para" in out and "second para" in out and "item" in out

    def test_latin1_bytes_survive(self):
        html = "<html><body><p>caf\xe9 cr\xe8me text</p></body></html>".encode("latin-1")
        out = raw(html)  # decoded with errors=replace; must not crash
        assert "text" in out

    def test_headings_hierarchy_all_kept(self):
        html = (b"<html><body><h1>One</h1><h2>Two</h2><h3>Three</h3>"
                b"<p>body text para</p></body></html>")
        ex = H.extract_html(html)
        assert ex["raw_text"] == "One\nTwo\nThree\nbody text para"
        assert ex["headings"] == ["One", "Two", "Three"]
