"""Round-5 fuzz: the new surfaces never raise on adversarial input.

- azure_map over structurally-arbitrary recorded-JSON responses (None
  fields, short polygons, negative offsets, out-of-range confidences,
  garbage numeric types) — the mapping is a data-plane function; a
  malformed recorded response must degrade, not kill a task.
- artifacts.document_artifacts over arbitrary payload bytes — it wraps the
  contained extract_document and must stay contained end-to-end (a
  garbage doc still yields its summary row).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from horizon_ocr_python_spark.kernel import artifacts, azure_map

_num = st.one_of(st.none(), st.integers(-5, 5000),
                 st.floats(allow_nan=False, allow_infinity=False,
                           min_value=-1e6, max_value=1e6),
                 st.just("NaN-ish"), st.just(10**12))
_poly = st.one_of(st.none(), st.just("junk"), st.lists(
    st.one_of(st.floats(0, 100, allow_nan=False), st.none(),
              st.just("x")), max_size=10))
_span = st.fixed_dictionaries({}, optional={"offset": _num, "length": _num})
_text = st.text(max_size=12)
# content fields in recorded JSON can carry non-string junk
_content = st.one_of(st.none(), _text, st.integers(-9, 9))

_word = st.fixed_dictionaries({}, optional={
    "content": _content,
    "polygon": _poly,
    "span": st.one_of(st.none(), _span),
    "confidence": _num,
})
_line = st.fixed_dictionaries({}, optional={
    "content": _content,
    "polygon": _poly,
    "spans": st.one_of(st.none(), st.lists(st.one_of(_span, st.none(), st.just('junk')), max_size=2)),
})
_region = st.fixed_dictionaries({}, optional={
    "pageNumber": _num, "polygon": _poly})
_page = st.fixed_dictionaries({}, optional={
    "pageNumber": _num, "width": _num, "height": _num,
    "unit": st.one_of(st.none(), st.just("inch")),
    "lines": st.one_of(st.none(), st.lists(st.one_of(_line, st.none(), st.just('junk')), max_size=3)),
    "words": st.one_of(st.none(), st.lists(st.one_of(_word, st.none(), st.just('junk')), max_size=4)),
})
_cell = st.fixed_dictionaries({}, optional={
    "rowIndex": _num, "columnIndex": _num, "rowSpan": _num,
    "columnSpan": _num, "kind": st.one_of(st.none(), _text),
    "content": _content,
    "boundingRegions": st.one_of(st.none(), st.lists(st.one_of(_region, st.none(), st.just('junk')), max_size=2)),
})
_table = st.fixed_dictionaries({}, optional={
    "rowCount": _num, "columnCount": _num,
    "cells": st.one_of(st.none(), st.lists(st.one_of(_cell, st.none(), st.just('junk')), max_size=4)),
    "boundingRegions": st.one_of(st.none(), st.lists(st.one_of(_region, st.none(), st.just('junk')), max_size=2)),
})
_para = st.fixed_dictionaries({}, optional={
    "role": st.one_of(st.none(), _text, st.just("sectionHeading")),
    "content": _content,
    "boundingRegions": st.one_of(st.none(), st.lists(st.one_of(_region, st.none(), st.just('junk')), max_size=2)),
})
_style = st.fixed_dictionaries({}, optional={
    "spans": st.one_of(st.none(), st.lists(st.one_of(_span, st.none(), st.just('junk')), max_size=2)),
    "fontWeight": st.one_of(st.none(), st.just("bold"), _text),
    "fontStyle": st.one_of(st.none(), st.just("italic")),
    "isHandwritten": st.one_of(st.none(), st.booleans()),
})
_response = st.fixed_dictionaries({}, optional={
    "content": st.one_of(st.none(), _text, st.integers(-9, 9)),
    "pages": st.one_of(st.none(), st.lists(st.one_of(_page, st.none(), st.just('junk')), max_size=2)),
    "tables": st.one_of(st.none(), st.lists(st.one_of(_table, st.none(), st.just('junk')), max_size=2)),
    "paragraphs": st.one_of(st.none(), st.lists(st.one_of(_para, st.none(), st.just('junk')), max_size=2)),
    "styles": st.one_of(st.none(), st.lists(st.one_of(_style, st.none(), st.just('junk')), max_size=2)),
})


class TestAzureMapFuzz:
    @given(_response)
    @settings(max_examples=120, deadline=None)
    def test_map_azure_response_total(self, resp):
        pages = azure_map.map_azure_response(resp)
        for p in pages:
            for tl in p["text_lines"]:
                assert 0.0 <= tl["confidence"] <= 1.0
                x1, y1, x2, y2 = tl["bbox"]
                assert x1 <= x2 and y1 <= y2
            for t in p["tables"]:
                # rows matrix shape always (n_rows, n_cols)
                assert len(t["rows"]) == t["n_rows"]
                assert all(len(r) == t["n_cols"] for r in t["rows"])
            for r in p["layout_regions"]:
                assert r["confidence"] == 0.95

    @given(st.lists(st.fixed_dictionaries(
        {"text": _text},
        optional={"bbox": st.one_of(
            st.none(), st.tuples(*[st.floats(0, 100, allow_nan=False)] * 4))}),
        max_size=4),
        st.one_of(st.none(), st.lists(st.one_of(_style, st.none(), st.just('junk')), max_size=3)),
        st.text(max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_apply_azure_styles_total(self, lines, styles, full_text):
        out = azure_map.apply_azure_styles(lines, styles or [], full_text)
        for ln in out:
            if not ln.get("text"):
                continue
            st_ = ln["style"]
            assert st_["source"] in ("azure_detected", "estimated")
            assert 6.0 <= st_["font_size"] <= 72.0 or st_["font_size"] == 11.0


class TestArtifactsFuzz:
    @given(st.binary(max_size=400))
    @settings(max_examples=40, deadline=None)
    def test_document_artifacts_contained(self, payload):
        rows = artifacts.document_artifacts("https://x/fuzz", payload)
        # the summary row always exists, whatever the payload
        assert any(r["kind"] == "summary" for r in rows)
        for r in rows:
            assert isinstance(r["payload"], bytes)
