"""KIE parse/flatten tests — ported from reference tests/test_pipeline.py:147-252."""

from horizon_ocr_python_spark.kernel import kie


class TestParseOutput:
    def test_xml_tag_form(self):
        out = kie.parse_kie_output("<s_invoice_no>12345</s_invoice_no>")
        assert out == {"invoice_no": "12345"}

    def test_multiple_tags(self):
        out = kie.parse_kie_output(
            "<s_invoice_no>INV-001</s_invoice_no><s_total>$1,234.56</s_total>")
        assert out == {"invoice_no": "INV-001", "total": "$1,234.56"}

    def test_sep_delimited_line_items(self):
        raw = ("<s_items>"
               "<s_item_desc>Widget</s_item_desc><s_item_qty>5</s_item_qty>"
               "<sep/>"
               "<s_item_desc>Gadget</s_item_desc><s_item_qty>2</s_item_qty>"
               "</s_items>")
        out = kie.parse_kie_output(raw)
        assert out == {"items": [
            {"item_desc": "Widget", "item_qty": "5"},
            {"item_desc": "Gadget", "item_qty": "2"},
        ]}

    def test_nested_tags(self):
        raw = "<s_header><s_invoice_no>42</s_invoice_no></s_header>"
        out = kie.parse_kie_output(raw)
        assert out == {"header": {"invoice_no": "42"}}

    def test_json_form(self):
        out = kie.parse_kie_output('prefix {"total": "100.00"} suffix')
        assert out == {"total": "100.00"}

    def test_key_value_lines(self):
        out = kie.parse_kie_output("Invoice Number: INV-001\nTotal Amount: $99")
        assert out == {"invoice_number": "INV-001", "total_amount": "$99"}

    def test_empty(self):
        assert kie.parse_kie_output("") == {}


class TestFlatten:
    def test_nested_dict_dotted(self):
        fields = kie.flatten_to_fields(
            {"header": {"invoice_no": "42"}}, confidence=0.9)
        assert [f["name"] for f in fields] == ["header.invoice_no"]

    def test_list_indexed(self):
        fields = kie.flatten_to_fields(
            {"items": [{"item_desc": "Widget"}, {"item_desc": "Gadget"}]},
            confidence=0.9)
        assert [f["name"] for f in fields] == \
            ["items[0].item_desc", "items[1].item_desc"]

    def test_scalar_list(self):
        fields = kie.flatten_to_fields({"tags": ["a", "b"]}, confidence=0.9)
        assert [f["name"] for f in fields] == ["tags[0]", "tags[1]"]

    def test_full_invoice_shape(self):
        # reference expected names: header.invoice_no, items[0].item_desc,
        # summary.total_gross_worth (tests/test_pipeline.py:147-252)
        data = {
            "header": {"invoice_no": "INV-7"},
            "items": [{"item_desc": "Bolt", "item_qty": "9"}],
            "summary": {"total_gross_worth": "$10.00"},
        }
        fields = kie.flatten_to_fields(data, confidence=0.85)
        names = [f["name"] for f in fields]
        assert names == ["header.invoice_no", "items[0].item_desc",
                         "items[0].item_qty", "summary.total_gross_worth"]

    def test_data_type_inference(self):
        fields = {f["name"]: f for f in kie.flatten_to_fields({
            "n": 5, "d": "2024-01-15", "c": "$1,234.56", "s": "hello",
        }, confidence=0.9)}
        assert fields["n"]["data_type"] == "number"
        assert fields["d"]["data_type"] == "date"
        assert fields["c"]["data_type"] == "currency"
        assert fields["s"]["data_type"] == "string"

    def test_status_from_confidence(self):
        # donut_runner.py:330-336
        assert kie.status_from_confidence(0.85) == "confident"
        assert kie.status_from_confidence(0.8) == "confident"
        assert kie.status_from_confidence(0.6) == "single_source"
        assert kie.status_from_confidence(0.3) == "uncertain"


class TestKVExtraction:
    def test_extract_kv_fields(self):
        lines = ["Some intro text here", "Invoice Number: INV-001",
                 "Date: 2024-01-15", "Total: $1,234.56"]
        fields = {f["name"]: f for f in kie.extract_kv_fields(lines)}
        assert fields["invoice_number"]["value"] == "INV-001"
        assert fields["date"]["value"] == "2024-01-15"
        assert fields["date"]["data_type"] == "date"
        assert fields["total"]["value"] == "$1,234.56"
        assert fields["total"]["data_type"] == "currency"

    def test_first_occurrence_wins(self):
        fields = kie.extract_kv_fields(["Total: $1", "Total: $2"])
        assert len(fields) == 1 and fields[0]["value"] == "$1"

    def test_non_kv_lines_skipped(self):
        assert kie.extract_kv_fields(["no colon here", ": starts with colon"]) == []
