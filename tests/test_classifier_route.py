"""K11 classifier routing + parse (kernel/classifier_route.py) vs the
reference contract (azure/classifier.py:35-100, 350-395); expectations
mirrored from the reference's own tests (tests/test_classifier.py:88-170)."""

from __future__ import annotations

from horizon_ocr_python_spark.kernel import classifier_route as cr


class TestRoutingTables:
    def test_gpt_routing_pinned_cells(self):
        assert cr.GPT_ROUTING["simple"]["invoice"] == "gpt-4o-mini"
        assert cr.GPT_ROUTING["complex"]["bol"] == "gpt-5-mini"
        assert cr.GPT_ROUTING["medium"]["bol"] == "gpt-4.1-mini"
        assert cr.GPT_ROUTING["complex"]["invoice"] == "gpt-4.1-mini"

    def test_gpt_routing_complete(self):
        for complexity in ("simple", "medium", "complex"):
            for doc_type in ("invoice", "receipt", "bol",
                             "delivery_ticket", "other"):
                assert doc_type in cr.GPT_ROUTING[complexity]

    def test_di_routing(self):
        assert cr.DI_ROUTING["invoice"] == "prebuilt-invoice"
        assert cr.DI_ROUTING["bol"] == "prebuilt-layout"
        assert cr.DI_ROUTING["receipt"] == "prebuilt-layout"
        for doc_type in ("invoice", "receipt", "bol", "delivery_ticket",
                         "other"):
            assert doc_type in cr.DI_ROUTING

    def test_route_fallbacks(self):
        # unknown complexity -> medium row; unknown type -> default
        assert cr.route_gpt("bol", "weird") == "gpt-4.1-mini"
        assert cr.route_gpt("unknown", "simple") == "gpt-4o-mini"
        assert cr.route_di("unknown") == "prebuilt-layout"


class TestParseResponse:
    def test_valid_json(self):
        r = cr.parse_classifier_response(
            '{"type": "invoice", "complexity": "complex"}')
        assert r["document_type"] == "invoice"
        assert r["complexity"] == "complex"
        assert r["confidence"] == 0.90

    def test_markdown_fence(self):
        r = cr.parse_classifier_response(
            '```json\n{"type": "bol", "complexity": "simple"}\n```')
        assert r["document_type"] == "bol" and r["complexity"] == "simple"

    def test_json_embedded_in_text(self):
        r = cr.parse_classifier_response(
            'The document is {"type": "receipt", "complexity": "medium"}'
            ' as shown.')
        assert r["document_type"] == "receipt"

    def test_invalid_type_normalised_to_other(self):
        r = cr.parse_classifier_response(
            '{"type": "contract", "complexity": "simple"}')
        assert r["document_type"] == "other" and r["complexity"] == "simple"

    def test_invalid_complexity_normalised_to_medium(self):
        r = cr.parse_classifier_response(
            '{"type": "invoice", "complexity": "extreme"}')
        assert r["document_type"] == "invoice"
        assert r["complexity"] == "medium"

    def test_garbage_and_empty_return_default(self):
        for raw in ("not valid at all", "", None):
            r = cr.parse_classifier_response(raw)
            assert r["document_type"] == "auto"
            assert r["complexity"] == "medium"
            assert r["confidence"] == 0.0


class TestClassifyAndRoute:
    def test_routing_attached(self):
        r = cr.classify_and_route(
            '{"type": "invoice", "complexity": "complex"}')
        assert r["recommended_gpt_deployment"] == "gpt-4.1-mini"
        assert r["recommended_di_model"] == "prebuilt-invoice"

    def test_default_result_routes_to_layout(self):
        r = cr.classify_and_route("garbage")
        assert r["recommended_di_model"] == "prebuilt-layout"
        assert r["recommended_gpt_deployment"] == "gpt-4o-mini"
