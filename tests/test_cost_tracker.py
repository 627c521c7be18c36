"""CostTracker (engine/cost_tracker.py) vs the reference's contract —
expectations mirrored from the reference's own tests
(tests/test_cost_cache_batch.py:32-175)."""

from __future__ import annotations

import threading

import pytest

from horizon_ocr_python_spark.engine.cost_tracker import (
    DI_COST_PER_PAGE, GPT_COST_PER_1K_INPUT, GPT_COST_PER_1K_OUTPUT,
    CostTracker)


class TestCostTracker:
    def test_empty_tracker(self):
        t = CostTracker()
        assert t.total_calls == 0 and t.total_cost_usd == 0.0
        assert t.total_di_calls == 0 and t.total_gpt_calls == 0
        assert t.total_tokens == 0 and t.cache_hit_count == 0

    def test_record_di_call(self):
        t = CostTracker()
        rec = t.record_di_call(pages=3, model="prebuilt-layout", latency=1.5)
        assert t.total_calls == 1 and t.total_di_calls == 1
        assert t.total_pages_analysed == 3
        assert rec.service == "doc_intelligence" and rec.pages == 3
        expected = 3 * DI_COST_PER_PAGE["prebuilt-layout"]
        assert rec.estimated_cost_usd == pytest.approx(expected, abs=1e-6)
        assert t.total_cost_usd == pytest.approx(expected, abs=1e-6)

    def test_record_gpt_call(self):
        t = CostTracker()
        rec = t.record_gpt_call(prompt_tokens=1000, completion_tokens=200,
                                deployment="gpt-4o-mini", latency=2.0)
        assert t.total_gpt_calls == 1 and t.total_tokens == 1200
        assert rec.service == "gpt_vision"
        expected = (GPT_COST_PER_1K_INPUT["gpt-4o-mini"]
                    + 0.2 * GPT_COST_PER_1K_OUTPUT["gpt-4o-mini"])
        assert rec.estimated_cost_usd == pytest.approx(expected, abs=1e-6)

    def test_cached_call_zero_cost(self):
        t = CostTracker()
        rec = t.record_di_call(pages=5, cached=True)
        assert rec.cached is True and rec.estimated_cost_usd == 0.0
        assert t.total_cost_usd == 0.0 and t.cache_hit_count == 1

    def test_cost_saved_by_cache(self):
        t = CostTracker()
        t.record_di_call(pages=2, model="prebuilt-layout", cached=True)
        assert t.cost_saved_by_cache == pytest.approx(
            2 * DI_COST_PER_PAGE["prebuilt-layout"], abs=1e-6)

    def test_multiple_calls(self):
        t = CostTracker()
        t.record_di_call(pages=1)
        t.record_di_call(pages=2)
        t.record_gpt_call(prompt_tokens=500, completion_tokens=100)
        assert t.total_calls == 3 and t.total_di_calls == 2
        assert t.total_gpt_calls == 1 and t.total_pages_analysed == 3

    def test_reset(self):
        t = CostTracker()
        t.record_di_call(pages=5)
        t.record_gpt_call(prompt_tokens=1000, completion_tokens=200)
        t.reset()
        assert t.total_calls == 0 and t.total_cost_usd == 0.0

    def test_summary_string(self):
        t = CostTracker()
        t.record_di_call(pages=1)
        s = t.summary()
        assert "Azure API Cost Summary" in s and "Total API calls" in s

    def test_to_dict(self):
        t = CostTracker()
        t.record_di_call(pages=1, model="prebuilt-layout", latency=1.0)
        d = t.to_dict()
        assert d["total_calls"] == 1 and d["total_di_calls"] == 1
        assert len(d["records"]) == 1
        assert d["records"][0]["service"] == "doc_intelligence"

    def test_unknown_model_uses_default(self):
        t = CostTracker()
        rec = t.record_di_call(pages=1, model="custom-model")
        assert rec.estimated_cost_usd == pytest.approx(
            DI_COST_PER_PAGE["default"], abs=1e-6)

    def test_fifo_eviction_at_cap(self):
        t = CostTracker(max_records=10)
        for i in range(25):
            t.record_di_call(pages=1, doc_id=f"d{i}")
        assert t.total_calls == 10
        assert t.records[0].doc_id == "d15"  # oldest evicted

    def test_injected_pricing(self):
        t = CostTracker(di_prices={"x": 2.0, "default": 1.0})
        assert t.record_di_call(pages=3, model="x").estimated_cost_usd == 6.0

    def test_thread_safety(self):
        t = CostTracker()
        errors = []

        def add_calls():
            try:
                for _ in range(50):
                    t.record_di_call(pages=1)
                    t.record_gpt_call(prompt_tokens=10, completion_tokens=5)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=add_calls) for _ in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors and t.total_calls == 400
