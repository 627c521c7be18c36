"""C2 cost accounting for cloud calls (azure/cost_tracker.py).

The reference records every Document Intelligence / GPT call with token and
page counts, computes USD cost, caps the record list FIFO, and reports
aggregate queries + a boxed summary + a serialisable dict
(cost_tracker.py:39-340). Its pricing comes from a LIVE Azure Retail
Prices API fetch (pricing_service.py — "NO FALLBACKS", raises
PricingUnavailableError offline); that fetch is this sandbox's network
boundary. Here pricing is an INJECTED static table with a "default" key —
the exact contract the reference's own tests still import
(tests/test_cost_cache_batch.py:16-22 imports DI_COST_PER_PAGE /
GPT_COST_PER_1K_* from cost_tracker, a static-table interface its live
refactor removed; those tests pin the semantics implemented here).

At Spark scale the per-call ledger is the driver-side twin of the
engine's per-partition lineage metrics (engine/extract.extracted_metrics,
`c2_cost_rollup`): cloud calls happen on the driver/edge, partition
compute on executors; both roll up into the same cost story.
"""

from __future__ import annotations

import threading
import time
from dataclasses import asdict, dataclass
from typing import Any, Optional

# Static per-unit USD prices (public Azure list prices; "default" is the
# unknown-model rate, cost_tracker tests test_unknown_model_uses_default)
DI_COST_PER_PAGE = {
    "prebuilt-layout": 0.01,
    "prebuilt-read": 0.0015,
    "prebuilt-invoice": 0.01,
    "default": 0.01,
}
GPT_COST_PER_1K_INPUT = {
    "gpt-4o": 0.0025,
    "gpt-4o-mini": 0.00015,
    "default": 0.0025,
}
GPT_COST_PER_1K_OUTPUT = {
    "gpt-4o": 0.01,
    "gpt-4o-mini": 0.0006,
    "default": 0.01,
}


@dataclass
class APICallRecord:
    """One recorded call (cost_tracker.py:39-53)."""

    timestamp: str
    service: str                 # "doc_intelligence" | "gpt_vision"
    model: str
    pages: int = 0
    prompt_tokens: int = 0
    completion_tokens: int = 0
    latency_seconds: float = 0.0
    estimated_cost_usd: float = 0.0
    doc_id: str = ""
    cached: bool = False


def _now_iso() -> str:
    # UTC (recorded deviation: the reference stamps US-Eastern wall time)
    return time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime())


class CostTracker:
    """Thread-safe in-memory ledger with FIFO eviction at max_records."""

    def __init__(self, max_records: int = 5000,
                 di_prices: Optional[dict] = None,
                 gpt_input_prices: Optional[dict] = None,
                 gpt_output_prices: Optional[dict] = None) -> None:
        self.records: list[APICallRecord] = []
        self.max_records = max_records
        self._di = di_prices or DI_COST_PER_PAGE
        self._gin = gpt_input_prices or GPT_COST_PER_1K_INPUT
        self._gout = gpt_output_prices or GPT_COST_PER_1K_OUTPUT
        for name, table in (("di_prices", self._di),
                            ("gpt_input_prices", self._gin),
                            ("gpt_output_prices", self._gout)):
            if "default" not in table:
                raise ValueError(
                    f"{name} must carry a 'default' rate for unknown models")
        self._lock = threading.RLock()

    # -- pricing -------------------------------------------------------------

    def _di_cost(self, model: str, pages: int) -> float:
        return pages * self._di.get(model, self._di["default"])

    def _gpt_cost(self, deployment: str, prompt: int, completion: int) -> float:
        cin = self._gin.get(deployment, self._gin["default"])
        cout = self._gout.get(deployment, self._gout["default"])
        return (prompt / 1000) * cin + (completion / 1000) * cout

    # -- recording (cost_tracker.py:97-204) ----------------------------------

    def _append(self, record: APICallRecord) -> APICallRecord:
        with self._lock:
            self.records.append(record)
            if len(self.records) > self.max_records:
                del self.records[:len(self.records) - self.max_records]
        return record

    def record_di_call(self, pages: int = 1, model: str = "prebuilt-layout",
                       latency: float = 0.0, doc_id: str = "",
                       cached: bool = False) -> APICallRecord:
        cost = 0.0 if cached else self._di_cost(model, pages)
        return self._append(APICallRecord(
            timestamp=_now_iso(), service="doc_intelligence", model=model,
            pages=pages, latency_seconds=round(latency, 3),
            estimated_cost_usd=round(cost, 6), doc_id=doc_id, cached=cached))

    def record_gpt_call(self, prompt_tokens: int = 0,
                        completion_tokens: int = 0,
                        deployment: str = "gpt-4o-mini",
                        latency: float = 0.0, doc_id: str = "",
                        cached: bool = False) -> APICallRecord:
        cost = 0.0 if cached else self._gpt_cost(deployment, prompt_tokens,
                                                 completion_tokens)
        return self._append(APICallRecord(
            timestamp=_now_iso(), service="gpt_vision", model=deployment,
            prompt_tokens=prompt_tokens,
            completion_tokens=completion_tokens,
            latency_seconds=round(latency, 3),
            estimated_cost_usd=round(cost, 6), doc_id=doc_id, cached=cached))

    # -- aggregate queries (cost_tracker.py:206-262) -------------------------

    def _snapshot(self) -> list[APICallRecord]:
        with self._lock:
            return list(self.records)

    @property
    def total_calls(self) -> int:
        return len(self._snapshot())

    @property
    def total_cost_usd(self) -> float:
        return round(sum(r.estimated_cost_usd for r in self._snapshot()), 6)

    @property
    def total_di_calls(self) -> int:
        return sum(r.service == "doc_intelligence" for r in self._snapshot())

    @property
    def total_gpt_calls(self) -> int:
        return sum(r.service == "gpt_vision" for r in self._snapshot())

    @property
    def total_pages_analysed(self) -> int:
        return sum(r.pages for r in self._snapshot()
                   if r.service == "doc_intelligence")

    @property
    def total_tokens(self) -> int:
        return sum(r.prompt_tokens + r.completion_tokens
                   for r in self._snapshot() if r.service == "gpt_vision")

    @property
    def cache_hit_count(self) -> int:
        return sum(r.cached for r in self._snapshot())

    @property
    def cost_saved_by_cache(self) -> float:
        """What the cached calls WOULD have cost
        (cost_tracker.py:244-262)."""
        saved = 0.0
        for r in self._snapshot():
            if not r.cached:
                continue
            if r.service == "doc_intelligence":
                saved += self._di_cost(r.model, r.pages)
            else:
                saved += self._gpt_cost(r.model, r.prompt_tokens,
                                        r.completion_tokens)
        return round(saved, 6)

    # -- reporting (cost_tracker.py:266-333) ---------------------------------

    def _aggregates(self, records: list[APICallRecord]) -> dict[str, Any]:
        """Every aggregate from ONE snapshot — a concurrent recorder must
        not make total_calls disagree with len(records)
        (cost_tracker.py:286-291 takes the same single-snapshot approach)."""
        saved = 0.0
        for r in records:
            if not r.cached:
                continue
            if r.service == "doc_intelligence":
                saved += self._di_cost(r.model, r.pages)
            else:
                saved += self._gpt_cost(r.model, r.prompt_tokens,
                                        r.completion_tokens)
        return {
            "total_calls": len(records),
            "total_di_calls": sum(r.service == "doc_intelligence"
                                  for r in records),
            "total_gpt_calls": sum(r.service == "gpt_vision"
                                   for r in records),
            "total_pages_analysed": sum(
                r.pages for r in records if r.service == "doc_intelligence"),
            "total_tokens": sum(r.prompt_tokens + r.completion_tokens
                                for r in records
                                if r.service == "gpt_vision"),
            "cache_hits": sum(r.cached for r in records),
            "estimated_cost_usd": round(
                sum(r.estimated_cost_usd for r in records), 6),
            "cost_saved_by_cache_usd": round(saved, 6),
        }

    def summary(self) -> str:
        agg = self._aggregates(self._snapshot())
        rows = [
            ("Total API calls", agg["total_calls"]),
            ("- Doc Intelligence", agg["total_di_calls"]),
            ("- GPT Vision", agg["total_gpt_calls"]),
            ("Pages analysed (DI)", agg["total_pages_analysed"]),
            ("Tokens used (GPT)", agg["total_tokens"]),
            ("Cache hits", agg["cache_hits"]),
            ("Estimated cost (USD)", f"{agg['estimated_cost_usd']:.4f}"),
            ("Saved by cache (USD)",
             f"{agg['cost_saved_by_cache_usd']:.4f}"),
        ]
        body = "\n".join(f"| {k:<22} {str(v):>10} |" for k, v in rows)
        rule = "+" + "-" * 35 + "+"
        return "\n".join([rule, "|     Azure API Cost Summary        |",
                          rule, body, rule])

    def to_dict(self) -> dict[str, Any]:
        records = self._snapshot()
        return {**self._aggregates(records),
                "records": [asdict(r) for r in records]}

    def reset(self) -> None:
        with self._lock:
            self.records.clear()
