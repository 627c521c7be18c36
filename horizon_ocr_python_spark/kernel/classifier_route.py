"""K11 doc-type classification: the deterministic routing + parse half.

The reference's DocumentClassifier (azure/classifier.py) makes one GPT
call per document; everything around that call is pure and local:

- the routing tables mapping (doc_type, complexity) -> GPT deployment and
  doc_type -> Azure DI model (classifier.py:61-93)
- the response parser: markdown-fence strip, embedded-JSON fallback,
  type/complexity validation with defaults, fixed 0.90 confidence on a
  successful parse, all-defaults result on garbage (classifier.py:350-390)

Those halves are implemented here (the GPT call itself is the cloud
boundary; `o2_route_dispatch` carries the dataset form of the routing).
"""

from __future__ import annotations

import json
import re

# (complexity -> doc_type -> GPT deployment), classifier.py:61-83
GPT_ROUTING = {
    "simple": {
        "invoice": "gpt-4o-mini", "receipt": "gpt-4o-mini",
        "bol": "gpt-4o-mini", "delivery_ticket": "gpt-4o-mini",
        "other": "gpt-4o-mini",
    },
    "medium": {
        "invoice": "gpt-4o-mini", "receipt": "gpt-4o-mini",
        "bol": "gpt-4.1-mini",  # BOLs are typically denser
        "delivery_ticket": "gpt-4o-mini", "other": "gpt-4o-mini",
    },
    "complex": {
        "invoice": "gpt-4.1-mini", "receipt": "gpt-4o-mini",
        "bol": "gpt-5-mini", "delivery_ticket": "gpt-4.1-mini",
        "other": "gpt-4.1-mini",
    },
}

# doc_type -> Azure DI model, classifier.py:86-93
DI_ROUTING = {
    "invoice": "prebuilt-invoice", "receipt": "prebuilt-layout",
    "bol": "prebuilt-layout", "delivery_ticket": "prebuilt-layout",
    "other": "prebuilt-layout",
}

VALID_TYPES = frozenset({"invoice", "bol", "receipt", "delivery_ticket",
                         "other"})
VALID_COMPLEXITIES = frozenset({"simple", "medium", "complex"})

# parse-failure defaults = ClassificationResult() (classifier.py:35-50)
DEFAULT_RESULT = {"document_type": "auto", "complexity": "medium",
                  "confidence": 0.0}


def parse_classifier_response(raw: str) -> dict:
    """Classifier JSON response -> validated result dict
    (classifier.py:350-390): strip ```/```json fences, fall back to the
    first {...} embedded in prose, normalise unknown type -> other and
    unknown complexity -> medium, confidence 0.90 on success; garbage
    yields the all-defaults result (document_type "auto", confidence 0)."""
    text = (raw or "").strip()
    if text.startswith("```"):
        text = re.sub(r"^```(?:json)?\s*", "", text)
        text = re.sub(r"\s*```$", "", text).strip()
    data = None
    try:
        data = json.loads(text)
    except (ValueError, TypeError):
        match = re.search(r"\{.*\}", text, re.DOTALL)
        if match:
            try:
                data = json.loads(match.group())
            except ValueError:
                data = None
    if not isinstance(data, dict):
        return dict(DEFAULT_RESULT)
    doc_type = str(data.get("type", "other")).lower().strip()
    complexity = str(data.get("complexity", "medium")).lower().strip()
    return {
        "document_type": doc_type if doc_type in VALID_TYPES else "other",
        "complexity": (complexity if complexity in VALID_COMPLEXITIES
                       else "medium"),
        "confidence": 0.90,
    }


def route_gpt(doc_type: str, complexity: str,
              default: str = "gpt-4o-mini") -> str:
    """(doc_type, complexity) -> GPT deployment (classifier.py:392-395;
    unknown complexity falls back to the medium row, unknown type to the
    caller's default deployment)."""
    row = GPT_ROUTING.get(complexity, GPT_ROUTING["medium"])
    return row.get(doc_type, default)


def route_di(doc_type: str) -> str:
    """doc_type -> Azure DI model (classifier.py:99-100; default
    prebuilt-layout)."""
    return DI_ROUTING.get(doc_type, "prebuilt-layout")


def classify_and_route(raw_response: str) -> dict:
    """Full local half: parse the (recorded) classifier response and attach
    the routing recommendations, the shape classifier.classify() returns
    after its GPT call (classifier.py:96-100)."""
    result = parse_classifier_response(raw_response)
    result["recommended_gpt_deployment"] = route_gpt(
        result["document_type"], result["complexity"])
    result["recommended_di_model"] = route_di(result["document_type"])
    return result
