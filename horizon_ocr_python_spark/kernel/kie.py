"""Key-information extraction parsing — semantics of the reference's Donut
output parser and dict->Field flattener (docvision/kie/donut_runner.py).

These are pure string/dict functions (the reference separates them from the
torch model for the same reason); they run inside the engine's extraction
stage and are unit-tested against the reference's own expectations
(reference tests/test_pipeline.py:147-252).
"""

from __future__ import annotations

import json
import re
from typing import Any

_TAG_PATTERN = re.compile(r"<s_(\w+)>(.*?)</s_\1>", re.DOTALL)
_JSON_PATTERN = re.compile(r"\{.*\}", re.DOTALL)


def parse_kie_output(output: str) -> dict:
    """Parse a Donut-style output string into a structured dict.

    Order of attempts (donut_runner.py:179-236):
    1. embedded JSON object
    2. XML-ish `<s_key>...</s_key>` tags, recursing into nested tags and
       splitting `<sep/>`-delimited lists
    3. plain `key: value` lines (key lowercased, spaces -> underscores)
    """
    m = _JSON_PATTERN.search(output)
    if m:
        try:
            return json.loads(m.group())
        except json.JSONDecodeError:
            pass

    result: dict[str, Any] = {}
    for match in _TAG_PATTERN.finditer(output):
        key, value = match.group(1), match.group(2).strip()
        if "<" in value:
            if "<sep/>" in value:
                items = []
                for segment in value.split("<sep/>"):
                    segment = segment.strip()
                    if segment:
                        nested = parse_kie_output(segment)
                        if nested:
                            items.append(nested)
                result[key] = items if items else value
            else:
                nested = parse_kie_output(value)
                result[key] = nested if nested else value
        else:
            result[key] = value

    if not result:
        for line in output.split("\n"):
            if ":" in line:
                k, v = line.split(":", 1)
                k = k.strip().lower().replace(" ", "_")
                v = v.strip()
                if k and v:
                    result[k] = v
    return result


def looks_like_date(value: str) -> bool:
    """Date-shape check used for data-type inference (donut_runner.py:349-358).

    Note: stricter than fuse.looks_like_date_value — this one requires
    2-digit day/month groups in the slash/dash forms.
    """
    patterns = [
        r"\d{4}-\d{2}-\d{2}",
        r"\d{2}/\d{2}/\d{4}",
        r"\d{2}-\d{2}-\d{4}",
        r"\w+ \d{1,2}, \d{4}",
    ]
    return any(re.search(p, value) for p in patterns)


def looks_like_currency(value: str) -> bool:
    """Currency-shape check for data-type inference (donut_runner.py:360-368)."""
    patterns = [
        r"[$€£¥]\s*[\d,]+\.?\d*",
        r"[\d,]+\.?\d*\s*[$€£¥]",
        r"\d+[.,]\d{2}",
    ]
    return any(re.search(p, value) for p in patterns)


def infer_data_type(value: Any) -> str:
    """Data-type inference order: number -> date -> currency -> string
    (donut_runner.py:311-319)."""
    if isinstance(value, bool):
        return "string"
    if isinstance(value, (int, float)):
        return "number"
    s = str(value)
    if looks_like_date(s):
        return "date"
    if looks_like_currency(s):
        return "currency"
    return "string"


def status_from_confidence(confidence: float) -> str:
    """>=0.8 confident, >=0.5 single_source, else uncertain
    (donut_runner.py:330-336)."""
    if confidence >= 0.8:
        return "confident"
    if confidence >= 0.5:
        return "single_source"
    return "uncertain"


def flatten_to_fields(data: dict, confidence: float, page_num: int = 1,
                      source: str = "html_kv", prefix: str = "") -> list[dict]:
    """Recursively flatten a nested dict into Field dicts
    (donut_runner.py:261-345).

    Nested dicts -> dotted names `a.b`; lists -> indexed `a[i]` (and `a[i].b`
    for dicts inside lists). Each field carries one candidate from `source`.
    """
    fields: list[dict] = []
    for key, value in data.items():
        field_name = f"{prefix}{key}" if prefix else key
        if isinstance(value, dict):
            fields.extend(flatten_to_fields(value, confidence, page_num, source,
                                            f"{field_name}."))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, dict):
                    fields.extend(flatten_to_fields(item, confidence, page_num, source,
                                                    f"{field_name}[{i}]."))
                else:
                    fields.append(_create_field(f"{field_name}[{i}]", item,
                                                confidence, page_num, source))
        else:
            fields.append(_create_field(field_name, value, confidence, page_num, source))
    return fields


def _create_field(name: str, value: Any, confidence: float, page_num: int,
                  source: str) -> dict:
    """Field constructor with type inference + status (donut_runner.py:303-345)."""
    return {
        "name": name,
        "value": value,
        "data_type": infer_data_type(value),
        "confidence": confidence,
        "status": status_from_confidence(confidence),
        "page": page_num,
        "bbox": None,
        "chosen_source": source,
        "candidates": [{
            "source": source, "value": value, "confidence": confidence,
            "page": page_num, "bbox": None, "metadata": {},
        }],
        "validators": [],
    }


_KV_LINE_RE = re.compile(r"^\s*([A-Za-z][A-Za-z0-9 .#/_-]{0,40}?)\s*:\s*(\S.*)$")


def extract_kv_fields(lines: list[str], confidence: float = 0.9,
                      page_num: int = 1, source: str = "html_kv") -> list[dict]:
    """Extract `Key: Value` fields from content lines.

    This is the deterministic text-page analogue of the reference's KIE stage:
    the same simple key-value contract its parser falls back to
    (donut_runner.py:222-233), applied line-by-line to extracted main-content
    text. Keys are normalized exactly as there (lower, spaces->underscore).
    First occurrence of a key wins (insertion order preserved for fusion).
    """
    data: dict[str, Any] = {}
    for line in lines:
        m = _KV_LINE_RE.match(line)
        if not m:
            continue
        key = m.group(1).strip().lower().replace(" ", "_")
        value = m.group(2).strip()
        if key and value and key not in data:
            data[key] = value
    return flatten_to_fields(data, confidence, page_num, source)
