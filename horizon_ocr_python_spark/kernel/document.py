"""Per-document extraction: bytes -> Document dict.

This is the kernel's top-level function — the analogue of the reference's
DocumentProcessor.process (pipeline/orchestrator.py:411-571) with the same
output contract (JSON_SCHEMA.md:5-18 top-level keys: id, metadata,
page_count, pages, tables, fields, validation) minus the image-only stages.

Stage order per page (orchestrator.py:631-816): parse/segment -> layout
classify -> reading order -> raw_text -> KIE -> (doc level) fuse -> validate
-> assemble. Determinism deviations from the reference, per SURVEY §7.5:
- id = sha256(url) instead of uuid (types.py:140)
- processed_at = the row's warc_ts instead of wall clock (types.py:282)
- DateValidator 'now' is injectable
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from typing import Any, Optional

from . import fuse as fuse_mod
from . import html_extract, kie, pdf_text, validators

ENGINE_VERSION = "0.1.0"


def doc_id_for_url(url: str) -> str:
    """Deterministic document id: sha256(url) hex (replaces uuid,
    types.py:140; same content-hash idea as the reference's upload dedup)."""
    return hashlib.sha256(url.encode("utf-8")).hexdigest()


def _validation_summary(check_results: list[dict]) -> dict:
    """Roll-up (orchestrator.py:1349-1372): counts + issues; passed iff no
    failed checks."""
    failed = [r for r in check_results if not r["passed"]]
    return {
        "passed": len(failed) == 0,
        "total_checks": len(check_results),
        "passed_checks": len(check_results) - len(failed),
        "failed_checks": len(failed),
        "issues": [r.get("message", r["name"]) for r in failed],
    }


def _apply_validator_status(fields: list[dict], now: Optional[datetime]) -> list[dict]:
    """Run auto-selected validators per field and update status
    (orchestrator.py:1304-1347): all passed & conf>=0.5 -> validated;
    any failed -> validation_failed."""
    for f in fields:
        results = validators.run_validators(f["name"], f["data_type"], f["value"], now=now)
        f["validators"] = results
        if results:
            if all(r["passed"] for r in results) and f["confidence"] >= 0.5:
                f["status"] = "validated"
            elif any(not r["passed"] for r in results):
                f["status"] = "validation_failed"
    return fields


def extract_document(url: str, payload: bytes, warc_ts: Any = None,
                     lang: str = "", now: Optional[datetime] = None,
                     fusion_strategy: str = "weighted_vote") -> dict:
    """Extract one document. Never raises: failures are contained into
    status/error per the reference's ProcessingResult contract
    (types.py:317-323) — a failed doc must not kill a task (SURVEY §4)."""
    try:
        return _extract(url, payload, warc_ts, lang, now, fusion_strategy)
    except Exception as exc:  # noqa: BLE001 — containment boundary
        return {
            "id": doc_id_for_url(url),
            "status": "error",
            "error": f"{type(exc).__name__}: {exc}",
            "metadata": _metadata(url, payload, "unknown", warc_ts, lang),
            "title": "",
            "page_count": 0,
            "pages": [],
            "tables": [],
            "fields": [],
            "validation": _validation_summary([]),
            "raw_text": "",
        }


def _metadata(url: str, payload: bytes, file_type: str, warc_ts: Any, lang: str) -> dict:
    return {
        "url": url,
        "filename": url.rsplit("/", 1)[-1] or url,
        "file_type": file_type,
        "file_size_bytes": len(payload) if payload is not None else 0,
        "processed_at": str(warc_ts) if warc_ts is not None else "",
        "lang": lang or "",
        "version": ENGINE_VERSION,
    }


def _extract(url: str, payload: bytes, warc_ts: Any, lang: str,
             now: Optional[datetime], fusion_strategy: str) -> dict:
    if payload is None:
        payload = b""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    file_type = pdf_text.sniff_type(payload)

    if file_type == "pdf":
        ex = pdf_text.extract_pdf(payload)
        content_lines = [ln["text"] for ln in ex["lines"]]
        kv_lines = content_lines
        tables_rows: list[dict] = []
        regions = [{"type": "text", "text": ln["text"], "x": ln["x"], "y": ln["y"]}
                   for ln in ex["lines"]]
    elif file_type == "image":
        # PNG decodes for real (kernel.png); without OCR model weights the
        # text stays empty — exactly the reference's no-weights fallback
        # (trocr.py model_loaded gate). Readability metadata is computed
        # from the decoded pixels (P9).
        ex = {"title": "", "raw_text": "", "tables": []}
        content_lines = []
        kv_lines = []
        tables_rows = []
        regions = []
        try:
            from . import multimodal, preprocess

            img = multimodal.decode_image(payload)
            readability, issues = preprocess.assess_readability(img)
            regions = [{"type": "image", "text": "",
                        "x": 0.0, "y": 0.0,
                        "width": float(img.shape[1]),
                        "height": float(img.shape[0]),
                        "readability": readability}]
        except NotImplementedError:
            pass  # non-PNG formats: metadata-only (header parse upstream)
    else:
        hx = html_extract.extract_html(payload)
        ex = {"title": hx["title"], "raw_text": hx["raw_text"], "tables": hx["tables"]}
        content_lines = [b["text"] for b in hx["content_blocks"]]
        # KV fields come from body blocks only: headings routinely contain
        # colons ("Document 12: ...") and would produce junk fields
        kv_lines = [b["text"] for b in hx["content_blocks"]
                    if b["role"] in ("paragraph", "list_item")]
        tables_rows = hx["tables"]
        regions = [{"type": b["role"], "text": b["text"], "index": b["index"]}
                   for b in hx["blocks"]]

    # KIE: key-value fields from content lines (kv source), plus table-derived
    # fields from 2-column tables (label/value shape -> html_table source)
    kv_fields = kie.extract_kv_fields(kv_lines, confidence=0.9,
                                      page_num=1, source="html_kv")
    table_fields: list[dict] = []
    for t in tables_rows:
        rows = t.get("rows", [])
        if rows and all(len(r) == 2 for r in rows):
            data = {}
            for k, v in rows:
                key = k.strip().lower().replace(" ", "_")
                if key and v and key not in data:
                    data[key] = v.strip()
            table_fields.extend(kie.flatten_to_fields(
                data, confidence=0.85, page_num=1, source="html_table"))

    fields = fuse_mod.fuse_fields([kv_fields, table_fields], strategy=fusion_strategy)
    fields = _apply_validator_status(fields, now)

    field_checks = [r for f in fields for r in f.get("validators", [])]
    consistency = validators.validate_document_consistency(
        [{"name": f["name"], "value": f["value"]} for f in fields])
    validation = _validation_summary(field_checks + consistency)

    page = {
        "number": 1,
        "metadata": {"width": 0, "height": 0, "content_type": file_type,
                     "readability": "good", "readability_issues": []},
        "layout_regions": regions,
        "text_lines": [{"text": t} for t in content_lines],
        "tables": tables_rows,
        "raw_text": ex["raw_text"],
    }

    return {
        "id": doc_id_for_url(url),
        "status": "ok",
        "error": "",
        "metadata": _metadata(url, payload, file_type, warc_ts, lang),
        "title": ex["title"],
        "page_count": 1,
        "pages": [page],
        "tables": tables_rows,
        "fields": fields,
        "validation": validation,
        "raw_text": ex["raw_text"],
    }
