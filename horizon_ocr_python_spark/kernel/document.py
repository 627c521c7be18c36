"""Per-document extraction: bytes -> Document dict.

This is the kernel's top-level function — the analogue of the reference's
DocumentProcessor.process (pipeline/orchestrator.py:411-571) with the same
output contract (JSON_SCHEMA.md:5-18 top-level keys: id, metadata,
page_count, pages, tables, fields, validation) minus the image-only stages.

Stage order (orchestrator.py:497-522): per-page loop (parse/segment ->
layout classify -> reading order -> raw_text -> KIE per page) -> doc-level
fuse across the per-page field lists -> spatial anchoring -> validate ->
assemble. Multi-page PDFs fan out exactly like the reference's
`for page_num, page_image in enumerate(page_images, 1)` loop.

Determinism deviations from the reference, per SURVEY §7.5:
- id = sha256(url) instead of uuid (types.py:140)
- processed_at = the row's warc_ts instead of wall clock (types.py:282)
- DateValidator 'now' is injectable
- PDF word boxes are deterministic width estimates (no font metrics in this
  container): advance = 0.6 * font_size per char, Helvetica-average
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from typing import Any, Optional

from . import anchor as anchor_mod
from . import fuse as fuse_mod
from . import html_extract, kie, pdf_text, reading_order, validators

ENGINE_VERSION = "0.2.0"

AVG_CHAR_W = 0.6  # average Helvetica advance as a fraction of font size


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


def _normalized_value(f: dict, results: list[dict]) -> Optional[str]:
    """Per-field normalized_value (types.py:224 "e.g. date -> ISO format";
    contract pinned by the reference's own fixture, tests/test_markdown.py:
    131-146: string "12345" -> "12345", currency "$500.00" -> "500.00"):

    - date  -> ISO YYYY-MM-DD from the date validator's parse
               (normalize_date, kie/validators.py:281-286)
    - currency/number -> parsed amount from the amount validator
               (AmountValidator._parse_amount, kie/validators.py:96-130),
               2-decimal string per the fixture
    - other types -> the value unchanged
    A failed normalizing parse yields None (no normalized form exists).
    """
    value = f["value"]
    if value is None:
        return None
    dt = f.get("data_type", "string")
    if dt == "date":
        for r in results:
            if r["name"] == "date":
                return r.get("normalized")  # None when the parse failed
        return validators.normalize_date(str(value))
    if dt in ("currency", "number"):
        for r in results:
            if r["name"] == "amount":
                p = r.get("parsed_value")
                return f"{p:.2f}" if p is not None else None
        p = validators.parse_amount(value)
        return f"{p:.2f}" if p is not None else None
    return str(value)


def _apply_validator_status(fields: list[dict], now: Optional[datetime],
                            low_confidence: float = 0.5) -> list[dict]:
    """Run auto-selected validators per field, update status
    (orchestrator.py:1304-1347): all passed & conf >= thresholds.low_confidence
    -> validated; any failed -> validation_failed. Also writes the per-field
    normalized_value (types.py:224) from the validators' parses."""
    for f in fields:
        results = validators.run_validators(f["name"], f["data_type"], f["value"], now=now)
        f["validators"] = results
        f["normalized_value"] = _normalized_value(f, results)
        if results:
            if all(r["passed"] for r in results) and f["confidence"] >= low_confidence:
                f["status"] = "validated"
            elif any(not r["passed"] for r in results):
                f["status"] = "validation_failed"
    return fields


def _resolve_settings(config: Optional[dict], fusion_strategy: str) -> dict:
    """Flatten the C7 EngineConfig dict into the knobs this kernel consumes.
    Every validated section reaches the stage it governs — HSP_* overrides
    must never silently no-op."""
    cfg = config or {}
    fus = cfg.get("fusion") or {}
    thr = cfg.get("thresholds") or {}
    extr = cfg.get("extraction") or {}
    # user-supplied weights MERGE over the kernel defaults (round-4 ADVICE):
    # a config written before a new kernel source existed must not silently
    # demote that source to the unknown-source weight — explicit keys still
    # override, missing keys keep their calibrated defaults
    user_weights = fus.get("source_weights") or None
    source_weights = ({**fuse_mod.DEFAULT_SOURCE_WEIGHTS, **user_weights}
                      if user_weights else None)
    return {
        "strategy": fus.get("strategy", fusion_strategy),
        "min_confidence": fus.get("min_confidence", fuse_mod.MIN_CONFIDENCE),
        "validator_bonus": fus.get("validator_bonus", fuse_mod.VALIDATOR_BONUS),
        "source_weights": source_weights,
        "low_confidence": thr.get("low_confidence", 0.5),
        "min_block_chars": extr.get("min_block_chars"),
        "max_link_density": extr.get("max_link_density"),
        "min_text_density": extr.get("min_text_density") or None,
        # raster-path knobs (kernel.config.Thresholds docs the calibration)
        "glyph_reocr_confidence": thr.get("glyph_reocr_confidence", 0.90),
        "image_text_gate": thr.get("image_text_gate", IMAGE_TEXT_GATE),
        "picture_floor": thr.get("picture_floor", PICTURE_FLOOR),
        "min_image_text_chars": thr.get("min_image_text_chars",
                                        MIN_IMAGE_TEXT_CHARS),
    }


def extract_document(url: str, payload: bytes, warc_ts: Any = None,
                     lang: str = "", now: Optional[datetime] = None,
                     fusion_strategy: str = "weighted_vote",
                     config: Optional[dict] = None) -> dict:
    """Extract one document. Never raises: failures are contained into
    status/error per the reference's ProcessingResult contract
    (types.py:317-323) — a failed doc must not kill a task (SURVEY §4).

    `config` is an EngineConfig.to_dict() (kernel.config); explicit
    `fusion_strategy` is the round-1 API and acts as the default when the
    config carries no fusion.strategy.
    """
    try:
        return _extract(url, payload, warc_ts, lang, now,
                        _resolve_settings(config, fusion_strategy))
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


def _pdf_line_struct(ln: dict) -> dict:
    """PDF line -> TextLine dict with word boxes (types.py:129-149).

    The generated subset has no per-word positions, so word boxes are
    deterministic advance estimates: cursor starts at the line x, each char
    advances AVG_CHAR_W * font_size. Box height is one em (baseline at y)."""
    size = float(ln.get("font_size", 12.0))
    x, y = float(ln["x"]), float(ln["y"])
    step = AVG_CHAR_W * size
    words = []
    cursor = x
    for w in ln["text"].split(" "):
        if w:
            words.append({"text": w,
                          "bbox": (cursor, y - size, cursor + step * len(w), y),
                          "confidence": 1.0})
        cursor += step * (len(w) + 1)
    style = None
    if ln.get("font_name"):
        style = {"font_name": ln["font_name"],
                 "font_size": size,
                 "bold": bool(ln.get("bold", False)),
                 "italic": bool(ln.get("italic", False)),
                 "color": ln.get("color", "#000000"),
                 "source": "pdf_native",
                 "confidence": 0.9}
    return {
        "text": ln["text"],
        "page": int(ln.get("page", 1)),
        "bbox": (x, y - size, x + step * len(ln["text"]), y),
        "font_size": size,
        "words": words,
        # native text layer: certain by construction (types.py:138-148 —
        # the observables the reference's TextLine carries)
        "confidence": 1.0,
        "source": "pdf_text",
        "content_type": "printed",
        "style": style,
    }


def build_reconstruction(pages: list[dict], fields: list[dict]) -> dict:
    """R1 flat view embedded in the JSON output (orchestrator.py:1387-1391
    via io/reconstruction.py:136-250): per-page dims + text elements (with
    bold flag) deduped on (text, y-band) and sorted in reading order, flat
    table grids (page/rows/cols/cells — geometry zeroed when the source has
    none, reconstruction.py _bbox_to_coords(None) behavior), + fields
    summary."""
    out_pages = [{"page": p["number"],
                  "width": p["metadata"]["width"],
                  "height": p["metadata"]["height"]} for p in pages]
    elements = []
    for p in pages:
        for tl in p["text_lines"]:
            text = (tl.get("text") or "").strip()
            if not text:
                continue
            b = tl.get("bbox")
            x, y, w, h = ((float(b[0]), float(b[1]),
                           float(b[2]) - float(b[0]), float(b[3]) - float(b[1]))
                          if b else (0.0, 0.0, 0.0, 0.0))
            st = tl.get("style") or {}
            elements.append({"type": "text", "page": p["number"], "text": text,
                             "x": x, "y": y, "width": w, "height": h,
                             "font_size": tl.get("font_size"),
                             "bold": bool(st.get("bold", False))})
    elements = reading_order.dedup_elements(elements)
    elements = reading_order.sort_reading_order(elements)
    table_grids = []
    for p in pages:
        for t in p.get("tables", []):
            rows = t.get("rows", [])
            n_cols = max((len(r) for r in rows), default=0)
            table_grids.append({
                "page": p["number"],
                "rows": len(rows), "cols": n_cols,
                "cells": [{"row": ri, "col": ci, "text": cell}
                          for ri, row in enumerate(rows)
                          for ci, cell in enumerate(row)],
            })
    return {
        "version": "1.0",
        "pages": out_pages,
        "elements": elements,
        "tables": table_grids,
        "fields_summary": {f["name"]: f["value"] for f in fields},
    }


# normalized-view key split (JSON_SCHEMA.md:360-395 rule: "Never mix header
# fields with line-item fields"; totals keys per the totals block)
_TOTALS_KEYS = {"subtotal", "tax", "tax_amount", "total", "total_amount"}


def build_normalized(fields: list[dict], tables_rows: list[dict]) -> dict:
    """Deterministic `normalized` business view (JSON_SCHEMA.md:360-395).

    The reference produces this block only via GPT-Vision KIE (K10,
    azure/gpt_vision_kie.py:51-135 — cloud-scoped out per SURVEY §7.1);
    this is the deterministic assembly of the same contract from what the
    pipeline already extracted:

    - header: fused fields that are NOT totals keys (never mix header and
      line-item fields); values are strings (normalized_value preferred)
    - totals: subtotal / tax_amount / total_amount from the totals fields
    - line_items: the LARGEST detected table; its first row provides the
      column keys (lowercased, spaces -> _), each body row becomes one item
      with `_evidence {table_id, cell_refs, page}` pointing at its cells
    - line_items_secondary: the second-largest table, same shape
    - document_type: 'invoice' when invoice fields are present, else 'auto'
    """
    def sval(f):
        v = f.get("normalized_value") if f.get("normalized_value") is not None \
            else f.get("value")
        return str(v) if v is not None else None

    by_name = {f["name"].lower(): f for f in fields}
    header = {f["name"]: sval(f) for f in fields
              if f["name"].lower() not in _TOTALS_KEYS}
    totals = {}
    sub = by_name.get("subtotal")
    tax = by_name.get("tax") or by_name.get("tax_amount")
    tot = by_name.get("total") or by_name.get("total_amount")
    if sub:
        totals["subtotal"] = sval(sub)
    if tax:
        totals["tax_amount"] = sval(tax)
    if tot:
        totals["total_amount"] = sval(tot)
    doc_type = ("invoice" if ("invoice_number" in by_name
                              or "invoice" in by_name or tot) else "auto")

    def items_from(table: dict, table_idx: int) -> list[dict]:
        rows = table.get("rows", [])
        if len(rows) < 2:
            return []
        keys = [(c or f"col_{i}").strip().lower().replace(" ", "_")
                for i, c in enumerate(rows[0])]
        page = int(table.get("page", 1))
        out = []
        for ri, row in enumerate(rows[1:], 1):
            out.append({
                "values": {k: (row[ci] if ci < len(row) else None)
                           for ci, k in enumerate(keys)},
                "_evidence": {
                    "table_id": f"table-{table_idx:03d}",
                    "cell_refs": [{"row": ri, "col": ci}
                                  for ci in range(len(keys))],
                    "page": page,
                },
            })
        return out

    # largest table = line_items, second largest = secondary (the order the
    # reference's prompts ask GPT for, gpt_vision_kie.py:56,75). 2-column
    # label/value tables are KV shapes — they already flattened into fields
    # (the table_fields path in _assemble) and feed header/totals, not
    # line_items ("Header metadata goes to normalized.header",
    # gpt_vision_kie.py:55).
    candidates = [(i, t) for i, t in enumerate(tables_rows)
                  if t.get("rows") and not all(len(r) == 2
                                               for r in t["rows"])]
    indexed = sorted(candidates, key=lambda it: -len(it[1].get("rows", [])))
    line_items = items_from(indexed[0][1], indexed[0][0]) if indexed else []
    secondary = (items_from(indexed[1][1], indexed[1][0])
                 if len(indexed) > 1 else [])
    return {
        "document_type": doc_type,
        "header": header,
        "line_items": line_items,
        "totals": totals,
        "line_items_secondary": secondary,
    }


def _extract(url: str, payload: bytes, warc_ts: Any, lang: str,
             now: Optional[datetime], st: dict) -> dict:
    if payload is None:
        payload = b""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    file_type = pdf_text.sniff_type(payload)

    tables_rows: list[dict] = []
    page_dims = (0, 0)
    readability, readability_issues = "good", []

    if file_type == "pdf":
        ex = pdf_text.extract_pdf(payload)
        # scanned gate (pdf_style_extractor.py:67-98): a PDF whose text
        # layer carries <=100 chars is treated as scanned/image-only and
        # routed through the raster path: decode embedded /Image XObjects
        # -> P-stage preprocess -> glyph recognition (the deterministic
        # no-weights OCR fallback) -> the same downstream pipeline.
        if sum(len(ln["text"]) for ln in ex["lines"]) <= SCANNED_CHAR_GATE:
            images = pdf_text.extract_pdf_images(payload)
            if images:
                ocr_pages = [(_ocr_page(img, p, settings=st)
                              if img is not None else None)
                             for p, img in enumerate(images, 1)]
                return _assemble_from_ocr(url, payload, warc_ts, lang, now,
                                          st, file_type, ocr_pages)
        page_dims = (pdf_text.PAGE_W, pdf_text.PAGE_H)
        n_pages = max(int(ex.get("n_pages", 1)), 1)
        # per-page fan-out: lines arrive in reading order, grouped by page
        lines_by_page: dict[int, list[dict]] = {p: [] for p in range(1, n_pages + 1)}
        for ln in ex["lines"]:
            lines_by_page.setdefault(int(ln["page"]), []).append(ln)
        page_text_lines = {p: [_pdf_line_struct(ln) for ln in lns]
                           for p, lns in lines_by_page.items()}
        page_regions = {p: [{"type": "text", "bbox": tl["bbox"], "page": p,
                             "confidence": 1.0}
                            for tl in tls]
                        for p, tls in page_text_lines.items()}
        # KIE runs per page (the reference's per-page loop collects one field
        # list per page, orchestrator.py:497-513) so candidates carry true pages
        field_lists = [kie.extract_kv_fields(
            [tl["text"] for tl in page_text_lines[p]], confidence=0.9,
            page_num=p, source="pdf_text") for p in sorted(page_text_lines)]
        ex_title, ex_raw = ex["title"], ex["raw_text"]
    elif file_type == "image":
        # The reference routes EVERY image file through the same page
        # pipeline as rasterized PDFs (io/image.py:49-79 load ->
        # orchestrator.py:455-513 per-page loop -> OCR) — a scanned
        # JPEG/PNG of a document extracts like a scanned PDF. Our
        # deterministic recognizer adds a confidence gate the model-backed
        # reference gets implicitly: a photo/diagram whose "recognized"
        # ink scores below IMAGE_TEXT_GATE carries no document text and
        # stays a picture row (the reference's no-weights fallback: no
        # model, no text).
        n_pages = 1
        page_text_lines = {1: []}
        page_regions = {1: []}
        field_lists = []
        ex_title, ex_raw = "", ""
        try:
            from . import multimodal, preprocess

            img = multimodal.decode_image(payload)
            # the junk floor may never exceed the acceptance gate — a user
            # lowering image_text_gate below the default floor must not be
            # silently nullified by the floor's earlier short-circuit
            floor = min(st["picture_floor"], st["image_text_gate"])
            ocr = _ocr_page(img, 1, junk_floor=floor, settings=st)
            n_rec_chars = sum(len(tl["text"]) - tl["text"].count(" ")
                              for tl in ocr["text_lines"])
            if ((ocr["text_lines"] or ocr["tables"])
                    and ocr["score"] >= st["image_text_gate"]
                    and (ocr["tables"]
                         or n_rec_chars >= st["min_image_text_chars"])):
                return _assemble_from_ocr(url, payload, warc_ts, lang, now,
                                          st, file_type, [ocr])
            # readability was already assessed inside _ocr_page (it is
            # exactly rot90-invariant: std/mean/interior-Laplacian identical,
            # the size rule is an OR over both dims) — reuse, don't recompute
            readability = ocr["readability"]
            readability_issues = ocr["readability_issues"]
            page_dims = (int(img.shape[1]), int(img.shape[0]))
            page_regions = {1: [{"type": "image", "page": 1, "confidence": 1.0,
                                 "bbox": (0.0, 0.0, float(img.shape[1]),
                                          float(img.shape[0]))}]}
        except NotImplementedError:
            pass  # undecodable format: metadata-only (header parse upstream)
    else:
        hx = html_extract.extract_html(
            payload, min_block_chars=st["min_block_chars"],
            max_link_density=st["max_link_density"],
            min_text_density=st["min_text_density"])
        n_pages = 1
        page_text_lines = {1: [{"text": b["text"], "page": 1, "bbox": None,
                                "font_size": None, "words": [],
                                # markup parse is certain; no pixels -> no
                                # OCR content type
                                "confidence": 1.0, "source": "html",
                                "content_type": None, "style": None}
                               for b in hx["content_blocks"]]}
        page_regions = {1: [{"type": b["role"], "index": b["index"],
                             "bbox": None, "page": 1, "confidence": 1.0}
                            for b in hx["blocks"]]}
        tables_rows = hx["tables"]
        # KV fields come from body blocks only: headings routinely contain
        # colons ("Document 12: ...") and would produce junk fields
        kv_lines = [b["text"] for b in hx["content_blocks"]
                    if b["role"] in ("paragraph", "list_item")]
        field_lists = [kie.extract_kv_fields(kv_lines, confidence=0.9,
                                             page_num=1, source="html_kv")]
        ex_title, ex_raw = hx["title"], hx["raw_text"]

    return _assemble(url, payload, warc_ts, lang, now, st, file_type,
                     page_dims, n_pages, page_text_lines, page_regions,
                     tables_rows, field_lists, ex_title, ex_raw,
                     readability, readability_issues)


SCANNED_CHAR_GATE = 100  # pdf_style_extractor.py:67-98 scanned threshold

# Standalone-image OCR acceptance: char-weighted mean template confidence
# the recognized page must reach before its text is believed. The glyph
# recognizer's confidence scale is bimodal — random ink (photos, diagrams,
# ruled forms) matches its best-of-95 template at ~0.7, while genuine glyph
# print sits >= 0.95 even after JPEG/preprocess blur — so 0.88 cleanly
# separates document scans from pictures. Scanned PDFs skip this gate: the
# container (a PDF with no text layer but embedded page images) already
# declares the content a document.
IMAGE_TEXT_GATE = 0.88

# Early junk floor for the standalone-image path: raw recognition scoring
# this far below the acceptance gate cannot plausibly be lifted past it by
# the enhancement chain (measured: pictures sit at ~0.72, genuine scans at
# ~1.0; borderline 0.80-0.88 pages still get the full enhancement chance).
# Skipping preprocess + re-OCR on obvious non-documents saves ~60ms/row.
PICTURE_FLOOR = 0.80

# Minimum EVIDENCE for image-text acceptance: the gate score is a
# char-weighted mean, so a single noise cell that happens to land within
# Hamming-tolerance of one template (~0.2% of random-noise images, found
# by fuzzing: a lone ';' at conf 0.89) can clear IMAGE_TEXT_GATE on its
# own. Real document scans in this engine's operating range carry tens of
# characters (corpus minimum observed: 69 non-space chars); requiring a
# handful of recognized characters (or a detected table structure) keeps
# every genuine scan and makes a meaningless single-cell match
# insufficient. Pictures/diagrams remain picture rows either way.
MIN_IMAGE_TEXT_CHARS = 8


def _ocr_page(img, p: int, junk_floor: Optional[float] = None,
              settings: Optional[dict] = None) -> dict:
    """Shared raster page body — the reference's per-page loop
    (orchestrator.py:631-816) over decoded page pixels, used by scanned
    PDFs AND standalone scanned images (the reference feeds every image
    file through this same pipeline, io/image.py:49-79 ->
    orchestrator.py:455-513):

    O10 OSD -> P9 readability -> P8 content-type -> P-stage preprocess ->
    glyph recognition -> O7/O4 targeted re-OCR (O3 dual decoder routed by
    content type) -> D6-shape column split -> D13 raster tables -> D2
    layout-role classification.
    """
    import numpy as np

    from . import glyphs, preprocess, style_merge, table_model
    from . import reocr as reocr_mod

    # O10 orientation detection FIRST, on the raw image (the OSD order the
    # reference uses: coarse 90-degree orientation before fine deskew —
    # deskew on a sideways page destroys the glyph grid). Upright pages
    # short-circuit after one recognition pass.
    gray0 = preprocess.to_gray(img) if img.ndim == 3 else img
    osd_lines, rot_k, osd_score = glyphs.recognize_with_osd(gray0)
    if rot_k:
        img = np.ascontiguousarray(np.rot90(img, rot_k))
    # page dims from the RAW upright pixels, the reference's
    # `h, w = image.shape[:2]` before preprocess (orchestrator.py:648) —
    # dewarp/deskew may resize the working frame but page metadata and the
    # style estimator's page_height stay raw
    dims = (int(img.shape[1]), int(img.shape[0]))
    if junk_floor is not None and osd_score < junk_floor:
        # obvious non-document (standalone-image path only) — UNLESS a page
        # quadrilateral is visible (a photographed document inside a
        # margin: the case P1 dewarp exists for scores like garbage until
        # dewarped, so it gets the full enhancement chain; the final
        # IMAGE_TEXT_GATE still rejects genuine pictures afterwards).
        # Otherwise skip the enhancement chain; the caller's picture
        # fallback takes over, reusing the readability computed here
        # (P9 runs once per image — raw pixels, a documented deviation:
        # preprocess never runs on this page).
        if preprocess.detect_page_quad(img) is None:
            readability, readability_issues = preprocess.assess_readability(img)
            return {"dims": dims, "text_lines": [], "regions": [],
                    "tables": [], "content_type": "",
                    "readability": readability,
                    "readability_issues": readability_issues,
                    "score": osd_score, "rotation": rot_k,
                    "preprocessed": False}
    if osd_score == 1.0 and osd_lines:
        # Confidence-gated recomputation (the reference's own pattern —
        # low-conf work is recomputed, high-conf work is not,
        # orchestrator.py:1140-1176 / targeted_reocr.py selection): a
        # score of exactly 1.0 means EVERY character matched its template
        # with zero Hamming distance on the raw pixels, so the P-stage
        # preprocess + re-recognition + re-OCR sweep cannot improve the
        # text — skip them. Lossless pages (FlateDecode scans, PNG images,
        # ~half the scanned corpus) take this path; any JPEG blur drops
        # the score below 1.0 and runs the full enhancement chain.
        # P8/P9 run on the raw upright pixels here — a documented
        # deviation from orchestrator.py:655-665 (which assesses the
        # PROCESSED pixels): on this path preprocess never runs, and a
        # perfect-score page is by construction clean enough that the
        # processed and raw assessments agree.
        lines = osd_lines
        readability, readability_issues = preprocess.assess_readability(img)
        content_type, _ct_conf = preprocess.detect_content_type(img)
        was_preprocessed = False
    else:
        was_preprocessed = True
        pre = preprocess.preprocess_for_ocr(img)
        gray = preprocess.to_gray(pre) if pre.ndim == 3 else pre
        # P9 readability + P8 content-type on the PREPROCESSED pixels —
        # the reference's order (orchestrator.py:655-665: preprocess_for_ocr
        # first, then detect_content_type and assess_readability on
        # `processed`); content type routes the O3 decoder order below.
        readability, readability_issues = preprocess.assess_readability(gray)
        content_type, _ct_conf = preprocess.detect_content_type(gray)
        lines = glyphs.recognize_page(gray)
        # O7 targeted re-OCR with O4 positional write-back:
        # low-confidence lines (faded/hazy strokes the default ink
        # threshold misses) get a second-effort recognition; the
        # reference's selection/acceptance rules (targeted_reocr.py:
        # 150-178, 440-443) apply verbatim via kernel.reocr, and accepted
        # results replace the line's text/words/geometry in place — the
        # line-update join of orchestrator's OCR batch application.
        enhanced: dict[int, dict] = {}
        # P8 -> O2 routing (trocr.py:189-199): handwritten crops go to
        # the handwritten-model slot (soft decoder first); printed/mixed/
        # unknown to the printed slot (hard decoder first).
        decoder_primary = "soft" if content_type == "handwritten" else "hard"

        def _recompute(line: dict) -> tuple[str, float]:
            # O3 dual-decoder arbitration (trocr.py:293-323): hard
            # threshold-sweep vs soft contrast-normalized correlation,
            # strict-> picks the secondary
            new, _decoder = glyphs.recognize_line_dual(
                gray, line["bbox"], primary=decoder_primary)
            if new is None:
                return line["text"], line["confidence"]
            enhanced[id(line)] = new
            return new["text"], new["confidence"]

        # threshold calibrated to the glyph recognizer's confidence scale
        # (even random ink matches ~0.7 against the best of 95 templates;
        # clean lines sit >= 0.95) — the reference exposes exactly this
        # knob (reocr confidence_threshold, config.py:221); ours threads
        # through EngineConfig.thresholds.glyph_reocr_confidence.
        reocr_mod.process_lines(
            lines, _recompute,
            threshold=(settings or {}).get("glyph_reocr_confidence", 0.90),
            source="ocr_enhanced")
        for ln in lines:
            if ln.get("source") == "ocr_enhanced" and id(ln) in enhanced:
                new = enhanced[id(ln)]
                for k in ("words", "bbox", "x", "y", "font_size"):
                    if k in new:
                        ln[k] = new[k]
    # D6-shape page-column detection: a dominant vertical whitespace
    # valley splits interleaved two-column band lines into per-column
    # lines (kernel.table_model.split_page_columns); tables are then
    # detected per column (rows must be y-consecutive within a column),
    # and the final (y-band, x) sort makes text column-major within bands.
    columns = table_model.split_page_columns(lines)
    page_tables: list[dict] = []
    kept: list[dict] = []
    block_regions: list[dict] = []
    for col_lines in columns:
        # borderless raster tables (whitespace-alignment detection, the
        # D13 shape on pixels); consumed lines leave the text flow — table
        # text is structured output, not raw_text (same rule as HTML)
        tbls, consumed = table_model.detect_raster_tables(col_lines, page=p)
        page_tables.extend(tbls)
        col_kept = [ln for k, ln in enumerate(col_lines)
                    if k not in consumed]
        kept.extend(col_kept)
        # D2 regions at the reference's granularity: the heuristic
        # detector's dilation+contours produce one region per PARAGRAPH
        # block, not per line (layout_doclaynet.py:146-209); each block is
        # classified by the position/aspect rules (210-251) — including
        # their wide-tall-block -> "table" quirk, reproduced faithfully.
        for block in reading_order.group_lines_into_blocks(col_kept):
            env = (min(ln["bbox"][0] for ln in block),
                   min(ln["bbox"][1] for ln in block),
                   max(ln["bbox"][2] for ln in block),
                   max(ln["bbox"][3] for ln in block))
            chars = sum(len(ln["text"]) for ln in block) or 1
            conf = round(sum(ln["confidence"] * len(ln["text"])
                             for ln in block) / chars, 4)
            block_regions.append({
                "type": reading_order.classify_region_heuristic(
                    env[0], env[1], env[2] - env[0], env[3] - env[1],
                    dims[0], dims[1]),
                "bbox": env, "page": p, "confidence": conf})
    kept.sort(key=lambda ln: (int(ln["y"] // 50), ln["x"]))
    # R5 estimated styles on every raster line (the reference estimates a
    # TextStyle whenever PDF-native styles are absent, orchestrator.py:
    # 606-629/775-777 -> pdf_style_extractor.py:192-258), with the raw page
    # height as page_height (the orchestrator passes the pre-preprocess `h`).
    # Lines also surface the OCR observables the reference's TextLine
    # carries (types.py:138-148): per-line confidence, source ("ocr" =
    # the deterministic glyph recognizer in the TrOCR slot; "ocr_enhanced"
    # after an accepted O7 re-OCR), and the page's P8 content type.
    text_lines = [{
        "text": ln["text"],
        "page": p,
        "bbox": tuple(float(v) for v in ln["bbox"]),
        "font_size": float(ln["font_size"]),
        "words": ln["words"],
        "confidence": float(ln["confidence"]),
        "source": ln.get("source", "ocr"),
        "content_type": content_type,
        "style": style_merge.estimate_style_from_bbox(
            ln["text"], float(ln["bbox"][3]) - float(ln["bbox"][1]),
            float(ln["bbox"][1]), float(dims[1])),
    } for ln in kept]
    # D3 same-type IoU merge with the reference's exact rule, then table
    # regions appended (one per detected grid)
    regions = reading_order.merge_regions_iou(block_regions) + \
        [{"type": "table", "bbox": t["cells"][0]["bbox"], "page": p,
          "confidence": 1.0} for t in page_tables]
    # acceptance score over EVERY recognized line, including the ones a
    # detected table consumed — a document image that is ONLY a table has
    # empty text_lines but real recognized content, and must not be
    # mistaken for a picture (round-4 review finding)
    score = glyphs.osd_score([ln for col in columns for ln in col])
    return {"dims": dims, "text_lines": text_lines, "regions": regions,
            "tables": page_tables, "content_type": content_type,
            "readability": readability,
            "readability_issues": readability_issues, "score": score,
            # O10 coarse rotation applied to reach upright (90-degree steps
            # CCW) and whether the P-stage chain ran — carried so the S7
            # artifacts renderer can re-decode the stored pixels and
            # reproduce the geometry frame the bboxes/regions live in
            # (slow-path bboxes are in the PREPROCESSED frame, which
            # dewarp/deskew may have resized)
            "rotation": rot_k, "preprocessed": was_preprocessed}


def _assemble_from_ocr(url, payload, warc_ts, lang, now, st, file_type,
                       ocr_pages: list[Optional[dict]]) -> dict:
    """Document assembly over per-page raster OCR results (None = corrupt
    page, contained and kept empty). Shared by the scanned-PDF and
    standalone-image paths."""
    page_text_lines: dict[int, list[dict]] = {}
    page_regions: dict[int, list[dict]] = {}
    tables_rows: list[dict] = []
    page_meta: dict[int, dict] = {}
    # doc-level dims from the FIRST SURVIVING page (round-4 ADVICE: a
    # corrupt page 1 must not pin the default letter dims onto a real
    # scan's title cutoff), mirroring how first_meta picks the first
    # non-None page below; default letter when every page failed
    page_dims = next((ocr["dims"] for ocr in ocr_pages if ocr),
                     (pdf_text.PAGE_W, pdf_text.PAGE_H))
    for p, ocr in enumerate(ocr_pages, 1):
        if ocr is None:
            page_text_lines[p] = []
            page_regions[p] = []
            continue
        page_text_lines[p] = ocr["text_lines"]
        page_regions[p] = ocr["regions"]
        tables_rows.extend(ocr["tables"])
        page_meta[p] = {"content_type": ocr["content_type"],
                        "readability": ocr["readability"],
                        "readability_issues": ocr["readability_issues"],
                        # per-page dims: a scan's pages can differ in size
                        # (reference PageMetadata carries width/height per
                        # page, types.py:243-250)
                        "width": ocr["dims"][0],
                        "height": ocr["dims"][1],
                        # raster pages carry the reference's PageMetadata
                        # dpi default (types.py:247) — embedded images keep
                        # their stored resolution, nothing re-rasterizes
                        "dpi": 350,
                        "rotation": ocr.get("rotation", 0),
                        "preprocessed": ocr.get("preprocessed", False)}
    field_lists = [kie.extract_kv_fields(
        [tl["text"] for tl in page_text_lines[p]],
        confidence=0.85, page_num=p, source="ocr_fallback")
        for p in sorted(page_text_lines)]
    all_lines = [tl for p in sorted(page_text_lines)
                 for tl in page_text_lines[p]]
    ex_title = next(
        (tl["text"] for tl in all_lines
         if tl["font_size"] and tl["font_size"] > 14
         and tl["bbox"][1] < page_dims[1] * 0.3), "")
    ex_raw = "\n".join(tl["text"] for tl in all_lines)
    first_meta = next((m for m in page_meta.values()), {})
    return _assemble(url, payload, warc_ts, lang, now, st, file_type,
                     page_dims, len(ocr_pages), page_text_lines,
                     page_regions, tables_rows, field_lists, ex_title,
                     ex_raw, first_meta.get("readability", "good"),
                     first_meta.get("readability_issues", []),
                     table_source="ocr_table", page_meta=page_meta)


def _assemble(url, payload, warc_ts, lang, now, st, file_type, page_dims,
              n_pages, page_text_lines, page_regions, tables_rows,
              field_lists, ex_title, ex_raw, readability,
              readability_issues, table_source: str = "html_table",
              page_meta: Optional[dict] = None) -> dict:
    # table-derived fields from 2-column tables (label/value shape).
    # `table_source` carries provenance: tables parsed from HTML markup are
    # "html_table" (weight 0.9); tables detected on the raster/OCR path are
    # "ocr_table" (weight 0.8) — their text comes from the same uncertain
    # glyph recognition as ocr_fallback lines and must not outweigh it
    # (round-3 ADVICE).
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
                data, confidence=0.85, page_num=t.get("page", 1),
                source=table_source))

    fields = fuse_mod.fuse_fields(
        field_lists + [table_fields], strategy=st["strategy"],
        source_weights=st["source_weights"],
        min_confidence=st["min_confidence"],
        validator_bonus=st["validator_bonus"])

    # K9 spatial anchoring (orchestrator.py:1190-1302): attach bbox/page from
    # word/line/substring/cell matches; HTML lines carry no geometry, so
    # anchoring is effective on the PDF path and a no-op (no false anchors)
    # on HTML — the reference's rule 5.
    all_text_lines = [tl for p in sorted(page_text_lines)
                      for tl in page_text_lines[p]]
    fields = anchor_mod.anchor_fields(fields, all_text_lines, tables_rows)

    fields = _apply_validator_status(fields, now,
                                     low_confidence=st["low_confidence"])

    field_checks = [r for f in fields for r in f.get("validators", [])]
    consistency = validators.validate_document_consistency(
        [{"name": f["name"], "value": f["value"]} for f in fields])
    validation = _validation_summary(field_checks + consistency)

    pages = []
    for p in range(1, n_pages + 1):
        tls = page_text_lines.get(p, [])
        # per-page metadata overrides (raster path: P8 content type +
        # per-page P9 readability — the reference assesses every page,
        # orchestrator.py:651-675); native/HTML pages keep the doc-wide
        # values with content_type = file_type.
        pm = (page_meta or {}).get(p, {})
        pages.append({
            "number": p,
            "metadata": {"width": pm.get("width", page_dims[0]),
                         "height": pm.get("height", page_dims[1]),
                         # PageMetadata.dpi (types.py:247): raster pages get
                         # 350 via page_meta; the native-PDF text layer is
                         # point-space (72/inch); HTML/pictures have no
                         # defined rendering DPI
                         "dpi": pm.get("dpi",
                                       72 if file_type == "pdf" else None),
                         "content_type": pm.get("content_type", file_type),
                         # O10 upright rotation (90-degree CCW steps) the
                         # raster path applied before recognition; 0 on
                         # native/HTML pages. `preprocessed` marks pages
                         # whose geometry lives in the P-stage frame. The
                         # S7 artifacts renderer uses both to re-derive the
                         # geometry frame from stored pixels without
                         # re-running OSD.
                         "rotation": pm.get("rotation", 0),
                         "preprocessed": pm.get("preprocessed", False),
                         "readability": pm.get("readability", readability),
                         "readability_issues": pm.get("readability_issues",
                                                      readability_issues)},
            "layout_regions": page_regions.get(p, []),
            "text_lines": tls,
            # each page carries ITS tables (the reference's Page.tables,
            # types.py:253-264); the doc-level array keeps them all
            "tables": [t for t in tables_rows if t.get("page", 1) == p],
            "raw_text": reading_order.assemble_raw_text(tls),
        })

    return {
        "id": doc_id_for_url(url),
        "status": "ok",
        "error": "",
        "metadata": _metadata(url, payload, file_type, warc_ts, lang),
        "title": ex_title,
        "page_count": n_pages,
        "pages": pages,
        "tables": tables_rows,
        "fields": fields,
        "validation": validation,
        "raw_text": ex_raw,
        "reconstruction": build_reconstruction(pages, fields),
        "normalized": build_normalized(fields, tables_rows),
    }
