"""Minimal PDF text layer: a deterministic writer and extractor for the
uncompressed text-only PDF subset our synthetic generator emits.

The reference rasterizes PDFs with PyMuPDF and OCRs them (io/pdf.py:44-142);
it also has a native-text fast path reading PyMuPDF span dicts when the PDF
carries a text layer (extract/pdf_style_extractor.py:101-189, gated on total
chars > 100 at :67-98). PyMuPDF is not available in this environment, so this
module implements the native-text path directly on the PDF COS syntax for the
subset we generate: one content stream per page, no compression, Tj text
operators with Td positioning — the same operator stream PyMuPDF would parse.

Reading order matches the reference's reconstruction sort: y-band then x
(io/reconstruction.py:121-133), with PDF's bottom-left origin converted to
top-down y before banding.
"""

from __future__ import annotations

import re
from typing import Optional

PAGE_W, PAGE_H = 612, 792  # US Letter, the reference fixture size (conftest.py:79-103)


def build_pdf(lines: list[tuple[float, float, str, float]]) -> bytes:
    """Build a single-page uncompressed PDF.

    `lines` = [(x, y_top, text, font_size)] with y_top measured from the TOP
    of the page (reference-fixture convention, conftest.py:85-99).
    Deterministic byte output for fixed input.
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT"]
    for x, y_top, text, size in lines:
        y_pdf = PAGE_H - y_top
        ops.append(f"/F1 {size:g} Tf")
        ops.append(f"1 0 0 1 {x:g} {y_pdf:g} Tm")
        ops.append(f"({esc(text)}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1", errors="replace")

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
         f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>").encode(),
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


_TM_RE = re.compile(
    rb"1 0 0 1 ([0-9.+-]+) ([0-9.+-]+) Tm\s*\(((?:[^()\\]|\\.)*)\) Tj")
_TD_RE = re.compile(
    rb"([0-9.+-]+) ([0-9.+-]+) Td\s*\(((?:[^()\\]|\\.)*)\) Tj")
_SIZE_RE = re.compile(rb"/F\d+ ([0-9.]+) Tf")


def _unescape(raw: bytes) -> str:
    return (raw.decode("latin-1")
            .replace(r"\(", "(").replace(r"\)", ")").replace("\\\\", "\\"))


def extract_pdf_text_lines(pdf: bytes) -> list[dict]:
    """Extract positioned text lines from the supported PDF subset.

    Returns [{text, x, y, page, font_size}] with y measured top-down (page
    coordinates as the reference's Page uses, types.py:243-250). Lines come
    back in reading order: (page, y-band 50px, x) per reconstruction.py:121-133.
    """
    lines: list[dict] = []
    # the generator emits one content stream per page in order
    for page_num, stream in enumerate(
            re.findall(rb"stream\n(.*?)\nendstream", pdf, re.DOTALL), start=1):
        # walk operators in order, tracking current font size
        size = 12.0
        pos = 0
        token_re = re.compile(
            rb"(/F\d+ [0-9.]+ Tf)|(1 0 0 1 [0-9.+-]+ [0-9.+-]+ Tm\s*\((?:[^()\\]|\\.)*\) Tj)")
        for m in token_re.finditer(stream):
            if m.group(1):
                size = float(_SIZE_RE.match(m.group(1)).group(1))
            else:
                tm = _TM_RE.match(m.group(2))
                x, y_pdf, raw = float(tm.group(1)), float(tm.group(2)), tm.group(3)
                lines.append({
                    "text": _unescape(raw),
                    "x": x,
                    "y": PAGE_H - y_pdf,  # top-down
                    "page": page_num,
                    "font_size": size,
                })
        del pos
    lines.sort(key=lambda ln: (ln["page"], int(ln["y"] // 50), ln["x"]))
    return lines


def extract_pdf(pdf: bytes) -> dict:
    """Full extraction for a PDF page: title + reading-order raw text.

    Title heuristic mirrors the reference's style-estimator role rule
    (extract/pdf_style_extractor.py:192-258: near-top + large font -> title):
    the first line with font_size > 14 in the top 30% of the page.
    """
    lines = extract_pdf_text_lines(pdf)
    title = ""
    for ln in lines:
        if ln["font_size"] > 14 and ln["y"] < PAGE_H * 0.3:
            title = ln["text"]
            break
    raw_text = "\n".join(ln["text"] for ln in lines if ln["text"])  # orchestrator.py:780
    return {"title": title, "lines": lines, "raw_text": raw_text, "tables": []}


def sniff_type(data: bytes) -> str:
    """File-type sniff: magic bytes instead of the reference's extension check
    (orchestrator.py:573-582) since our input is a bytes column."""
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:3] == b"\xff\xd8\xff":
        return "image"
    head = data[:256].lstrip()[:64].lower()
    if head.startswith((b"<!doctype", b"<html")) or b"<html" in data[:1024].lower():
        return "html"
    return "html"  # default: treat unknown text as HTML (our primary path)
