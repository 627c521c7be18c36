"""Minimal PDF text layer: a deterministic writer and extractor for the
text-only PDF subset our synthetic generator emits.

The reference rasterizes PDFs with PyMuPDF and OCRs them (io/pdf.py:44-142);
it also has a native-text fast path reading PyMuPDF span dicts when the PDF
carries a text layer (extract/pdf_style_extractor.py:101-189, gated on total
chars > 100 at :67-98). PyMuPDF is not available in this environment, so this
module implements the native-text path directly on the PDF COS syntax:

- multi-page documents (one content stream per page, /Kids fan-out) — the
  reference's per-page loop shape (orchestrator.py:497-513);
- uncompressed AND FlateDecode (zlib) content streams, the compression real
  PDFs use (stdlib zlib — no new dependency);
- Tm absolute and Td relative text positioning, the two operators PyMuPDF's
  span dicts normalize away.

Reading order matches the reference's reconstruction sort: page, then y-band,
then x (io/reconstruction.py:121-133), with PDF's bottom-left origin converted
to top-down y before banding.
"""

from __future__ import annotations

import re
import zlib

PAGE_W, PAGE_H = 612, 792  # US Letter, the reference fixture size (conftest.py:79-103)

# R4 style subset: three Type1 fonts. Bold/italic detection downstream uses
# the reference's name-substring rule (pdf_style_extractor.py span flags).
FONTS = {
    "regular": ("F1", "Helvetica"),
    "bold": ("F2", "Helvetica-Bold"),
    "italic": ("F3", "Helvetica-Oblique"),
}


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(lines: list[tuple], use_td: bool = False) -> bytes:
    """Content stream for one page. `lines` = [(x, y_top, text, font_size)]
    or extended [(x, y_top, text, font_size, font_key, color_hex)] with
    y_top measured from the TOP of the page (reference-fixture convention,
    conftest.py:85-99). With `use_td`, positions are emitted as Td offsets
    relative to the previous line (the form real generators like LaTeX
    emit) instead of absolute Tm matrices. Colors emit `r g b rg` fill
    operators."""
    ops = ["BT"]
    cx, cy = 0.0, 0.0
    cur_color = None
    for line in lines:
        x, y_top, text, size = line[:4]
        font_key = line[4] if len(line) > 4 and line[4] else "regular"
        color = line[5] if len(line) > 5 else None
        y_pdf = PAGE_H - y_top
        if color and color != cur_color:
            r, g, b = (int(color[i:i + 2], 16) / 255.0 for i in (1, 3, 5))
            ops.append(f"{r:g} {g:g} {b:g} rg")
            cur_color = color
        ops.append(f"/{FONTS[font_key][0]} {size:g} Tf")
        if use_td:
            ops.append(f"{x - cx:g} {y_pdf - cy:g} Td")
            cx, cy = x, y_pdf
        else:
            ops.append(f"1 0 0 1 {x:g} {y_pdf:g} Tm")
        ops.append(f"({_esc(text)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def build_pdf_pages(pages: list[list[tuple[float, float, str, float]]],
                    compress: bool = False, use_td: bool = False) -> bytes:
    """Build a deterministic multi-page PDF.

    Object layout: catalog(1), pages(2), then per page i: page object and its
    content stream object, then the shared font object last. With `compress`,
    content streams are zlib-deflated and tagged /FlateDecode.
    """
    n = len(pages)
    first_font_obj = 3 + 2 * n
    font_entries = " ".join(
        f"/{tag} {first_font_obj + j} 0 R"
        for j, (tag, _) in enumerate(FONTS.values()))
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))

    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
    ]
    for i, lines in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        objects.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
             f"/Contents {stream_num} 0 R "
             f"/Resources << /Font << {font_entries} >> >> >>").encode())
        raw = _page_stream(lines, use_td=use_td)
        if compress:
            data = zlib.compress(raw, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = raw
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    for _, basefont in FONTS.values():
        objects.append(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /{basefont} >>".encode())

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


def build_pdf(lines: list[tuple[float, float, str, float]],
              compress: bool = False, use_td: bool = False) -> bytes:
    """Single-page convenience wrapper (the round-1 API)."""
    return build_pdf_pages([lines], compress=compress, use_td=use_td)


def build_scanned_pdf(page_images: list, codec: str = "flate") -> bytes:
    """Build an image-only (scanned) PDF: each page is one /Image XObject
    drawn full-page — the shape a scanner/print-to-PDF emits, and the input
    the reference's rasterize->OCR path exists for (io/pdf.py:117-142).

    `page_images` are HxW (gray) or HxWx3 (RGB) uint8 numpy arrays.
    codec='flate' stores lossless zlib'd samples; codec='dct' stores
    baseline JPEG (kernel.jpeg) — the two stream filters scanned PDFs
    actually carry.
    """
    import numpy as np

    n = len(page_images)
    # objects: catalog(1), pages(2), per page: page(3+2i), content(4+2i);
    # image XObjects LAST (5+... after all pages) so text extraction's
    # stream walk sees content streams first and in page order.
    first_img_obj = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
    ]
    img_objects: list[bytes] = []
    for i, img in enumerate(page_images):
        arr = np.asarray(img, dtype=np.uint8)
        h, w = arr.shape[:2]
        gray = arr.ndim == 2
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        img_num = first_img_obj + i
        objects.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
             f"/Contents {stream_num} 0 R "
             f"/Resources << /XObject << /Im{i} {img_num} 0 R >> >> >>"
             ).encode())
        content = f"q {w} 0 0 {h} 0 0 cm /Im{i} Do Q".encode()
        objects.append(f"<< /Length {len(content)} >>".encode()
                       + b"\nstream\n" + content + b"\nendstream")
        if codec == "dct":
            from .jpeg import encode_jpeg

            rgb = np.stack([arr] * 3, axis=-1) if gray else arr
            data, filt = encode_jpeg(rgb, quality=92), "/DCTDecode"
            space = "/DeviceRGB"
        else:
            data, filt = zlib.compress(arr.tobytes(), 6), "/FlateDecode"
            space = "/DeviceGray" if gray else "/DeviceRGB"
        img_objects.append(
            (f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
             f"/ColorSpace {space} /BitsPerComponent 8 /Filter {filt} "
             f"/Length {len(data)} >>").encode()
            + b"\nstream\n" + data + b"\nendstream")
    objects += img_objects

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


_IMG_DICT_RE = re.compile(
    rb"<<[^>]*?/Subtype\s*/Image[^>]*?>>\s*stream\r?\n", re.DOTALL)
_IMG_W_RE = re.compile(rb"/Width\s+(\d+)")
_IMG_H_RE = re.compile(rb"/Height\s+(\d+)")


def extract_pdf_images(pdf: bytes) -> list:
    """Decode the /Image XObject of each page of the supported scanned-PDF
    subset (one full-page image per page, object order == page order).
    Returns one HxWx3 RGB or HxW gray uint8 array per image; a corrupt or
    unsupported image yields None in its slot (contained, page numbering
    preserved) — the same per-page containment as the text path."""
    import numpy as np

    images = []
    for m in _IMG_DICT_RE.finditer(pdf):
        head = m.group(0)
        lm = _LENGTH_RE.search(head)
        start = m.end()
        if lm:
            end = start + int(lm.group(1))
        else:
            end = pdf.find(b"endstream", start)
            if end == -1:
                images.append(None)
                continue
        data = pdf[start:end]
        try:
            if b"/DCTDecode" in head:
                from .jpeg import decode_jpeg

                images.append(decode_jpeg(data))
            else:
                raw = np.frombuffer(zlib.decompress(data), dtype=np.uint8)
                w = int(_IMG_W_RE.search(head).group(1))
                h = int(_IMG_H_RE.search(head).group(1))
                if b"/DeviceGray" in head:
                    images.append(raw[:h * w].reshape(h, w))
                else:
                    images.append(raw[:h * w * 3].reshape(h, w, 3))
        except Exception:
            images.append(None)
    return images


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_TF_RE = re.compile(rb"/(F\d+) ([0-9.]+) Tf")

# One operator per match: font select, absolute Tm, relative Td, show text,
# fill color, text-block start.
_TOKEN_RE = re.compile(
    rb"(/F\d+ [0-9.]+ Tf)"
    rb"|(?:1 0 0 1 ([0-9.+-]+) ([0-9.+-]+) Tm)"
    rb"|(?:([0-9.+-]+) ([0-9.+-]+) Td)"
    rb"|(?:\(((?:[^()\\]|\\.)*)\) Tj)"
    rb"|(BT)"
    rb"|(?:([0-9.]+) ([0-9.]+) ([0-9.]+) rg)")

_FONT_OBJ_RE = re.compile(
    rb"(\d+) 0 obj\s*<< /Type /Font [^>]*?/BaseFont /([A-Za-z0-9-]+)")
_FONT_REF_RE = re.compile(rb"/(F\d+) (\d+) 0 R")


def _font_map(pdf: bytes) -> dict[bytes, str]:
    """Resource tag (F1, F2, ...) -> BaseFont name, from the font objects
    and the page Resources dicts (our subset shares one font set)."""
    obj_names = {m.group(1): m.group(2).decode("latin-1")
                 for m in _FONT_OBJ_RE.finditer(pdf)}
    return {m.group(1): obj_names[m.group(2)]
            for m in _FONT_REF_RE.finditer(pdf) if m.group(2) in obj_names}


def style_flags(font_name: str) -> tuple[bool, bool]:
    """(bold, italic) from the font name — the reference's span-flag rule
    (pdf_style_extractor.py name-substring heuristic for PyMuPDF spans)."""
    low = (font_name or "").lower()
    return ("bold" in low, "italic" in low or "oblique" in low)


def _unescape(raw: bytes) -> str:
    return (raw.decode("latin-1")
            .replace(r"\(", "(").replace(r"\)", ")").replace("\\\\", "\\"))


def _iter_streams(pdf: bytes):
    """Yield decoded content-stream bytes in document order.

    Uses /Length for exact slicing (compressed payloads may contain any byte
    sequence, including 'endstream') and falls back to scanning for the
    terminator when /Length is absent. A stream that fails to inflate is
    skipped, not raised — per-document error containment happens one level
    up, but a single corrupt page should not void its siblings."""
    pos = 0
    head_re = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
    while True:
        m = head_re.search(pdf, pos)
        if not m:
            return
        # the innermost dict right before `stream` (page objects have nested
        # << /Font ... >> dicts that the non-greedy match can swallow)
        dict_txt = m.group(1).split(b"<<")[-1]
        data_start = m.end()
        lm = _LENGTH_RE.search(dict_txt)
        if lm:
            data_end = data_start + int(lm.group(1))
        else:
            term = pdf.find(b"endstream", data_start)
            if term == -1:
                return
            data_end = term
            while data_end > data_start and pdf[data_end - 1:data_end] in (b"\n", b"\r"):
                data_end -= 1
        data = pdf[data_start:data_end]
        pos = data_end
        if b"/Subtype /Image" in dict_txt or b"/Subtype/Image" in dict_txt:
            continue  # image XObject: not a page content stream — the
            # scanned path reads these via extract_pdf_images; skipping
            # keeps text page numbering = content-stream order
        if b"/FlateDecode" in dict_txt:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                yield None  # corrupt page stream: keep siblings AND numbering
                continue
        yield data


def extract_pdf_text_lines(pdf: bytes) -> list[dict]:
    """Extract positioned text lines from the supported PDF subset.

    Returns [{text, x, y, page, font_size}] with y measured top-down (page
    coordinates as the reference's Page uses, types.py:243-250). Lines come
    back in reading order: (page, y-band 50px, x) per reconstruction.py:121-133.
    """
    fonts = _font_map(pdf)
    lines: list[dict] = []
    for page_num, stream in enumerate(_iter_streams(pdf), start=1):
        if stream is None:  # corrupt page: contained, numbering preserved
            continue
        size = 12.0
        font_name = "Helvetica"
        color = "#000000"
        cx, cy = 0.0, 0.0  # current text position (PDF bottom-up coords)
        for m in _TOKEN_RE.finditer(stream):
            if m.group(1):  # Tf
                tf = _TF_RE.match(m.group(1))
                size = float(tf.group(2))
                font_name = fonts.get(tf.group(1), font_name)
            elif m.group(2) is not None:  # Tm (absolute)
                cx, cy = float(m.group(2)), float(m.group(3))
            elif m.group(4) is not None:  # Td (relative)
                cx, cy = cx + float(m.group(4)), cy + float(m.group(5))
            elif m.group(6) is not None:  # Tj
                bold, italic = style_flags(font_name)
                lines.append({
                    "text": _unescape(m.group(6)),
                    "x": cx,
                    "y": PAGE_H - cy,  # top-down
                    "page": page_num,
                    "font_size": size,
                    "font_name": font_name,
                    "bold": bold,
                    "italic": italic,
                    "color": color,
                })
            elif m.group(7) is not None:  # BT — reset the text cursor
                cx, cy = 0.0, 0.0
            else:  # rg fill color
                r, g, b = (float(m.group(i)) for i in (8, 9, 10))
                color = "#{:02x}{:02x}{:02x}".format(
                    round(r * 255), round(g * 255), round(b * 255))
    lines.sort(key=lambda ln: (ln["page"], int(ln["y"] // 50), ln["x"]))
    return lines


def extract_pdf(pdf: bytes) -> dict:
    """Full extraction for a PDF document: title + reading-order raw text.

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
    n_pages = max((ln["page"] for ln in lines), default=1)
    return {"title": title, "lines": lines, "raw_text": raw_text,
            "tables": [], "n_pages": n_pages}


def sniff_type(data: bytes) -> str:
    """File-type sniff: magic bytes instead of the reference's extension check
    (orchestrator.py:573-582) since our input is a bytes column."""
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:3] == b"\xff\xd8\xff":
        return "image"
    # BMP needs more than the 2-byte magic ("BM" can start plain text):
    # require a plausible DIB header size at offset 14
    if (data[:2] == b"BM" and len(data) >= 54
            and data[14] in (12, 40, 52, 56, 108, 124) and data[15] == 0):
        return "image"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "image"
    head = data[:256].lstrip()[:64].lower()
    if head.startswith((b"<!doctype", b"<html")) or b"<html" in data[:1024].lower():
        return "html"
    return "html"  # default: treat unknown text as HTML (our primary path)
