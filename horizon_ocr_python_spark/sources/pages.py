"""Deterministic synthetic `pages` table generator.

Produces rows of exactly the BASELINE.json input_hint shape:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)
where `text` is the GROUND-TRUTH main-content text the extractor must
reproduce byte-identically (the per-row invariant). Ground truth is computed
from generator parameters, never by running the extractor — so the byte-
identity test is a real oracle, not a self-fulfilling one.

Page anatomy (FIXTURES.md §A): known title/body/fields, plus boilerplate the
extractor must strip — nav link lists, header/footer chrome, sidebar, cookie
banner, script/style — and a label/value table. ~10% of rows are PDFs built
by kernel.pdf_text.build_pdf with the reference conftest's known strings
(reference tests/conftest.py:79-103: "Invoice Number: INV-001",
"Date: 2024-01-15", "Total: $1,234.56" shapes).

Host distribution is Zipf-ish (host h gets ~C/h pages) to create the
host-level skew the salted repartition must defuse (SURVEY §4 custom-work 1).
Everything is seeded; same (n_rows, seed) -> same bytes.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from ..kernel import pdf_text

WORDS = (
    "data spark table query row column batch stream shuffle partition "
    "join filter merge sort window vector hash scan key value order "
    "customer invoice total amount engine document page text line field"
).split()

LANGS = [("en", 95), ("de", 3), ("fr", 2)]

_BASE_TS = datetime(2026, 3, 1, 0, 0, 0)


def _pick_lang(rng: random.Random) -> str:
    r = rng.randrange(100)
    acc = 0
    for lang, w in LANGS:
        acc += w
        if r < acc:
            return lang
    return "en"


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(WORDS) for _ in range(n_words)]
    return " ".join(ws).capitalize() + "."


def _host_for(i: int, n_hosts: int, rng: random.Random) -> int:
    """Zipf-ish host assignment: host h with probability ∝ 1/(h+1)."""
    weights = [1.0 / (h + 1) for h in range(n_hosts)]
    total = sum(weights)
    r = rng.random() * total
    acc = 0.0
    for h, w in enumerate(weights):
        acc += w
        if r < acc:
            return h
    return n_hosts - 1


def make_page(i: int, seed: int = 42, n_hosts: int = 50, scale: int = 1) -> dict:
    """Build one deterministic page row + its expected extraction results.

    Returns {url, warc_ts, html(bytes), text, lang, expected_title,
    expected_fields (dict), kind}.

    `scale` multiplies the content volume (paragraph count and nav/sidebar
    chrome). scale=1 (~1.5 KB) keeps tests fast; scale>=8 (~15-40 KB)
    approximates real Common-Crawl page sizes — use it for benchmarks so
    per-document compute reflects the production workload.
    """
    rng = random.Random((seed << 20) ^ i)
    host = _host_for(i, n_hosts, rng)
    url = f"https://host{host:03d}.example/article/{i}"
    warc_ts = _BASE_TS + timedelta(seconds=(i * 977) % (30 * 86400))
    lang = _pick_lang(rng)
    r_kind = rng.random()
    kind = "pdf" if r_kind < 0.10 else ("image" if r_kind < 0.15 else "html")

    title = f"Document {i}: " + " ".join(rng.choice(WORDS) for _ in range(3))
    n_paras = rng.randint(2, 6) * scale
    paras = [_sentence(rng, rng.randint(8, 25)) for _ in range(n_paras)]
    invoice_no = f"INV-{seed % 97:02d}{i:06d}"
    date_str = (warc_ts - timedelta(days=rng.randint(0, 365))).strftime("%Y-%m-%d")
    total_str = f"${rng.randint(1, 9999)},{rng.randint(0, 999):03d}.{rng.randint(0, 99):02d}" \
        if rng.random() < 0.3 else f"${rng.randint(1, 99999)}.{rng.randint(0, 99):02d}"
    kv_lines = [
        f"Invoice Number: {invoice_no}",
        f"Date: {date_str}",
        f"Total: {total_str}",
    ]
    expected_fields = {
        "invoice_number": invoice_no,
        "date": date_str,
        "total": total_str,
    }

    if kind == "image" and rng.random() < 0.5:
        # standalone scanned image of a document: a glyph-rendered page
        # delivered as a bare PNG/JPEG (no PDF wrapper) — the reference
        # OCRs every image file through the same page pipeline as
        # rasterized PDFs (io/image.py:49-79 -> orchestrator.py:455-513),
        # so ground truth is the rendered text. ~Half carry the kv block
        # as a borderless 2-col table; ~25% are stored rotated (O10).
        import numpy as np

        from ..kernel import glyphs, png

        kind = "scanned_image"
        cap2 = glyphs.max_chars(scale=2)
        title = f"Scan {i} " + " ".join(rng.choice(WORDS) for _ in range(2))
        body = [_sentence(rng, rng.randint(3, 4))[:cap2]
                for _ in range(rng.randint(3, 10))]
        as_table = rng.random() < 0.5
        if as_table:
            text_lines = list(body)
            kv_rows = [("Invoice Number", invoice_no), ("Date", date_str),
                       ("Total", total_str)]
            render_lines = body + [lbl.ljust(18) + val for lbl, val in kv_rows]
        else:
            text_lines = body + kv_lines
            render_lines = text_lines
        spec = [(36, 72, title, 3)] + [(36, 120 + 24 * k, tl, 2)
                                       for k, tl in enumerate(render_lines)]
        img = glyphs.render_page(spec)
        if rng.random() < 0.25:
            img = np.ascontiguousarray(np.rot90(img, -rng.randint(1, 3)))
        rgb = np.stack([img] * 3, axis=-1)
        if rng.random() < 0.5:
            from ..kernel.jpeg import encode_jpeg

            payload = encode_jpeg(rgb, quality=90,
                                  subsample_420=rng.random() < 0.5)
        else:
            payload = png.encode_png(rgb)
        expected_text = "\n".join([title] + text_lines)
    elif kind == "image":
        # a real image of the reference conftest's synthetic document shape
        # (bars + rulings, conftest.py:23-43) — half PNG, half baseline JPEG
        # (kernel.jpeg), matching the Common-Crawl payload mix. Both decode
        # for real; its "recognized" ink scores below the OCR acceptance
        # gate, so the extracted text is empty — a picture, not a document
        from . import _png_doc_image

        img = _png_doc_image.render(seed=(seed << 20) ^ i)
        if rng.random() < 0.5:
            from ..kernel.jpeg import encode_jpeg

            payload = encode_jpeg(img, quality=88,
                                  subsample_420=rng.random() < 0.5)
        else:
            payload = _png_doc_image.encode(img)
        expected_text = ""
        title = ""
        expected_fields = {}
    elif kind == "pdf" and rng.random() < 0.35:
        # scanned/image-only PDF: glyph-rendered page images behind /Image
        # XObjects (FlateDecode or DCTDecode) — no text layer at all, so
        # extraction must take the raster path (scanned gate -> decode ->
        # preprocess -> glyph recognition). Ground truth is the rendered
        # text; lines are sized to the fixed-pitch page capacity.
        from ..kernel import glyphs

        kind = "scanned_pdf"
        cap2 = glyphs.max_chars(scale=2)          # chars per scale-2 line
        title = f"Scan {i} " + " ".join(rng.choice(WORDS) for _ in range(2))
        if rng.random() < 0.25:
            # two-column scan: left and right columns share y-rows across a
            # wide gutter; extraction's D6-shape column split must cut the
            # merged band lines so reading order is column-major within
            # (y//50) bands — ground truth is computed with the same
            # (band, x) sort key the engine uses (reconstruction.py:121-133)
            import numpy as np

            col_chars = 20
            x_right = 36 + (col_chars + 4) * 12   # gutter = 4 glyph cells
            flow = [_sentence(rng, rng.randint(2, 3))[:col_chars].rstrip()
                    for _ in range(rng.randint(14, 20))]
            flow += [f"Inv: {invoice_no}", f"Date: {date_str}",
                     f"Total: {total_str}"]
            n_left = (len(flow) + 1) // 2
            items = [(72, 36, title, 3)]
            items += [(120 + 24 * k, 36, t, 2)
                      for k, t in enumerate(flow[:n_left])]
            items += [(120 + 24 * k, x_right, t, 2)
                      for k, t in enumerate(flow[n_left:])]
            images = [glyphs.render_page([(x, y, t, s)
                                          for (y, x, t, s) in items])]
            ordered = sorted(items, key=lambda it: (it[0] // 50, it[1]))
            expected_text = "\n".join(t for (_, _, t, _) in ordered)
            expected_fields = {"inv": invoice_no, "date": date_str,
                               "total": total_str}
            if rng.random() < 0.25:
                rot_k = rng.randint(1, 3)
                images = [np.ascontiguousarray(np.rot90(im, -rot_k))
                          for im in images]
            payload = pdf_text.build_scanned_pdf(
                images, codec="dct" if rng.random() < 0.5 else "flate")
            return {
                "url": url, "warc_ts": warc_ts, "html": payload,
                "text": expected_text, "lang": lang,
                "expected_title": title,
                "expected_fields": expected_fields, "kind": kind,
            }
        body = [_sentence(rng, rng.randint(3, 4))[:cap2]
                for _ in range(rng.randint(4, 24))]
        # ~half the scanned docs carry the kv block as a two-column TABLE
        # (label col at cell 0, value col at cell 18): the raster
        # borderless-table detector must recover it — table text is
        # structured output, excluded from raw_text (same rule as HTML)
        as_table = rng.random() < 0.5
        if as_table:
            text_lines = list(body)
            kv_rows = [("Invoice Number", invoice_no), ("Date", date_str),
                       ("Total", total_str)]
            render_lines = body + [lbl.ljust(18) + val for lbl, val in kv_rows]
        else:
            text_lines = body + kv_lines
            render_lines = text_lines
        page_specs: list[list[tuple]] = [[(36, 72, title, 3)]]
        y = 120
        for k, tl in enumerate(render_lines):
            # keep the 3-row kv table on ONE page: a split run would fall
            # under the detector's min_rows and leak into the text flow
            block_rows = 3 if (as_table and k == len(render_lines) - 3) else 1
            if y + (block_rows - 1) * 24 > 760:
                page_specs.append([])
                y = 72
            page_specs[-1].append((36, y, tl, 2))
            y += 24
        images = [glyphs.render_page(spec) for spec in page_specs]
        # ~25% of scanned docs are stored ROTATED (the scanner fed the page
        # sideways/upside-down) — extraction's O10 orientation detection
        # must recover the upright text; ground truth is unchanged
        if rng.random() < 0.25:
            import numpy as np

            rot_k = rng.randint(1, 3)
            images = [np.ascontiguousarray(np.rot90(im, -rot_k))
                      for im in images]
        payload = pdf_text.build_scanned_pdf(
            images, codec="dct" if rng.random() < 0.5 else "flate")
        expected_text = "\n".join([title] + text_lines)
    elif kind == "pdf":
        # ~half the PDFs are long documents that paginate -> multi-page
        # fan-out is exercised by entry()'s byte-identity gate (S1)
        if rng.random() < 0.5:
            paras = paras + [_sentence(rng, rng.randint(8, 25))
                             for _ in range(rng.randint(15, 30))]
        # R4 style subset: title is bold (the reference's near-top +
        # large-font title role also carries the bold span flag)
        pages_lines: list[list[tuple]] = [[(72.0, 72.0, title, 24.0, "bold")]]
        y = 120.0
        for text_line in paras + kv_lines:
            if y > 720.0:  # bottom margin -> new page, top margin
                pages_lines.append([])
                y = 72.0
            pages_lines[-1].append((72.0, y, text_line, 12.0))
            y += 30.0
        # compression / positioning-operator variety: FlateDecode streams and
        # Td-relative positioning both round-trip byte-identically
        payload = pdf_text.build_pdf_pages(
            pages_lines, compress=rng.random() < 0.5, use_td=rng.random() < 0.3)
        # expected reading order: (page, y-band, x); lines are appended
        # top-down per page so insertion order == reading order
        expected_text = "\n".join([title] + paras + kv_lines)
    else:
        nav_items = "".join(
            f'<li><a href="/{rng.choice(WORDS)}">{rng.choice(WORDS)}</a></li>'
            for _ in range(6 * scale))
        sidebar_items = "".join(
            f'<li><a href="/t/{rng.choice(WORDS)}-{k}">{rng.choice(WORDS)}</a></li>'
            for k in range(5 * scale))
        table_rows = "".join(
            f"<tr><td>{k.replace('_', ' ').title()}</td><td>{v}</td></tr>"
            for k, v in expected_fields.items())
        # line-items table (every 3rd HTML page, index-keyed so the rng
        # sequence above is untouched): a 4-column invoice grid — the
        # "table-like content -> normalized.line_items[]" shape
        # (JSON_SCHEMA.md:360-395). Cells are structured output, never
        # raw_text, so expected_text is unchanged.
        items_html = ""
        if i % 3 == 0:
            rows = []
            for k in range(2 + i % 4):
                qty = (i + 7 * k) % 9 + 1
                unit = ((i * 13 + k * 101) % 9000 + 100) / 100.0
                desc = WORDS[(i + k) % len(WORDS)]
                rows.append(f"<tr><td>{desc}</td><td>{qty}</td>"
                            f"<td>${unit:.2f}</td><td>${qty * unit:.2f}</td></tr>")
            items_html = ("<table><tr><th>Item</th><th>Qty</th>"
                          "<th>Unit Price</th><th>Amount</th></tr>"
                          + "".join(rows) + "</table>")
        body_paras = "".join(f"<p>{p}</p>" for p in paras)
        kv_html = "".join(f"<p>{kv}</p>" for kv in kv_lines)
        payload = f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>{title}</title>
<style>body {{ margin: 0 }}</style>
<script>var x = {i};</script>
</head><body>
<header><div class="logo">Example Site</div><nav><ul>{nav_items}</ul></nav></header>
<div class="cookie-banner">We use cookies. <a href="/accept">Accept</a></div>
<main><article>
<h1>{title}</h1>
{body_paras}
{kv_html}
<table>{table_rows}</table>
{items_html}
</article></main>
<aside class="sidebar"><h3>Related</h3><ul>{sidebar_items}</ul></aside>
<footer><p><a href="/about">About</a> | <a href="/privacy">Privacy</a></p>
<p class="copyright">© 2026 Example Site</p></footer>
</body></html>""".encode("utf-8")
        # expected main content: h1 + paragraphs + kv lines, in document
        # order, "\n"-joined (the sidebar h3 "Related" is inside an aside and
        # stripped; table cells are structured output, not raw_text)
        expected_text = "\n".join([title] + paras + kv_lines)

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": payload,
        "text": expected_text,
        "lang": lang,
        "expected_title": title,
        "expected_fields": expected_fields,
        "kind": kind,
    }


def generate_pages(n_rows: int, seed: int = 42, n_hosts: int = 50,
                   scale: int = 1) -> list[dict]:
    """Generate the pages table rows (input columns only)."""
    return [make_page(i, seed=seed, n_hosts=n_hosts, scale=scale)
            for i in range(n_rows)]


def pages_spark_rows(n_rows: int, seed: int = 42, n_hosts: int = 50,
                     scale: int = 1):
    """Rows projected to the input_hint columns, for spark.createDataFrame."""
    for p in generate_pages(n_rows, seed=seed, n_hosts=n_hosts, scale=scale):
        yield (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
