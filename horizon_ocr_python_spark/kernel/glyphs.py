"""Deterministic synthetic-glyph codec: the no-weights OCR stand-in for the
scanned-PDF path.

The reference rasterizes every PDF and routes low-char pages through its OCR
stack (io/pdf.py:117-142; scanned gate extract/pdf_style_extractor.py:67-98);
without model weights its recognizers degrade to a deterministic fallback.
This module provides that fallback as a REAL (toy) recognition pipeline:

- each printable-ASCII character owns a unique md5-derived 5x7 bitmap
  (synthetic shapes standing in for a font — the honest "deterministic
  fake" for the missing OCR model);
- `render_page` rasterizes text lines onto a grayscale page image at an
  integer glyph scale (fixed-pitch, like typewriter print);
- `recognize_page` is the full detector/recognizer chain on PIXELS ONLY:
  ink thresholding -> row-projection line banding (the D6 fallback-detector
  shape) -> per-band glyph-scale inference -> fixed-pitch cell walk ->
  block-majority downsample -> nearest-template (Hamming) match -> line and
  word structs with bboxes and confidences.

render -> recognize round-trips text exactly on lossless pages, and the
Hamming matcher absorbs JPEG/preprocess blur; everything is seeded bytes
math — no randomness, no model state.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_H, GLYPH_W = 7, 5
CELL_GAP = 1          # blank columns between cells, in glyph units
PITCH = GLYPH_W + CELL_GAP   # horizontal cell pitch, in glyph units
CHARSET = "".join(chr(c) for c in range(32, 127))


def _bitmap(ch: str) -> np.ndarray:
    """Unique deterministic 5x7 bitmap per character (space stays blank).

    Bits come from md5(char); the two top corners are forced ON for every
    non-space glyph so no bitmap is blank and scale inference always sees
    ink at the cell top."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    digest = hashlib.md5(f"glyph:{ch}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    g = bits[:GLYPH_H * GLYPH_W].reshape(GLYPH_H, GLYPH_W).astype(bool)
    g[0, 0] = g[0, GLYPH_W - 1] = True
    return g


GLYPHS = {ch: _bitmap(ch) for ch in CHARSET}
_NONSPACE = [ch for ch in CHARSET if ch != " "]
_TEMPLATES = np.stack([GLYPHS[ch] for ch in _NONSPACE]).reshape(
    len(_NONSPACE), -1)
# uniqueness is a correctness precondition of the codec — assert it once
assert len({t.tobytes() for t in _TEMPLATES}) == len(_NONSPACE)
# float64 twins for the matmul Hamming distance in _walk: with f, t in
# {0,1}, |f XOR t| = sum(f) + sum(t) - 2*f.t — all values are small exact
# integers in float64, so argmin/confidences are bit-identical to the
# boolean count_nonzero form
_TEMPLATES_F = _TEMPLATES.astype(np.float64)
_TEMPLATE_ROWSUM = _TEMPLATES_F.sum(axis=1)


def render_page(lines: list[tuple], width: int = 612,
                height: int = 792) -> np.ndarray:
    """Rasterize [(x, y_top, text, scale)] onto a white page (uint8 gray,
    ink=0). Glyphs are fixed-pitch: cell = 6*scale px wide, 7*scale tall.
    Content outside the page is clipped."""
    page = np.full((height, width), 255, dtype=np.uint8)
    for x, y, text, scale in lines:
        s = int(scale)
        for j, ch in enumerate(text):
            g = GLYPHS.get(ch)
            if g is None or not g.any():
                continue
            gx = int(x) + j * PITCH * s
            gy = int(y)
            tile = np.kron(g, np.ones((s, s), dtype=bool))
            h, w = tile.shape
            if gy + h > height or gx + w > width or gx < 0 or gy < 0:
                continue  # clipped: the generator sizes lines to fit
            region = page[gy:gy + h, gx:gx + w]
            region[tile] = 0
    return page


def _bands(mask: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous True runs of a 1-D mask as (start, end_inclusive)."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    splits = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[splits + 1]))
    ends = np.concatenate((idx[splits], [idx[-1]]))
    return list(zip(starts.tolist(), ends.tolist()))


def _walk(band: np.ndarray, x0: int, x1: int, s: int):
    """Fixed-pitch cell walk from x0, fully vectorized: stack every cell's
    ink block, one block-majority downsample for the whole line, one
    Hamming distance matrix against all templates. Returns
    (chars, confs, total_dist)."""
    pitch = PITCH * s
    h, w = GLYPH_H * s, GLYPH_W * s
    n_cells = max(1, -(-(x1 - x0 + 1) // pitch))
    # pad so every cell slice (including negative-offset ones from the
    # alignment search) is in-bounds
    left = max(0, -x0)
    padded = np.zeros((h, band.shape[1] + left + n_cells * pitch + w),
                      dtype=bool)
    bh = min(band.shape[0], h)
    padded[:bh, left:left + band.shape[1]] = band[:bh]
    idx = (x0 + left) + pitch * np.arange(n_cells)
    # one fancy-index gather for all cells (r6: replaces an n-slice
    # np.stack), then integer block-majority: mean >= 0.5 over an s*s
    # block of bools <=> 2*sum >= s*s, exactly
    blocks = padded[:, idx[:, None] + np.arange(w)[None, :]] \
        .transpose(1, 0, 2)                                   # (n, 7s, 5s)
    sums = blocks.reshape(n_cells, GLYPH_H, s, GLYPH_W, s).sum(axis=(2, 4))
    flat = (2 * sums >= s * s).reshape(n_cells, -1)           # (n, 35)
    blank = ~flat.any(axis=1)
    # Hamming distance as ONE matmul (see _TEMPLATES_F note): exact small
    # integers in float64, so ties/argmin match the count_nonzero form
    f = flat.astype(np.float64)
    dists = (f.sum(axis=1)[:, None] + _TEMPLATE_ROWSUM[None, :]
             - 2.0 * (f @ _TEMPLATES_F.T))                    # (n, 95)
    best = np.argmin(dists, axis=1)
    best_d = dists[np.arange(n_cells), best]
    chars = [" " if blank[c] else _NONSPACE[best[c]] for c in range(n_cells)]
    confs = [1.0 if blank[c] else 1.0 - best_d[c] / _TEMPLATES.shape[1]
             for c in range(n_cells)]
    total = int(best_d[~blank].sum())
    return chars, confs, total


def recognize_page(gray: np.ndarray, ink_threshold: int = 128) -> list[dict]:
    """Recognize fixed-pitch glyph text from a grayscale page.

    Pixels only: row-projection -> line bands; band height -> glyph scale;
    first/last ink column -> cell walk at the inferred pitch; per cell,
    block-majority downsample + Hamming nearest-template. Returns line
    structs in the pipeline's text-line shape:
        {text, x, y, page(=unset), font_size, words: [{text,bbox,confidence}],
         bbox, confidence}
    with font_size = 7*scale (the size proxy the title heuristic uses).
    """
    ink = np.asarray(gray) < ink_threshold
    lines: list[dict] = []
    for y0, y1 in _bands(ink.any(axis=1)):
        s = max(1, round((y1 - y0 + 1) / GLYPH_H))
        band = ink[y0:y0 + GLYPH_H * s]
        cols = _bands(band.any(axis=0))
        if not cols:
            continue
        x0, x1 = cols[0][0], cols[-1][1]
        pitch = PITCH * s
        # alignment search: preprocess blur can erode/extend the first
        # glyph's edge columns, shifting the detected x0 by a pixel or two
        # and derailing every downstream cell — try +-s offsets and keep
        # the walk whose total template distance is smallest. The detected
        # x0 is tried FIRST: a zero-distance walk is unbeatable (distances
        # are >= 0), so clean bands — the common case — pay one walk, and
        # the full sweep runs only for degraded bands.
        chars0, confs0, total0 = _walk(band, x0, x1, s)
        if total0 == 0:
            best = (chars0, confs0, 0, x0)
        else:
            best = None
            for dx in range(-s, s + 1):
                chars, confs, total = (
                    (chars0, confs0, total0) if dx == 0
                    else _walk(band, x0 + dx, x1, s))
                if best is None or total < best[2]:
                    best = (chars, confs, total, x0 + dx)
        chars, confs, _, x0 = best[0], best[1], best[2], best[3]
        word_cells = [(c, ch, confs[c]) for c, ch in enumerate(chars)]
        n_cells = len(chars)
        text = "".join(chars).rstrip()
        if not text:
            continue
        # word structs: split on space cells, bbox per cell-range
        words = []
        start = None
        for c, ch, conf in word_cells + [(n_cells, " ", 1.0)]:
            if ch != " " and c < len(text):
                if start is None:
                    start = c
            elif start is not None:
                w_text = "".join(chars[start:c])
                words.append({
                    "text": w_text,
                    "bbox": (float(x0 + start * pitch), float(y0),
                             float(x0 + c * pitch - CELL_GAP * s),
                             float(y0 + GLYPH_H * s)),
                    "confidence": round(float(np.mean(confs[start:c])), 4),
                })
                start = None
        lines.append({
            "text": text,
            "x": float(x0),
            "y": float(y0),
            "font_size": float(GLYPH_H * s),
            "bbox": (float(x0), float(y0),
                     float(x0 + len(text) * pitch - CELL_GAP * s),
                     float(y0 + GLYPH_H * s)),
            "confidence": round(float(np.mean(confs[:len(text)])), 4),
            "words": words,
        })
    lines.sort(key=lambda ln: (int(ln["y"] // 50), ln["x"]))
    return lines


def max_chars(width: int = 612, margin: int = 36, scale: int = 2) -> int:
    """How many glyph cells fit on one line — the generator's wrap bound."""
    return (width - 2 * margin) // (PITCH * scale)


def osd_score(lines: list[dict]) -> float:
    """Char-weighted mean template confidence — the OSD quality signal.

    Public: kernel.document scores page acceptance with it (the
    IMAGE_TEXT_GATE dispatch)."""
    chars = sum(len(ln["text"]) for ln in lines)
    if not chars:
        return 0.0
    return sum(ln["confidence"] * len(ln["text"]) for ln in lines) / chars


_osd_score = osd_score  # backward-compat private alias


def recognize_with_osd(gray: np.ndarray,
                       accept: float = 0.9) -> tuple[list[dict], int, float]:
    """O10 orientation detection for the raster path (the reference's
    Tesseract-OSD slot, orientation_and_script_detection): recognize at
    each of the four page rotations and keep the one whose char-weighted
    template confidence wins — recognition score IS the osd signal, the
    same decision rule OSD engines use. Upright pages short-circuit after
    one pass (score >= `accept`), so the 4x cost is paid only by actually
    rotated scans.

    Returns (lines, k, score): `k` is the number of CCW quarter-turns that
    upright the stored image (np.rot90(stored, k)); lines come from the
    corrected image, so downstream never sees rotated geometry."""
    best: tuple[list[dict], int, float] | None = None
    for k in range(4):
        img = gray if k == 0 else np.rot90(gray, k)
        lines = recognize_page(img)
        score = _osd_score(lines)
        if k == 0 and score >= accept and lines:
            return lines, 0, score
        if best is None or score > best[2]:
            best = (lines, k, score)
    return best


def recognize_line_enhanced(gray: np.ndarray, bbox: tuple,
                            thresholds: tuple = (96, 160, 192)) -> dict | None:
    """Second-effort re-recognition of one line (the O7 recompute slot):
    crop the line's band and sweep the ink threshold — the enhancement
    dimension our pixel model actually has (faded ink / haze moves strokes
    across a fixed threshold; the sweep recovers them). Returns the best
    re-recognized line dict (bbox/words shifted back to page coordinates)
    or None when no threshold finds a line."""
    y0 = max(0, int(bbox[1]))
    y1 = int(bbox[3]) + 1
    crop = gray[y0:y1]
    best: dict | None = None
    for t in thresholds:
        cand = recognize_page(crop, ink_threshold=t)
        if not cand:
            continue
        ln = cand[0]
        if best is None or ln["confidence"] > best["confidence"]:
            best = ln
    if best is None:
        return None
    best["y"] += y0
    best["bbox"] = (best["bbox"][0], best["bbox"][1] + y0,
                    best["bbox"][2], best["bbox"][3] + y0)
    best["words"] = [{**w, "bbox": (w["bbox"][0], w["bbox"][1] + y0,
                                    w["bbox"][2], w["bbox"][3] + y0)}
                     for w in best["words"]]
    return best


# --- O3 dual-decoder arbitration ---------------------------------------------
# The reference's dual-model recognize (ocr/trocr.py:293-323): run the
# primary model, run the secondary, return the secondary's result iff its
# confidence is STRICTLY higher. Our two no-weights "models" are genuinely
# different decoders over the same crops: the hard-threshold Hamming
# matcher (primary — recognize_page machinery) and a soft grayscale
# correlation matcher (secondary — no binarization, scores each cell by
# mean absolute difference against the float templates, so haze and
# mid-gray strokes that a fixed threshold loses still vote).

def recognize_line_soft(gray: np.ndarray, bbox: tuple) -> dict | None:
    """Soft (grayscale) recognition of one line: band geometry from a
    generous ink mask, cells scored by 1 - mean|downsample - template|."""
    y0 = max(0, int(bbox[1]))
    y1 = int(bbox[3]) + 1
    crop = np.asarray(gray[y0:y1], dtype=np.float64)
    inkness = 1.0 - crop / 255.0               # 0 = paper, 1 = full ink
    # local contrast normalization: faint-but-consistent ink (the case a
    # fixed threshold can never read) is scaled up to full strength — the
    # decoder dimension the hard matcher lacks
    peak = inkness.max()
    if peak > 0.02:
        inkness = inkness / peak
    mask = inkness > 0.25                      # generous band/column mask
    rows = _bands(mask.any(axis=1))
    if not rows:
        return None
    ry0, ry1 = rows[0]
    s = max(1, round((ry1 - ry0 + 1) / GLYPH_H))
    band = inkness[ry0:ry0 + GLYPH_H * s]
    cols = _bands((band > 0.25).any(axis=0))
    if not cols:
        return None
    x0, x1 = cols[0][0], cols[-1][1]
    pitch = PITCH * s
    h, w = GLYPH_H * s, GLYPH_W * s
    n_cells = max(1, -(-(x1 - x0 + 1) // pitch))
    padded = np.zeros((h, band.shape[1] + n_cells * pitch + w))
    bh = min(band.shape[0], h)
    padded[:bh, :band.shape[1]] = band[:bh]
    idx = x0 + pitch * np.arange(n_cells)
    blocks = np.stack([padded[:, cx:cx + w] for cx in idx])
    down = blocks.reshape(n_cells, GLYPH_H, s, GLYPH_W, s).mean(axis=(2, 4))
    flat = down.reshape(n_cells, -1)                       # (n, 35) floats
    blank = flat.max(axis=1) < 0.25
    temps = _TEMPLATES.astype(np.float64)                  # (95, 35)
    dists = np.abs(flat[:, None, :] - temps[None, :, :]).mean(axis=2)
    best = np.argmin(dists, axis=1)
    best_d = dists[np.arange(n_cells), best]
    chars = ["" if blank[c] else _NONSPACE[best[c]] for c in range(n_cells)]
    text = "".join(ch if ch else " " for ch in chars).rstrip()
    if not text:
        return None
    confs = [1.0 if blank[c] else 1.0 - best_d[c] for c in range(n_cells)]
    conf = float(np.mean(confs[:len(text)]))
    # word structs from the fixed-pitch geometry (cell index == char index)
    import re

    yy = float(y0 + ry0)
    words = [{
        "text": m.group(0),
        "bbox": (float(x0 + m.start() * pitch), yy,
                 float(x0 + m.end() * pitch - CELL_GAP * s),
                 yy + GLYPH_H * s),
        "confidence": round(float(np.mean(confs[m.start():m.end()])), 4),
    } for m in re.finditer(r"[^ ]+", text)]
    return {"text": text, "x": float(x0), "y": yy,
            "font_size": float(GLYPH_H * s),
            "bbox": (float(x0), yy,
                     float(x0 + len(text) * pitch - CELL_GAP * s),
                     yy + GLYPH_H * s),
            "confidence": round(conf, 4), "words": words}


def recognize_line_dual(gray: np.ndarray, bbox: tuple,
                        primary: str = "hard") -> tuple[dict | None, str]:
    """recognize_with_dual_models (trocr.py:293-323) for the raster path:
    run both decoders; the SECONDARY wins iff its confidence is STRICTLY
    higher. Returns (line_dict_or_None, decoder_tag).

    `primary` routes the decoder order by P8 content type, mirroring the
    reference's recognize_batch dispatch (trocr.py:189-199: HANDWRITTEN
    crops go to the handwritten model, everything else — printed / mixed /
    unknown — to the printed model): "hard" = threshold-sweep first (the
    printed-model slot), "soft" = contrast-normalized correlation first
    (the handwritten-model slot). The strict-> arbitration rule is
    unchanged; routing only decides who holds the tie."""
    hard = recognize_line_enhanced(gray, bbox)
    soft = recognize_line_soft(gray, bbox)
    first, second = (hard, soft) if primary != "soft" else (soft, hard)
    first_tag, second_tag = (("hard", "soft") if primary != "soft"
                             else ("soft", "hard"))
    if second is not None and (
            first is None
            or second["confidence"] > first["confidence"]):
        return second, second_tag
    return first, first_tag
