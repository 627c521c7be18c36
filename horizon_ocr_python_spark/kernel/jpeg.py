"""Baseline JPEG codec in pure numpy + stdlib — no PIL/cv2/libjpeg.

The reference decodes real-world images through PIL (io/image.py:49-148);
Common-Crawl image payloads are overwhelmingly JPEG, so without this the
P1-P11 image kernels were unreachable from real bytes. This module
implements the ITU T.81 *baseline sequential* subset:

- decoder: SOI/APP*/DQT/DHT/SOF0/DRI/SOS parse, huffman entropy decode with
  byte-unstuffing and restart markers, dequantize, inverse zigzag,
  vectorized IDCT (one einsum over all blocks), chroma upsampling for
  sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), BT.601 YCbCr->RGB.
  Progressive (SOF2) and arithmetic variants raise NotImplementedError —
  contained upstream as an error row, never a task failure.
- encoder: the matching writer (quality-scaled Annex K quant tables,
  standard Annex K huffman tables, optional 4:2:0 subsampling) used by the
  synthetic generator so decode is exercised against known pixels.

All constant tables below are the public ITU T.81 Annex K defaults.
Entropy decode is sequential Python by construction (bit-serial huffman);
the per-block math is numpy-vectorized. At dataset scale the codec runs
inside Arrow batches (operators/arrow_ops), one image per loop iteration —
the same per-document containment boundary as the text path.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# --- constant tables (ITU T.81 Annex K) --------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8x8 DCT-II basis
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --- huffman machinery --------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical huffman (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


@lru_cache(maxsize=64)
def _decode_lut(bits: tuple, vals: tuple) -> list:
    """16-bit-prefix lookup table: lut[prefix] = symbol<<8 | code_length
    (0 = invalid). One O(64k) build per distinct huffman table per process
    (cached — the Annex K tables repeat across every standard file), then
    each symbol decodes in one array index instead of up to 16 bit reads."""
    lut = np.zeros(1 << 16, dtype=np.uint32)
    for sym, (code, ln) in _build_codes(list(bits), list(vals)).items():
        base = code << (16 - ln)
        lut[base:base + (1 << (16 - ln))] = (sym << 8) | ln
    # tuple entries: indexing is as fast as a list in the hot loop, and the
    # lru_cache'd value is shared by every decode in the process — it must
    # be immutable (a caller mutating a cached list would silently corrupt
    # huffman decoding for all subsequent JPEGs)
    return tuple(lut.tolist())


@lru_cache(maxsize=64)
def _fast_lut(bits: tuple, vals: tuple, is_ac: bool) -> tuple:
    """16-bit-prefix -> fully decoded symbol INCLUDING its magnitude bits,
    in one lookup: (consumed_bits, code_len, run, value).

    `run` >= 0: a coefficient (AC zero-run length; always 0 for DC) whose
    sign-extended value is `value` and which consumed code+magnitude =
    `consumed_bits`; run == -1: EOB; run == -2: ZRL (both consume only the
    code). None: invalid prefix or code+magnitude > 16 bits — the caller
    falls back to the exact two-step path. Values are precomputed with the
    identical T.81 F.12 sign extension, so a fast-path decode is
    bit-identical to the two-step one."""
    codes = _build_codes(list(bits), list(vals))
    lut: list = [None] * (1 << 16)
    for sym, (code, ln) in codes.items():
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        if is_ac:
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                entry = (ln, ln, -2 if r == 15 else -1, 0)
                lut[lo:hi] = [entry] * (hi - lo)
                continue
        else:
            r, s = 0, sym
            if s == 0:
                entry = (ln, ln, 0, 0)
                lut[lo:hi] = [entry] * (hi - lo)
                continue
        if ln + s > 16:
            continue  # magnitude spills past the window: exact fallback
        shift = 16 - ln - s
        mask = (1 << s) - 1
        half = 1 << (s - 1)
        rebase = (1 << s) - 1
        total = ln + s
        lut[lo:hi] = [
            (total, ln, r,
             mag if mag >= half else mag - rebase)
            for p in range(lo, hi)
            for mag in ((p >> shift) & mask,)]
    return tuple(lut)


@lru_cache(maxsize=64)
def _ac_multi_lut(bits: tuple, vals: tuple) -> tuple:
    """16-bit-prefix -> a TUPLE of fully decoded AC ops, as many complete
    code+magnitude units as fit in the window (document JPEGs average
    ~5-8 bits per AC unit, so one lookup typically yields 2-3
    coefficients — halving the per-symbol interpreter iterations).

    Each op is (dk, value, cum_after, cum_after_code):
      dk >= 0, value int  — a coefficient after a zero-run of dk
      dk == 16, value None — ZRL (cum_after == cum_after_code)
      dk == -1, value None — EOB, always the last op
    cum_* are bits consumed through this op (with/without its magnitude),
    so the runtime can rewind to the exact single-step consumption at the
    k>63 corner. None = invalid first code or nothing fits — the caller
    falls back to the exact two-step path."""
    codes = _build_codes(list(bits), list(vals))
    lut: list = [None] * (1 << 16)
    # single-symbol decoder over the 16-bit window, used by the simulation
    # (prefix-freedom guarantees a decode whose length fits the remaining
    # real bits is the genuine symbol)
    single: list = [None] * (1 << 16)
    for sym, (code, ln) in codes.items():
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        for p in range(lo, hi):
            single[p] = (sym, ln)
    for p in range(1 << 16):
        ops = []
        pos = 0
        while pos < 16:
            window = (p << pos) & 0xFFFF  # remaining bits, left-aligned
            dec = single[window]
            if dec is None:
                break  # code not fully in window (or invalid): stop here
            sym, ln = dec
            # a code is only trustworthy if it fits entirely in-window
            if pos + ln > 16:
                break
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    pos += ln
                    ops.append((16, None, pos, pos))
                    continue
                pos += ln
                ops.append((-1, None, pos, pos))  # EOB terminates
                break
            if pos + ln + s > 16:
                break  # magnitude spills out: stop before this unit
            mag = (p >> (16 - pos - ln - s)) & ((1 << s) - 1)
            v = mag if mag >= (1 << (s - 1)) else mag - (1 << s) + 1
            ops.append((r, v, pos + ln + s, pos + ln))
            pos += ln + s
            if len(ops) >= 6:
                break
        lut[p] = tuple(ops) if ops else None
    return tuple(lut)


def warm_annex_k_luts() -> None:
    """Prebuild the decode LUTs for the Annex K default tables (what the
    in-repo encoder and virtually every baseline JFIF in the wild use) so
    forked Spark workers inherit them copy-on-write from the daemon."""
    for cls, bits, vals in ((0, DC_LUMA_BITS, DC_LUMA_VALS),
                            (1, AC_LUMA_BITS, AC_LUMA_VALS),
                            (0, DC_CHROMA_BITS, DC_CHROMA_VALS),
                            (1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        _decode_lut(tuple(bits), tuple(vals))
        if cls == 0:
            _fast_lut(tuple(bits), tuple(vals), False)
        else:
            _ac_multi_lut(tuple(bits), tuple(vals))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _split_entropy(data: bytes, pos: int) -> list[tuple[bytes, int | None]]:
    """Pre-scan the entropy stream once: unstuff 0xFF00 and split at restart
    markers. Returns [(clean_bytes, trailing_restart_marker_or_None)] —
    trailing None means the segment ends at a non-restart marker or EOF
    (the byte-serial reader raised EOFError there; the segmented reader
    stops identically). One linear bytes.find pass replaces the per-4-byte
    `0xFF in chunk` probe the hot refill used to pay."""
    segs: list[tuple[bytes, int | None]] = []
    parts: list[bytes] = []
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            parts.append(data[i:] if j < 0 else data[i:j])
            segs.append((b"".join(parts), None))
            return segs
        nxt = data[j + 1]
        if nxt == 0x00:            # stuffed 0xFF: keep the FF, drop the 00
            parts.append(data[i:j + 1])
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            parts.append(data[i:j])
            segs.append((b"".join(parts), nxt))
            parts = []
            i = j + 2
        else:                      # real marker: entropy data ends here
            parts.append(data[i:j])
            segs.append((b"".join(parts), None))
            return segs


class _BitReader:
    """Buffered entropy bit reader over pre-unstuffed restart segments.

    Markers/EOF are DEFERRED: filling stops there (`stopped` records why)
    and the stored exception is raised only when a consumer actually needs
    bits past the real stream — bits buffered before the marker decode
    normally, matching the byte-serial reference behavior."""

    def __init__(self, data: bytes, pos: int):
        self.segs = _split_entropy(data, pos)
        self.seg_i = 0
        self.buf, self.marker = self.segs[0]
        self.pos = 0          # position within buf
        self.window = 0       # MSB = oldest bit
        self.nbits = 0        # real (non-padded) bits in window
        self.stopped: Exception | None = None

    def _fill_to(self, need: int):
        buf = self.buf
        p = self.pos
        while self.nbits < need and self.stopped is None:
            chunk = buf[p:p + 8]
            ln = len(chunk)
            if ln:
                p += ln
                self.window = (self.window << (ln << 3)) | \
                    int.from_bytes(chunk, "big")
                self.nbits += ln << 3
            elif self.marker is not None:
                self.stopped = _RestartMarker(self.marker)
            else:
                self.stopped = EOFError("truncated entropy data")
        self.pos = p

def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --- encoder -------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), \
        img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """pad to 8-multiples (edge replicate) and split into (N, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), hh // 8, ww // 8


def _encode_plane_blocks(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(N,8,8) spatial -> (N,64) zigzagged quantized coefficients."""
    shifted = blocks - 128.0
    coeffs = np.einsum("ij,njk,lk->nil", _C, shifted, _C)
    q = np.round(coeffs / quant.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _entropy_encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                          dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample_420: bool = False) -> bytes:
    """Encode an HxWx3 RGB uint8 array as baseline JFIF."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img)
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if subsample_420:
        # average 2x2 chroma (pad to even first)
        ph, pw = -h % 2, -w % 2
        cc = np.pad(ycc[..., 1:], ((0, ph), (0, pw), (0, 0)), mode="edge")
        cc = cc.reshape(cc.shape[0] // 2, 2, cc.shape[1] // 2, 2, 2).mean(axis=(1, 3))
        planes = [ycc[..., 0], cc[..., 0], cc[..., 1]]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component zigzag blocks arranged on the MCU grid
    comp_zz, comp_bw = [], []
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        # pad the plane so its block grid covers whole MCUs
        need_h, need_w = mcus_y * sv * 8, mcus_x * sh * 8
        plane = np.pad(plane, ((0, need_h - plane.shape[0]),
                               (0, need_w - plane.shape[1])), mode="edge")
        blocks, bh, bw_ = _blockify(plane)
        zz = _encode_plane_blocks(blocks, ql if ci == 0 else qc)
        comp_zz.append(zz.reshape(bh, bw_, 64))
        comp_bw.append((bh, bw_))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _entropy_encode_block(
                            writer, zz, preds[ci],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    for cls, tid, bits, vals in [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
                                 (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
                                 (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                                 (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = struct.pack(">B", 3)
    for ci in range(3):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to an HxWx3 RGB uint8 array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)

    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 allows runs of 0xFF fill bytes pre-marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        payload = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8) \
                    .astype(np.int32)
                inv = np.empty(64, dtype=np.int32)
                inv[ZIGZAG] = tbl  # stored zigzagged -> natural order
                quant[tq] = inv
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                huff[(cls, tid)] = (
                    _decode_lut(tuple(bits), tuple(vals)),
                    _fast_lut(tuple(bits), tuple(vals), False)
                    if cls == 0 else None,
                    _ac_multi_lut(tuple(bits), tuple(vals))
                    if cls == 1 else None)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            comps = []
            for ci in range(nc):
                cid, sf, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for si in range(ns):
                cs, tables = payload[1 + 2 * si], payload[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tables >> 4, "ac": tables & 0x0F})
            return _decode_scan(data, pos + 2 + seg_len, frame, scan,
                                quant, huff, restart_interval)
        pos += 2 + seg_len
    raise ValueError("no scan data found")


def _decode_scan(data: bytes, pos: int, frame: dict, scan: list[dict],
                 quant: dict, huff: dict, restart_interval: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # sparse coefficient sink per component: (block_row_index*64 + zigzag_k,
    # value) triplet lists, scattered into the dense store ONCE at the end.
    # The previous per-block numpy row view + per-coefficient scalar
    # __setitem__ cost ~2 us of numpy overhead per 8x8 block — document
    # pages are mostly DC-only blocks, so that overhead was the majority of
    # entropy-decode time (measured 1.6x whole-decode win at quality 88).
    idx_lists: list[list[int]] = [[] for _ in scan]
    val_lists: list[list[int]] = [[] for _ in scan]
    # per-component constants hoisted out of the MCU loop: (v, h,
    # (dc_slow, dc_fast, ac_slow, ac_multi), blocks_per_row, idx_sink,
    # val_sink)
    def comp_luts(c):
        dcs = huff[(0, c["dc"])]
        acs = huff[(1, c["ac"])]
        return (dcs[0], dcs[1], acs[0], acs[2])

    geom = [(c["v"], c["h"], comp_luts(c),
             mcus_x * c["h"], idx_lists[ci], val_lists[ci])
            for ci, c in enumerate(scan)]

    def finish() -> np.ndarray:
        store = []
        for ci, c in enumerate(scan):
            bh, bw = mcus_y * c["v"], mcus_x * c["h"]
            flat = np.zeros((bh * bw * 64,), dtype=np.int32)
            if idx_lists[ci]:
                flat[np.array(idx_lists[ci], dtype=np.int64)] = \
                    np.array(val_lists[ci], dtype=np.int32)
            store.append(flat.reshape(bh, bw, 64))
        return _finish(store, scan, quant, h, w, hmax, vmax)

    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    if hmax == 1 and vmax == 1:
        # 4:4:4 / grayscale specialization: every component contributes
        # exactly one block per MCU at the same grid offset, so the two
        # inner sampling loops (one iteration each) and the per-component
        # base arithmetic collapse — measured ~0.3 s / 30 megapixel-scale
        # pages of pure loop overhead
        g = [(luts, idx, val) for _, _, luts, _, idx, val in geom]
        for my in range(mcus_y):
            rowb = my * mcus_x
            for mx in range(mcus_x):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    try:
                        _skip_to_restart(br)
                    except EOFError:
                        return finish()
                    preds = [0] * len(scan)
                base = (rowb + mx) * 64
                try:
                    for ci, (luts, idx, val) in enumerate(g):
                        _decode_block(br, luts, preds, ci, base, idx, val)
                except (EOFError, _RestartMarker):
                    return finish()
                mcu_count += 1
        return finish()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # byte-aligned RSTn expected between MCUs
                try:
                    _skip_to_restart(br)
                except EOFError:
                    return finish()
                preds = [0] * len(scan)
            try:
                for ci, (cv, ch, luts, bpr, idx, val) in enumerate(geom):
                    for by in range(cv):
                        row_base = ((my * cv + by) * bpr + mx * ch) * 64
                        for bx in range(ch):
                            _decode_block(br, luts, preds, ci,
                                          row_base + bx * 64, idx, val)
            except (EOFError, _RestartMarker):
                # truncated stream: decode what we have (containment)
                return finish()
            mcu_count += 1
    return finish()


def _skip_to_restart(br: _BitReader):
    # discard pad bits + any unread remainder of the segment, step past the
    # trailing RSTn into the next segment (byte-serial equivalent: scan
    # forward to the next FF Dn — entropy bytes contain FF only stuffed, so
    # the next restart IS the segment's trailing marker)
    br.nbits = 0
    br.window = 0
    br.stopped = None
    if br.marker is None:
        raise EOFError("restart marker not found")
    br.seg_i += 1
    br.buf, br.marker = br.segs[br.seg_i]
    br.pos = 0


def _decode_block(br: _BitReader, luts,
                  preds: list[int], ci: int, base: int,
                  idx: list[int], val: list[int]) -> None:
    """One 8x8 block, entropy loop fully inlined.

    Fast path (the overwhelming majority of symbols): one combined
    16-bit-prefix lookup (`_fast_lut`) yields code + sign-extended
    magnitude together — ~half the interpreter work of the two-step form.
    Exact fallback (stream tail where fewer than 16 bits remain, or
    code+magnitude > 16 bits, or invalid prefix): the original two-step
    decode, bit-for-bit identical semantics including deferred
    marker/EOF errors. Decoded coefficients are APPENDED as
    (base + zigzag_k, value) to the caller's sink lists — list.append is
    ~10x cheaper than a numpy scalar store, and the scatter happens once
    per scan. The reader state is mirrored into locals for the hot loop and
    written back only on normal return — on EOF/_RestartMarker the caller
    abandons the scan, so the un-synced state is never read."""
    dc_slow, dc_fast, ac_slow, ac_multi = luts
    window, nbits = br.window, br.nbits
    idx_append, val_append = idx.append, val.append
    k = 0  # 0 = decode DC next, else next AC slot
    while True:
        if nbits < 16:
            br.window, br.nbits = window, nbits
            br._fill_to(32)
            window, nbits = br.window, br.nbits
        entry = None
        if nbits >= 16:
            if k == 0:
                entry = dc_fast[window >> (nbits - 16)]
            else:
                ops = ac_multi[window >> (nbits - 16)]
                if ops is not None:
                    # apply as many fully-decoded AC units as the window
                    # held; `used` tracks exact single-step consumption
                    used = 0
                    done = False
                    for dk, v, cum, cumcode in ops:
                        if v is None:
                            if dk < 0:  # EOB
                                used = cum
                                done = True
                                break
                            k += 16     # ZRL
                            used = cum
                            if k >= 64:
                                done = True
                                break
                            continue
                        k += dk
                        if k > 63:
                            used = cumcode  # code consumed, magnitude not
                            done = True
                            break
                        idx_append(base + k)
                        val_append(v)
                        k += 1
                        used = cum
                        if k >= 64:
                            done = True
                            break
                    nbits -= used
                    window &= (1 << nbits) - 1
                    if done:
                        break
                    continue
        if entry is not None:
            consumed, ln, r, v = entry
            if k == 0:
                nbits -= consumed
                window &= (1 << nbits) - 1
                preds[ci] += v
                idx_append(base)
                val_append(preds[ci])
                k = 1
                continue
            if r >= 0:  # a coefficient
                k += r
                if k > 63:
                    nbits -= ln  # two-step form consumed only the code here
                    window &= (1 << nbits) - 1
                    break
                nbits -= consumed
                window &= (1 << nbits) - 1
                idx_append(base + k)
                val_append(v)
                k += 1
                if k >= 64:
                    break
                continue
            nbits -= ln
            window &= (1 << nbits) - 1
            if r == -2:  # ZRL
                k += 16
                if k < 64:
                    continue
            break  # EOB (or ZRL run past the block)
        # ---- exact two-step fallback for ONE symbol ----
        prefix = (window >> (nbits - 16)) if nbits >= 16 \
            else (window << (16 - nbits))
        entry = (ac_slow if k else dc_slow)[prefix]
        ln = entry & 0xFF
        if ln == 0:
            raise ValueError("invalid huffman code")
        if ln > nbits:
            raise br.stopped or EOFError("truncated entropy data")
        nbits -= ln
        window &= (1 << nbits) - 1
        sym = entry >> 8
        if k == 0:  # DC: sym = category t, then t raw diff bits
            t = sym
            diff = 0
            if t:
                if nbits < t:
                    br.window, br.nbits = window, nbits
                    br._fill_to(t)
                    window, nbits = br.window, br.nbits
                    if nbits < t:
                        raise br.stopped or EOFError("truncated entropy data")
                nbits -= t
                v = window >> nbits
                window &= (1 << nbits) - 1
                diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            preds[ci] += diff
            idx_append(base)
            val_append(preds[ci])
            k = 1
            continue
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                if k < 64:
                    continue
            break  # EOB (or ZRL run past the block)
        k += r
        if k > 63:
            break
        if nbits < s:
            br.window, br.nbits = window, nbits
            br._fill_to(s)
            window, nbits = br.window, br.nbits
            if nbits < s:
                raise br.stopped or EOFError("truncated entropy data")
        nbits -= s
        v = window >> nbits
        window &= (1 << nbits) - 1
        idx_append(base + k)
        val_append(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
        k += 1
        if k >= 64:
            break
    br.window, br.nbits = window, nbits


def _finish(store, scan, quant, h, w, hmax, vmax) -> np.ndarray:
    planes = []
    for ci, c in enumerate(scan):
        zz = store[ci]
        bh, bw = zz.shape[:2]
        flat = zz.reshape(-1, 64)
        # DC-only fast path: document scans are mostly uniform background,
        # so the bulk of blocks carry no AC energy — their IDCT is the
        # constant dc*C00*C00 (same multiply order as the einsum term, so
        # the value is bit-identical to the full transform's).
        has_ac = flat[:, 1:].any(axis=1)
        spatial = np.empty((bh * bw, 8, 8), dtype=np.float64)
        dc = flat[:, 0].astype(np.float64) * float(quant[c["tq"]][0])
        spatial[:] = (dc * _C[0, 0] * _C[0, 0])[:, None, None]
        idx = np.flatnonzero(has_ac)
        if idx.size:
            coeffs = np.zeros((idx.size, 64), dtype=np.float64)
            coeffs[:, ZIGZAG] = flat[idx]
            coeffs *= quant[c["tq"]].astype(np.float64)
            blocks = coeffs.reshape(-1, 8, 8)
            spatial[idx] = np.einsum("ji,njk,kl->nil", _C, blocks, _C)
        spatial += 128.0
        plane = (spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full resolution (skip for 1x1 factors: np.repeat(x, 1)
        # is an identity that still copies the whole plane)
        rv, rh = vmax // c["v"], hmax // c["h"]
        if rv > 1:
            plane = np.repeat(plane, rv, axis=0)
        if rh > 1:
            plane = np.repeat(plane, rh, axis=1)
        planes.append(plane[:h, :w])
    y = planes[0]
    if len(planes) >= 3:
        cb, cr = planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    else:
        rgb = np.stack([y] * 3, axis=-1)
    np.rint(rgb, out=rgb)
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.astype(np.uint8)
