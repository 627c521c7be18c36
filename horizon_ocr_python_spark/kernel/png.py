"""Minimal PNG codec — pure stdlib (zlib + struct + numpy), no PIL/cv2.

Supports the subset the engine generates and ingests: 8-bit RGB (color
type 2) and 8-bit grayscale (color type 0), non-interlaced, any of the five
standard scanline filters on decode, filter 0 on encode. This makes the
multimodal image path REAL for PNG (decode is no longer a test double);
JPEG remains header-parse-only (kernel.multimodal.parse_image_meta).

Reference analogue: io/image.py:49-79 decodes via cv2.imdecode; here the
container format is handled directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 array as PNG."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        color_type, channels = 0, 1
        data = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        data = img
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + data[y].tobytes() for y in range(h))
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line
            for x in range(channels, stride):
                # int cast avoids numpy uint8-overflow RuntimeWarning spam
                # (result was already correct via & 0xFF, but executor logs
                # at scale would drown in warnings)
                rec[x] = (int(rec[x]) + int(rec[x - channels])) & 0xFF
        elif ftype == 2:  # Up
            rec = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            rec = line
            for x in range(stride):
                left = rec[x - channels] if x >= channels else 0
                rec[x] = (rec[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to HxW (grayscale) or HxWx3 (RGB) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = None
    idat = b""
    while pos + 8 <= len(data):
        length = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bit_depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type}, "
                    f"interlace={interlace}) — this codec handles 8-bit "
                    f"gray/RGB non-interlaced only")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(idat)
    arr = _unfilter(raw, h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr
