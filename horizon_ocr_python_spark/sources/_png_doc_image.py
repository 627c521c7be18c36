"""Deterministic synthetic document image for the pages generator's
image-kind rows — the reference conftest's 800x600 page shape
(conftest.py:23-43: header bar, paragraph bars, ruled table) at a reduced
160x120 so PNG payloads stay small in the table."""

from __future__ import annotations

import random

import numpy as np

from ..kernel.png import encode_png

H, W = 120, 160


def render(seed: int) -> np.ndarray:
    rng = random.Random(seed)
    img = np.full((H, W, 3), 255, dtype=np.uint8)
    img[10:14, 20:140] = 60                       # header bar
    n_lines = rng.randint(4, 8)
    for k in range(n_lines):                      # paragraph bars
        y = 30 + k * 8
        img[y:y + 3, 20:20 + rng.randint(80, 120)] = 90
    for y in range(80, 111, 10):                  # table rulings
        img[y, 20:140] = 0
    for x in range(20, 141, 30):
        img[80:111, x] = 0
    return img


def encode(img: np.ndarray) -> bytes:
    return encode_png(img)
