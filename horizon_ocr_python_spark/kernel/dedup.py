"""Near-duplicate detection kernels: shingling, MinHash, SimHash, Jaccard.

Pure-Python reference implementations; the distributed versions live in
horizon_ocr_python_spark.operators.dedup. Hash functions are md5-based so the
Spark implementation and the DuckDB oracle produce *identical* values (both
engines expose md5 as a built-in; Spark's hash()/xxhash64() have no DuckDB
equivalent).

The reference's only dedup surface is content-hash upload dedup
(web/app.py, exercised by reference tests/test_io.py:259-288) — exact dedup
by sha256; the near-dup family here is the scale extension a training-data
pipeline needs.
"""

from __future__ import annotations

import hashlib
import re

_WORD_RE = re.compile(r"[a-z0-9]+")

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # rows per band = num_hashes // bands


def words(text: str) -> list[str]:
    """Lowercase alphanumeric word tokens."""
    return _WORD_RE.findall(text.lower())


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-shingles (space-joined)."""
    w = words(text)
    if len(w) < k:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def minhash_signature(tokens: set[str], num_hashes: int = DEFAULT_NUM_HASHES) -> list[str]:
    """MinHash signature: for seed i, min over tokens of md5(f"{i}:{token}").

    Hex-string minimum == unsigned numeric minimum of the 128-bit hash, and
    md5 is identical across Spark (`F.md5`) and DuckDB (`md5`), so the oracle
    comparison is exact. Empty token set -> [''] * num_hashes.
    """
    if not tokens:
        return [""] * num_hashes
    return [min(_md5_hex(f"{i}:{t}") for t in tokens) for i in range(num_hashes)]


def lsh_band_keys(signature: list[str], bands: int = DEFAULT_BANDS) -> list[str]:
    """Band keys: md5 of the joined signature rows in each band. Two docs
    sharing any band key are LSH candidates."""
    rows = len(signature) // bands
    return [
        f"{b}:" + _md5_hex("|".join(signature[b * rows:(b + 1) * rows]))
        for b in range(bands)
    ]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def simhash32(tokens: list[str]) -> int:
    """32-bit SimHash: per token use the top 32 bits of md5 (first 8 hex
    chars); bit b of the result is 1 iff sum over tokens of (+1 if bit set
    else -1) > 0.

    32 bits (not 64) so the per-token value fits a signed BIGINT identically
    in Spark (`conv(substring(md5(t),1,8),16,10)`) and DuckDB
    (`from_hex` / bit ops) — exact oracle parity.
    """
    if not tokens:
        return 0
    counts = [0] * 32
    for t in tokens:
        h = int(_md5_hex(t)[:8], 16)
        for b in range(32):
            counts[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(32):
        if counts[b] > 0:
            out |= (1 << b)
    return out


def hamming32(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFF).count("1")


def cosine(a: list[float], b: list[float]) -> float:
    """Plain cosine similarity (embedding near-dup / ANN baseline)."""
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    if na == 0 or nb == 0:
        return 0.0
    return dot / (na * nb)
