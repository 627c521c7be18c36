"""Text analysis kernels for training-data pipelines: language-ID heuristic,
quality scoring, token counting, and document fingerprinting.

These extend the reference's per-document analysis surface (readability
assessment, preprocess/enhance.py:311-365, returns good/fair/poor + issues[])
to the text domain; each has a dataset-level SQL-expressible twin in
horizon_ocr_python_spark.operators.textops so the DuckDB oracle can pin it.
All deterministic, stdlib-only.
"""

from __future__ import annotations

import hashlib
import re

# Tiny per-language stopword sets (top function words). Deliberately small and
# frozen — the heuristic is "most stopword hits wins", not a real classifier.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "et", "des", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "en", "un", "por"),
}

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/number/punct splitter: words (with apostrophes), numbers, or
# single non-space symbols — a deterministic proxy for subword counting.
_BPE_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\sA-Za-z\d]")
_SENT_PUNCT_RE = re.compile(r"[.!?]")


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokens."""
    return _TOKEN_RE.findall(text)


def count_tokens_bpe(text: str) -> int:
    """Regex token count approximating BPE granularity (words+numbers+punct)."""
    return len(_BPE_RE.findall(text))


def detect_language(text: str) -> str:
    """Stopword-count language ID.

    Score per language = number of tokens in that language's stopword set
    (lowercased whitespace tokens). Highest score wins; ties break by the
    fixed language order en < de < fr < es; zero hits -> 'und' (undetermined,
    BCP-47 convention).
    """
    tokens = [t.lower() for t in tokenize_ws(text)]
    if not tokens:
        return "und"
    best_lang, best_score = "und", 0
    for lang in ("en", "de", "fr", "es"):
        sw = set(STOPWORDS[lang])
        score = sum(1 for t in tokens if t in sw)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_score(text: str) -> dict:
    """Length/punctuation/stopword-ratio quality score with the reference's
    good/fair/poor readability buckets (preprocess/enhance.py:311-365 style:
    compute issue list, bucket by issue count).

    Issues:
    - too_short: < 20 whitespace tokens
    - no_sentence_punct: zero of . ! ?
    - low_stopword_ratio: < 5% of tokens are (any-language) stopwords
    - high_symbol_ratio: > 30% of chars are non-alphanumeric, non-space
    Bucket: 0 issues -> good, 1 -> fair, >=2 -> poor (enhance.py:357-363).
    """
    tokens = tokenize_ws(text)
    n_tokens = len(tokens)
    n_chars = len(text)
    all_stop = set().union(*(set(v) for v in STOPWORDS.values()))
    n_stop = sum(1 for t in tokens if t.lower() in all_stop)
    n_punct = len(_SENT_PUNCT_RE.findall(text))
    n_symbol = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())

    issues = []
    if n_tokens < 20:
        issues.append("too_short")
    if n_punct == 0:
        issues.append("no_sentence_punct")
    if n_tokens > 0 and n_stop / n_tokens < 0.05:
        issues.append("low_stopword_ratio")
    if n_chars > 0 and n_symbol / n_chars > 0.30:
        issues.append("high_symbol_ratio")

    bucket = "good" if not issues else ("fair" if len(issues) == 1 else "poor")
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
        "punct_count": n_punct,
        "symbol_ratio": (n_symbol / n_chars) if n_chars else 0.0,
        "issues": issues,
        "bucket": bucket,
    }


def fingerprint(text: str) -> str:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text.

    The reference's content-addressed cache key is sha256 over content
    (azure/response_cache.py:66-91); md5 here because both Spark and DuckDB
    expose md5() as a built-in, making the oracle exact.
    """
    canonical = " ".join(text.split()).lower()
    return hashlib.md5(canonical.encode("utf-8")).hexdigest()


def content_key(data: bytes, service: str = "", model: str = "", extra: str = "") -> str:
    """Content-addressed cache key: sha256(content || service || model || extra)
    (azure/response_cache.py:66-91). Used by the engine's resume anti-join."""
    h = hashlib.sha256()
    h.update(data)
    h.update(service.encode("utf-8"))
    h.update(model.encode("utf-8"))
    h.update(extra.encode("utf-8"))
    return h.hexdigest()


def rolling_hashes(text: str, window: int = 16, base: int = 257,
                   mod: int = (1 << 61) - 1) -> list[int]:
    """Karp-Rabin rolling hashes of char n-grams (document fingerprinting).

    Deterministic, O(n). Used for winnowing-style near-dup fingerprints.
    """
    n = len(text)
    if n < window:
        return []
    power = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - ord(text[i - window + 1]) * power) % mod
    return out


def winnow_fingerprint(text: str, window: int = 16, k: int = 8) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): minimum hash per sliding
    window of k rolling hashes — a compact near-dup fingerprint set."""
    hashes = rolling_hashes(text, window)
    if not hashes:
        return []
    picked = []
    for i in range(max(1, len(hashes) - k + 1)):
        picked.append(min(hashes[i:i + k]))
    # dedupe preserving order
    seen: set[int] = set()
    out = []
    for h in picked:
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out
