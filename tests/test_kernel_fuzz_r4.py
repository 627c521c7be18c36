"""Round-4 fuzz: the page-column splitter and the image OCR route must be
total — arbitrary recognized-line geometry never crashes the splitter and
never loses characters, and arbitrary image bytes are contained by
extract_document."""

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from horizon_ocr_python_spark.kernel import glyphs, table_model
from horizon_ocr_python_spark.kernel.document import extract_document


def _mk_line(rng, y):
    """A synthetic recognized line with consistent fixed-pitch geometry."""
    s = rng.choice([1, 2, 3])
    pitch = 6.0 * s
    x0 = float(rng.randrange(0, 200))
    n = rng.randrange(1, 40)
    text = "".join(rng.choice("ab  c") for _ in range(n)).rstrip()
    if not text:
        text = "a"
    words = []
    for m in __import__("re").finditer(r"[^ ]+", text):
        words.append({
            "text": m.group(0),
            "bbox": (x0 + m.start() * pitch, float(y),
                     x0 + m.end() * pitch - s, float(y + 7 * s)),
            "confidence": round(rng.random(), 4),
        })
    return {"text": text, "x": x0, "y": float(y),
            "font_size": float(7 * s),
            "bbox": (x0, float(y), x0 + len(text) * pitch - s,
                     float(y + 7 * s)),
            "confidence": round(rng.random(), 4), "words": words}


class TestColumnSplitFuzz:
    @given(st.integers(0, 2**32 - 1), st.integers(0, 30))
    @settings(max_examples=80, deadline=None)
    def test_split_is_total_and_lossless(self, seed, n_lines):
        """Whatever the geometry, split_page_columns returns all the
        non-space characters it was given, each exactly once."""
        rng = random.Random(seed)
        lines = [_mk_line(rng, 40 + 24 * k) for k in range(n_lines)]
        cols = table_model.split_page_columns(lines)
        assert 1 <= len(cols) <= 4
        assert all(col for col in cols) or cols == [[]]  # no empty columns
        def chars(ls):
            return sorted("".join(ln["text"].replace(" ", "") for ln in ls))
        assert chars([ln for col in cols for ln in col]) == chars(lines)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_cut_line_preserves_words(self, seed):
        rng = random.Random(seed)
        ln = _mk_line(rng, 50)
        mid = (ln["bbox"][0] + ln["bbox"][2]) / 2
        piece = table_model._cut_line_at(ln, mid)
        if piece is None:
            return  # no >=3-space gap at the valley: crossing line, kept
        left, right = piece
        all_words = [w["text"] for w in ln["words"]]
        side_words = [w["text"] for w in left["words"]] + \
                     [w["text"] for w in right["words"]]
        assert side_words == all_words
        assert (left["text"] + " " * 3 + right["text"]).split() == \
            ln["text"].split()


class TestImageRouteFuzz:
    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_png_header_bytes_contained(self, blob):
        data = b"\x89PNG\r\n\x1a\n" + blob
        doc = extract_document("https://x/f.png", data)
        assert doc["status"] in ("ok", "error")

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=10, deadline=None)
    def test_noise_image_never_yields_text(self, seed):
        """Random-noise pixels must never pass the OCR acceptance gate."""
        from horizon_ocr_python_spark.kernel import png

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
        doc = extract_document("https://x/n.png", png.encode_png(img))
        assert doc["status"] == "ok"
        assert doc["raw_text"] == ""

    def test_lucky_single_cell_noise_rejected(self):
        """r6 regression pin: these noise seeds produce ONE cell whose
        template match scores above IMAGE_TEXT_GATE (a lone ';' at conf
        ~0.89) — the char-weighted mean gate alone accepted them. The
        MIN_IMAGE_TEXT_CHARS evidence floor must reject single-cell
        matches while every corpus scan (>= 69 recognized chars) is far
        above it (kernel/document.py rationale)."""
        from horizon_ocr_python_spark.kernel import png

        for seed in (17912, 1025828783):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
            doc = extract_document("https://x/n.png", png.encode_png(img))
            assert doc["status"] == "ok"
            assert doc["raw_text"] == ""
            assert doc["pages"][0]["layout_regions"][0]["type"] == "image"


class TestKmeansQuantization:
    @given(st.lists(st.floats(-8, 8, allow_nan=False, width=32),
                    min_size=4, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_quantization_matches_duckdb_semantics(self, vals):
        """round-half-away-from-zero on exactly-representable *1000 floats:
        the numpy reference of what both engines compute."""
        import math

        got = [int(math.floor(v * 1000 + 0.5)) if v >= 0
               else -int(math.floor(-v * 1000 + 0.5)) for v in
               [float(np.float32(v)) for v in vals]]
        # the engine-side quantization (Spark F.round HALF_UP == DuckDB
        # round) must agree with the away-from-zero reference
        import duckdb

        q = duckdb.sql(
            "SELECT list_transform(?::DOUBLE[], x -> "
            "CAST(round(x * 1000) AS BIGINT)) AS q",
            params=[[float(np.float32(v)) for v in vals]]).fetchone()[0]
        assert list(q) == got
