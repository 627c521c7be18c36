"""Round-2 fuzz/containment: malformed JPEG/PDF bytes must be contained by
extract_document (error rows, never raises) and the codecs must fail with
clean exception classes, never hangs or segfault-class errors."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from horizon_ocr_python_spark.kernel import jpeg, pdf_text
from horizon_ocr_python_spark.kernel.document import extract_document


class TestJpegFuzz:
    @given(st.binary(min_size=0, max_size=400))
    @settings(max_examples=120, deadline=None)
    def test_random_bytes_clean_failure(self, blob):
        data = b"\xff\xd8\xff" + blob  # forced into the JPEG sniff path
        try:
            out = jpeg.decode_jpeg(data)
            assert isinstance(out, np.ndarray)  # decoded something valid
        except (ValueError, NotImplementedError, EOFError, IndexError,
                KeyError, struct_error_types()):
            pass  # clean failure classes only

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_bitflip_contained_by_document(self, seed):
        rng = random.Random(seed)
        img = np.full((24, 24, 3), 200, np.uint8)
        data = bytearray(jpeg.encode_jpeg(img, 90))
        for _ in range(3):
            data[rng.randrange(2, len(data))] ^= 1 << rng.randrange(8)
        doc = extract_document("https://x/f.jpg", bytes(data))
        assert doc["status"] in ("ok", "error")  # contained either way

    def test_decoder_terminates_on_zero_lengths(self):
        # DHT claiming zero codes followed by entropy data
        data = (b"\xff\xd8"
                b"\xff\xc4\x00\x13\x00" + bytes(16) +
                b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
                b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
                b"\x12\x34\xff\xd9")
        with pytest.raises(Exception):
            jpeg.decode_jpeg(data)


def struct_error_types():
    import struct
    return struct.error


class TestPdfFuzz:
    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=120, deadline=None)
    def test_random_pdf_bytes_contained(self, blob):
        doc = extract_document("https://x/f.pdf", b"%PDF-1.4\n" + blob)
        assert doc["status"] in ("ok", "error")
        assert isinstance(doc["raw_text"], str)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_bitflip_compressed_pdf_contained(self, seed):
        rng = random.Random(seed)
        pdf = bytearray(pdf_text.build_pdf_pages(
            [[(72.0, 72.0, "hello world", 12.0)]], compress=True))
        for _ in range(2):
            pdf[rng.randrange(len(pdf))] ^= 1 << rng.randrange(8)
        doc = extract_document("https://x/f.pdf", bytes(pdf))
        assert doc["status"] in ("ok", "error")

    def test_font_map_on_foreign_pdf_shapes(self):
        # resources referencing a missing font object: no KeyError leak
        pdf = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Resources "
               b"<< /Font << /F9 77 0 R >> >> >>\nendobj\n"
               b"2 0 obj\n<< /Length 20 >>\nstream\n"
               b"BT /F9 10 Tf (x) Tj\nendstream\nendobj\n")
        lines = pdf_text.extract_pdf_text_lines(pdf)
        # unknown font keeps the default name; no crash
        assert lines and lines[0]["font_name"] == "Helvetica"
