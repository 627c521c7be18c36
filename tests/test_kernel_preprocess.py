"""Preprocess kernels P2-P9 — property contract ported from reference
tests/test_preprocess.py:8-168 against the reference conftest's synthetic
document image (conftest.py:23-68: 800x600 white page with text bars and a
ruled table; grayscale / noisy sigma=25 / 5-degree-rotated variants)."""

import numpy as np
import pytest

from horizon_ocr_python_spark.kernel import preprocess as P


@pytest.fixture(scope="module")
def sample_image():
    """The reference conftest's synthetic document (conftest.py:23-43)."""
    img = np.full((600, 800, 3), 255, dtype=np.uint8)
    img[50:70, 100:700] = 60                      # header bar
    for y in range(150, 351, 25):                 # 8 paragraph lines
        img[y:y + 10, 100:650] = 90
    for y in range(400, 551, 30):                 # table rulings
        img[y:y + 2, 100:700] = 0
    for x in range(100, 701, 150):
        img[400:552, x:x + 2] = 0
    return img


@pytest.fixture(scope="module")
def noisy_image(sample_image):
    rng = np.random.default_rng(42)
    noise = rng.normal(0, 25, sample_image.shape)
    return np.clip(sample_image.astype(np.float64) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def skewed_image(sample_image):
    return P.rotate_image(sample_image, 5.0)


class TestGeometry:
    def test_deskew_preserves_shape(self, sample_image):
        out = P.deskew_image(sample_image)
        assert out.shape[:2] == sample_image.shape[:2]

    def test_rotation_angle_range(self, sample_image):
        angle = P.get_rotation_angle(sample_image)
        assert isinstance(angle, float) and -45 <= angle <= 45

    def test_detects_known_skew(self, skewed_image):
        # a 5-degree rotation must be recovered within 1.5 degrees
        angle = P.get_rotation_angle(skewed_image)
        assert abs(angle - (-5.0)) <= 1.5 or abs(angle - 5.0) <= 1.5

    def test_straight_image_near_zero(self, sample_image):
        assert abs(P.get_rotation_angle(sample_image)) <= 1.0

    def test_blank_image_zero(self):
        assert P.get_rotation_angle(np.full((100, 100, 3), 255, np.uint8)) == 0.0


class TestEnhance:
    def test_denoise_shape_and_reduction(self, noisy_image, sample_image):
        out = P.denoise_image(noisy_image)
        assert out.shape == noisy_image.shape and out.dtype == noisy_image.dtype
        # noise (deviation from the clean image) decreases
        before = float(np.abs(noisy_image.astype(int) - sample_image.astype(int)).mean())
        after = float(np.abs(out.astype(int) - sample_image.astype(int)).mean())
        assert after < before

    def test_clahe_shapes(self, sample_image):
        gray = P.to_gray(sample_image).astype(np.uint8)
        assert P.apply_clahe(gray).shape == gray.shape
        assert P.apply_clahe(sample_image).shape == sample_image.shape

    def test_clahe_expands_low_contrast(self):
        flat = np.full((160, 160), 128, np.uint8)
        flat[40:120, 40:120] = 138  # tiny contrast
        out = P.apply_clahe(flat)
        assert float(out.std()) >= float(flat.std())

    def test_sharpen_shape_and_edges(self, sample_image):
        out = P.sharpen_image(sample_image)
        assert out.shape == sample_image.shape
        g_in = P.to_gray(sample_image)
        g_out = P.to_gray(out)
        assert P.laplacian_variance(g_out) >= P.laplacian_variance(g_in)

    def test_adaptive_binarize(self, sample_image):
        out = P.adaptive_binarize(sample_image)
        assert out.shape == sample_image.shape[:2]
        assert set(np.unique(out)) <= {0, 255}
        # ink (table rulings) goes dark, page goes white
        assert out[401, 300] == 0 and out[10, 10] == 255

    def test_content_type(self, sample_image):
        ctype, conf = P.detect_content_type(sample_image)
        assert ctype in ("printed", "handwritten", "mixed")
        assert 0 <= conf <= 1

    def test_readability_buckets(self, sample_image):
        quality, issues = P.assess_readability(sample_image)
        assert quality in ("good", "fair", "poor")
        assert isinstance(issues, list)

    def test_readability_dark_small(self):
        dark = np.full((100, 100, 3), 20, np.uint8)
        quality, issues = P.assess_readability(dark)
        assert "too_dark" in issues and "low_resolution" in issues
        assert quality == "poor"  # >2 issues (also low_contrast/blurry)

    def test_pipeline_runs(self, sample_image):
        out = P.preprocess_for_ocr(sample_image)
        assert out.shape[:2] == sample_image.shape[:2]
        binar = P.preprocess_for_ocr(sample_image, binarize=True)
        assert set(np.unique(binar)) <= {0, 255}


def _fill_quad(shape, quad, value=230):
    import numpy as _np
    img = _np.zeros(shape, dtype=_np.uint8)
    yy, xx = _np.mgrid[0:shape[0], 0:shape[1]]
    pts = P.order_points(_np.array(quad, float))
    inside = _np.ones(yy.shape, bool)
    for i in range(4):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % 4]
        inside &= (x2 - x1) * (yy - y1) - (y2 - y1) * (xx - x1) >= 0
    img[inside] = value
    return img


class TestDewarp:
    QUAD = [[60, 20], [260, 50], [240, 180], [40, 150]]

    def test_order_points(self):
        # sum/diff trick (geometry.py:81-103)
        pts = np.array([[260, 50], [40, 150], [60, 20], [240, 180]], float)
        ordered = P.order_points(pts)
        assert ordered.tolist() == [[60, 20], [260, 50], [240, 180], [40, 150]]

    def test_detect_page_quad_exact(self):
        img = _fill_quad((200, 300, 3), self.QUAD)
        det = P.detect_page_quad(img)
        assert det is not None
        assert sorted(det.tolist()) == sorted([[float(x), float(y)]
                                               for x, y in self.QUAD])

    def test_perspective_correction_rectifies(self):
        img = _fill_quad((200, 300, 3), self.QUAD)
        out = P.perspective_correction(img)
        # output sized by max opposite-side lengths (geometry.py:135-143)
        assert out.shape[0] < 200 and out.shape[1] < 300
        interior = P.to_gray(out[3:-3, 3:-3])
        assert (interior > 200).mean() > 0.99  # page fills the rectangle

    def test_no_quad_returns_original(self):
        flat = np.zeros((50, 50, 3), np.uint8)
        assert P.perspective_correction(flat) is flat

    def test_small_page_rejected(self):
        # page under 30% of the frame: no correction (geometry.py min area)
        img = _fill_quad((300, 300, 3), [[10, 10], [60, 12], [58, 70], [8, 66]])
        assert P.detect_page_quad(img) is None
