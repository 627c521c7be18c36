"""D14 crop ops (kernel.crops) — reference semantics of ocr/crops.py."""

import numpy as np

from horizon_ocr_python_spark.kernel import crops


def _img(h=60, w=80):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 4 + xx) % 256).astype(np.uint8)[..., None].repeat(3, axis=2)


class TestBboxCrop:
    def test_padding_and_bounds(self):
        img = _img()
        c = crops.crop_text_region(img, (10, 10, 30, 30), padding=2)
        assert c.shape[:2] == (24, 24)
        # clamped at image edges
        c = crops.crop_text_region(img, (0, 0, 30, 30), padding=5)
        assert c.shape[:2] == (35, 35)

    def test_min_size_guard(self):
        img = _img()
        c = crops.crop_text_region(img, (40, 40, 42, 42), padding=0, min_size=10)
        assert c.shape[0] >= 10 and c.shape[1] >= 10


class TestPolygonCrop:
    def test_axis_aligned_quad_matches_bbox(self):
        img = _img()
        poly = {"points": [(10, 10), (40, 10), (40, 30), (10, 30)]}
        c = crops.crop_polygon_region(img, poly, padding=0)
        # width/height = max opposite-side length
        assert c.shape[:2] == (20, 30)
        inner = img[10:30, 10:40]
        assert np.abs(c.astype(int)[:inner.shape[0], :inner.shape[1]]
                      - inner.astype(int)).max() <= 8  # nearest-resample tolerance

    def test_rotated_quad_rectifies(self):
        # draw a dark rotated square on white, rectify, expect mostly dark
        img = np.full((100, 100, 3), 255, np.uint8)
        pts = [(50, 20), (80, 50), (50, 80), (20, 50)]  # diamond
        yy, xx = np.mgrid[0:100, 0:100]
        inside = (np.abs(xx - 50) + np.abs(yy - 50)) <= 30
        img[inside] = 40
        c = crops.crop_polygon_region(img, {"points": pts}, padding=0)
        assert c.mean() < 90  # rectified crop is dominated by the dark region

    def test_non_quad_falls_back_to_bbox(self):
        img = _img()
        poly = {"points": [(10, 10), (40, 10), (25, 30)]}  # triangle
        c = crops.crop_polygon_region(img, poly, padding=0)
        assert c.shape[:2] == (20, 30)  # bbox of the points

    def test_reference_point_ordering(self):
        got = crops._order_quad_reference([(40, 30), (10, 10), (40, 10), (10, 30)])
        assert got.tolist() == [[10, 10], [40, 10], [40, 30], [10, 30]]


class TestNormalizePad:
    def test_normalize_height_and_cap(self):
        c = crops.normalize_crop(_img(64, 400), target_height=32, max_width=100)
        assert c.shape[:2] == (32, 100)
        c = crops.normalize_crop(_img(64, 64), target_height=32)
        assert c.shape[:2] == (32, 32)

    def test_pad_to_square_centers(self):
        img = np.zeros((10, 30, 3), np.uint8)
        sq = crops.pad_to_square(img)
        assert sq.shape == (30, 30, 3)
        assert (sq[10:20, :] == 0).all()
        assert (sq[:10] == 255).all() and (sq[20:] == 255).all()
        gray = np.zeros((4, 4), np.uint8)
        assert crops.pad_to_square(gray) is gray  # already square


class TestBatchAndCells:
    def test_batch_dispatch(self):
        img = _img()
        out = crops.batch_crop_regions(img, [
            {"bbox": (0, 0, 20, 20)},
            {"polygon": {"points": [(10, 10), (40, 10), (40, 30), (10, 30)]}},
            {},  # unknown -> skipped
        ], padding=0, normalize=True, target_height=16)
        assert len(out) == 2
        assert all(c.shape[0] == 16 for c in out)

    def test_cell_crops_skip_boxless_and_tiny(self):
        img = _img()
        cells = [{"bbox": None, "text": "a"},
                 {"bbox": (0, 0, 2, 2), "text": "tiny"},
                 {"bbox": (10, 10, 40, 30), "text": "ok"}]
        # min_size guard makes the tiny one >=10px, so it survives; the
        # boxless one is skipped
        out = crops.extract_table_cell_crops(img, cells)
        assert [c["text"] for _, c in out] == ["tiny", "ok"]

    def test_mask_outside(self):
        img = _img()
        m = crops.mask_outside_region(img, (10, 10, 20, 20))
        assert (m[:10] == 255).all()
        assert (m[10:20, 10:20] == img[10:20, 10:20]).all()
