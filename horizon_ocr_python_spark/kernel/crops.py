"""D14: region crop utilities — pure numpy (reference ocr/crops.py).

Semantics pinned to the reference, cv2-free:
- crop_text_region: bbox crop with padding + min-size guard (crops.py:21-61)
- crop_polygon_region: quadrilateral rectification via perspective warp
  (crops.py:63-130) — point ordering is the reference's y-then-x sort (NOT
  the sum/diff ordering the P1 dewarp uses), output sized by max opposite
  side lengths + 2*padding, white border fill; non-quads fall back to the
  bounding-box crop
- normalize_crop: scale to target height, width-capped (crops.py:133-175);
  nearest-neighbor resample (kernel.multimodal.resize_nearest) instead of
  cv2 INTER_LINEAR — documented resampling deviation, geometry identical
- pad_to_square: centered white padding (crops.py:223-255)
- batch_crop_regions: dict-based dispatch over bbox/polygon regions
  (crops.py:178-220)
- mask_outside_region: keep bbox pixels, fill the rest (crops.py:293+)

Regions are plain dicts: bbox = (x1, y1, x2, y2); polygon =
{"points": [(x, y) x4], "bbox": (...)?}.
"""

from __future__ import annotations

import numpy as np

from .multimodal import resize_nearest
from .preprocess import _homography


def crop_text_region(image: np.ndarray, bbox: tuple, padding: int = 2,
                     min_size: int = 10) -> np.ndarray:
    """Padded bbox crop with bounds checking and a min-size guard."""
    h, w = image.shape[:2]
    x1 = max(0, int(bbox[0]) - padding)
    y1 = max(0, int(bbox[1]) - padding)
    x2 = min(w, int(bbox[2]) + padding)
    y2 = min(h, int(bbox[3]) + padding)
    if x2 - x1 < min_size:
        center_x = (x1 + x2) // 2
        x1 = max(0, center_x - min_size // 2)
        x2 = min(w, x1 + min_size)
    if y2 - y1 < min_size:
        center_y = (y1 + y2) // 2
        y1 = max(0, center_y - min_size // 2)
        y2 = min(h, y1 + min_size)
    return image[y1:y2, x1:x2]


def _order_quad_reference(points) -> np.ndarray:
    """The reference's ordering (crops.py:89-101): sort by y, split into
    top/bottom pairs, sort each by x -> [tl, tr, br, bl]."""
    pts = np.asarray(points, dtype=np.float64)
    pts = pts[np.argsort(pts[:, 1])]
    top = pts[:2][np.argsort(pts[:2][:, 0])]
    bottom = pts[2:][np.argsort(pts[2:][:, 0])]
    return np.array([top[0], top[1], bottom[1], bottom[0]], dtype=np.float64)


def _polygon_bbox(polygon: dict) -> tuple:
    if polygon.get("bbox") is not None:
        return tuple(polygon["bbox"])
    pts = np.asarray(polygon["points"], dtype=np.float64)
    return (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())


def crop_polygon_region(image: np.ndarray, polygon: dict,
                        padding: int = 2) -> np.ndarray:
    """Rectify a quadrilateral region by perspective warp; non-quads use
    the bounding-box crop (crops.py:86-88)."""
    points = polygon.get("points") or []
    if len(points) != 4:
        return crop_text_region(image, _polygon_bbox(polygon), padding)
    ordered = _order_quad_reference(points)
    width = int(max(np.linalg.norm(ordered[0] - ordered[1]),
                    np.linalg.norm(ordered[3] - ordered[2]))) + 2 * padding
    height = int(max(np.linalg.norm(ordered[0] - ordered[3]),
                     np.linalg.norm(ordered[1] - ordered[2]))) + 2 * padding
    width, height = max(width, 1), max(height, 1)
    dst = np.array([
        [padding, padding],
        [width - padding - 1, padding],
        [width - padding - 1, height - padding - 1],
        [padding, height - padding - 1]], dtype=np.float64)
    # inverse map each output pixel into the source (white outside)
    h_inv = _homography(dst, ordered)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    denom = h_inv[2, 0] * xx + h_inv[2, 1] * yy + h_inv[2, 2]
    sx = (h_inv[0, 0] * xx + h_inv[0, 1] * yy + h_inv[0, 2]) / denom
    sy = (h_inv[1, 0] * xx + h_inv[1, 1] * yy + h_inv[1, 2]) / denom
    h, w = image.shape[:2]
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    sxc = np.clip(np.rint(sx).astype(int), 0, w - 1)
    syc = np.clip(np.rint(sy).astype(int), 0, h - 1)
    sampled = image[syc, sxc]
    white = np.full_like(sampled, 255)
    return np.where(inside[..., None] if image.ndim == 3 else inside,
                    sampled, white)


def normalize_crop(crop: np.ndarray, target_height: int = 32,
                   maintain_aspect: bool = True,
                   max_width: int = 800) -> np.ndarray:
    """Scale to OCR input height, capping width (crops.py:133-175)."""
    h, w = crop.shape[:2]
    if h == 0 or w == 0:
        return crop
    scale = target_height / h
    new_w = min(int(w * scale), max_width)
    del maintain_aspect  # both reference branches compute the same size
    return resize_nearest(crop, target_height, max(new_w, 1))


def pad_to_square(image: np.ndarray, fill_value: int = 255) -> np.ndarray:
    """Center the image on a white square canvas (crops.py:223-255)."""
    h, w = image.shape[:2]
    if h == w:
        return image
    size = max(h, w)
    if image.ndim == 3:
        result = np.full((size, size, image.shape[2]), fill_value,
                         dtype=image.dtype)
    else:
        result = np.full((size, size), fill_value, dtype=image.dtype)
    y0, x0 = (size - h) // 2, (size - w) // 2
    result[y0:y0 + h, x0:x0 + w] = image
    return result


def batch_crop_regions(image: np.ndarray, regions: list[dict],
                       padding: int = 2, normalize: bool = False,
                       target_height: int = 32) -> list[np.ndarray]:
    """Crop many regions; region = {"polygon": {...}} or {"bbox": (...)}
    (the TextLine/Polygon/BoundingBox dispatch of crops.py:178-220)."""
    crops = []
    for region in regions:
        if region.get("polygon"):
            crop = crop_polygon_region(image, region["polygon"], padding)
        elif region.get("bbox") is not None:
            crop = crop_text_region(image, region["bbox"], padding)
        else:
            continue
        if normalize:
            crop = normalize_crop(crop, target_height)
        crops.append(crop)
    return crops


def extract_table_cell_crops(image: np.ndarray, cells: list[dict],
                             padding: int = 2) -> list[tuple[np.ndarray, dict]]:
    """Crop table cells, skipping boxless and tiny crops (crops.py:258-290)."""
    results = []
    for cell in cells:
        if cell.get("bbox") is None:
            continue
        crop = crop_text_region(image, cell["bbox"], padding)
        if crop.shape[0] < 5 or crop.shape[1] < 5:
            continue
        results.append((crop, cell))
    return results


def mask_outside_region(image: np.ndarray, bbox: tuple,
                        mask_value: int = 255) -> np.ndarray:
    """Fill everything outside the bbox with mask_value (crops.py:293+)."""
    h, w = image.shape[:2]
    out = np.full_like(image, mask_value)
    x1, y1 = max(0, int(bbox[0])), max(0, int(bbox[1]))
    x2, y2 = min(w, int(bbox[2])), min(h, int(bbox[3]))
    if x2 > x1 and y2 > y1:
        out[y1:y2, x1:x2] = image[y1:y2, x1:x2]
    return out
