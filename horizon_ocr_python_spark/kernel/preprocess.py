"""Image preprocessing kernels P2-P9 in pure numpy (no cv2 in this
container; the reference's preprocess/enhance.py + preprocess/geometry.py
semantics re-expressed with numpy primitives).

The reference's own tests pin PROPERTIES, not pixels (tests/
test_preprocess.py: shape/dtype preserved, angle in range, noise reduced,
quality buckets) — that is the parity contract here too; cv2's exact pixel
output is unreachable without cv2 and is version-dependent anyway
(SURVEY §7.5 hard-part 1 names cv2 version drift as a byte-identity risk).

Per SURVEY §2.2, all of these run fused inside the one Arrow extraction
stage when an image path is enabled; they are plain ndarray -> ndarray
functions with no Spark imports.
"""

from __future__ import annotations

import numpy as np


def to_gray(img: np.ndarray) -> np.ndarray:
    """BGR -> gray (ITU-R 601 weights, same as cv2.COLOR_BGR2GRAY)."""
    if img.ndim == 2:
        return img.astype(np.float64)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r


def _box_mean(a: np.ndarray, k: int) -> np.ndarray:
    """k x k box-filter mean via 2-D cumsum (O(n), no convolution loop)."""
    pad = k // 2
    padded = np.pad(a.astype(np.float64), pad, mode="edge")
    c = padded.cumsum(0).cumsum(1)
    c = np.pad(c, ((1, 0), (1, 0)))
    h, w = a.shape
    s = (c[k:k + h, k:k + w] - c[:h, k:k + w]
         - c[k:k + h, :w] + c[:h, :w])
    return s / (k * k)


# --- P2: deskew ------------------------------------------------------------------


def get_rotation_angle(img: np.ndarray, max_angle: float = 15.0,
                       step: float = 0.5) -> float:
    """Text-skew estimate via projection-profile search (the Hough-median
    approach of geometry.py:168-227 replaced by the classic
    maximize-row-profile-variance criterion — same contract: degrees in
    [-max_angle, max_angle], 0.0 when nothing detected)."""
    gray = to_gray(img)
    # downsample for speed; binarize by global mean
    while max(gray.shape) > 512:
        gray = gray[::2, ::2]
    ink = (gray < gray.mean()).astype(np.float64)
    if ink.sum() < 10:
        return 0.0
    h, w = ink.shape
    ys, xs = np.nonzero(ink)
    cx, cy = w / 2.0, h / 2.0
    best_angle, best_score = 0.0, -1.0
    for angle in np.arange(-max_angle, max_angle + step / 2, step):
        rad = np.deg2rad(angle)
        # row index of each ink pixel after rotating by -angle
        yr = (-(xs - cx) * np.sin(rad) + (ys - cy) * np.cos(rad)) + cy
        rows = np.clip(yr.astype(int), 0, h - 1)
        profile = np.bincount(rows, minlength=h)
        score = float(profile.var())
        if score > best_score:
            best_score, best_angle = score, float(angle)
    return best_angle


def rotate_image(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Nearest-neighbor rotation about the center, same output size (the
    shape-preserving contract of the horizontal-deskew test)."""
    if abs(angle_deg) < 1e-9:
        return img.copy()
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rad = np.deg2rad(angle_deg)
    yy, xx = np.mgrid[0:h, 0:w]
    xs = (xx - cx) * np.cos(rad) + (yy - cy) * np.sin(rad) + cx
    ys = -(xx - cx) * np.sin(rad) + (yy - cy) * np.cos(rad) + cy
    xs = np.clip(np.rint(xs).astype(int), 0, w - 1)
    ys = np.clip(np.rint(ys).astype(int), 0, h - 1)
    return img[ys, xs]


def deskew_image(img: np.ndarray, max_angle: float = 15.0) -> np.ndarray:
    """P2: estimate the skew and rotate it out (geometry.py:230-282
    contract; same-size output)."""
    return rotate_image(img, -get_rotation_angle(img, max_angle))


# --- P3: denoise -----------------------------------------------------------------


def denoise_image(img: np.ndarray, k: int = 3) -> np.ndarray:
    """P3: median-filter denoise (stands in for cv2 fastNlMeansDenoising,
    enhance.py:25-69 — the test contract is shape preserved + noise
    variance reduced)."""
    gray_in = img.ndim == 2
    channels = [img] if gray_in else [img[..., c] for c in range(img.shape[2])]
    out = []
    pad = k // 2
    for ch in channels:
        padded = np.pad(ch, pad, mode="edge")
        stack = np.stack([padded[dy:dy + ch.shape[0], dx:dx + ch.shape[1]]
                          for dy in range(k) for dx in range(k)])
        out.append(np.median(stack, axis=0).astype(img.dtype))
    return out[0] if gray_in else np.stack(out, axis=-1)


# --- P4: CLAHE --------------------------------------------------------------------


def apply_clahe(img: np.ndarray, clip_limit: float = 2.0,
                tiles: int = 8) -> np.ndarray:
    """P4: contrast-limited adaptive histogram equalization
    (enhance.py:72-112: clip 2.0, 8x8 tiles). Per-tile clipped-histogram
    equalization with output stitched per tile (bilinear tile blending
    omitted — the contract is shape/dtype + contrast expansion)."""
    gray_in = img.ndim == 2
    gray = to_gray(img).astype(np.uint8) if not gray_in else img.astype(np.uint8)
    h, w = gray.shape
    out = np.empty_like(gray)
    th, tw = max(1, h // tiles), max(1, w // tiles)
    clip = clip_limit * th * tw / 256.0
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tile = gray[ty:ty + th, tx:tx + tw]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
            excess = np.clip(hist - clip, 0, None)
            hist = np.minimum(hist, clip) + excess.sum() / 256.0
            cdf = hist.cumsum()
            cdf = (cdf - cdf.min()) / max(cdf.max() - cdf.min(), 1e-9) * 255.0
            out[ty:ty + th, tx:tx + tw] = cdf[tile].astype(np.uint8)
    if gray_in:
        return out
    # apply the L-channel-style gain back to the color image
    gain = (out.astype(np.float64) + 1) / (gray.astype(np.float64) + 1)
    return np.clip(img.astype(np.float64) * gain[..., None], 0, 255) \
        .astype(img.dtype)


# --- P5: sharpen ------------------------------------------------------------------


def sharpen_image(img: np.ndarray, strength: float = 1.5) -> np.ndarray:
    """P5: unsharp mask addWeighted(img, s, blur, -(s-1))
    (enhance.py:115-144, s=1.5) with a box blur standing in for Gaussian."""
    gray_in = img.ndim == 2
    channels = [img] if gray_in else [img[..., c] for c in range(img.shape[2])]
    out = []
    for ch in channels:
        blur = _box_mean(ch, 5)
        sharp = ch.astype(np.float64) * strength - blur * (strength - 1)
        out.append(np.clip(sharp, 0, 255).astype(img.dtype))
    return out[0] if gray_in else np.stack(out, axis=-1)


# --- P6: adaptive binarize -----------------------------------------------------------


def adaptive_binarize(img: np.ndarray, block: int = 11, c: float = 2.0) -> np.ndarray:
    """P6: adaptive mean threshold (enhance.py:147-190: block 11, C 2;
    box mean stands in for the Gaussian window). THRESH_BINARY polarity:
    pixel > local_mean - C -> 255 else 0."""
    gray = to_gray(img)
    local = _box_mean(gray, block)
    return np.where(gray > local - c, 255, 0).astype(np.uint8)


# --- P8: content-type classify ---------------------------------------------------------


def detect_content_type(img: np.ndarray) -> tuple[str, float]:
    """P8: printed / handwritten / mixed by stroke regularity
    (enhance.py:219-308: stroke-width variation CV thresholds >0.7
    handwritten, <0.4 printed, else mixed). Numpy proxy for the per-contour
    stroke statistic: coefficient of variation of ink run lengths per row."""
    gray = to_gray(img)
    ink = gray < gray.mean()
    runs = []
    for row in ink[:: max(1, ink.shape[0] // 64)]:
        # run lengths of consecutive ink pixels
        changes = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts, ends = np.nonzero(changes == 1)[0], np.nonzero(changes == -1)[0]
        runs.extend((ends - starts).tolist())
    if len(runs) < 5:
        return ("printed", 0.5)
    arr = np.array(runs, dtype=np.float64)
    cv_ = float(arr.std() / max(arr.mean(), 1e-9))
    if cv_ > 0.7:
        return ("handwritten", min(1.0, cv_ / 1.4))
    if cv_ < 0.4:
        return ("printed", min(1.0, 1.0 - cv_))
    return ("mixed", 0.6)


# --- P9: readability -----------------------------------------------------------------


def laplacian_variance(gray: np.ndarray) -> float:
    """P10 helper: 4-neighbor Laplacian variance (enhance.py:193-216)."""
    g = gray.astype(np.float64)
    lap = (-4 * g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1]
           + g[1:-1, :-2] + g[1:-1, 2:])
    return float(lap.var()) if lap.size else 0.0


def assess_readability(img: np.ndarray) -> tuple[str, list[str]]:
    """P9: readability buckets (enhance.py:311-365): contrast < 30,
    laplacian var < 100, brightness < 50 / > 230, noise > 1000,
    size < 500 -> issues; 0 issues good, <= 2 fair, else poor."""
    gray = to_gray(img)
    issues = []
    if float(gray.std()) < 30:
        issues.append("low_contrast")
    lap = laplacian_variance(gray)
    if lap < 100:
        issues.append("blurry")
    brightness = float(gray.mean())
    if brightness < 50:
        issues.append("too_dark")
    elif brightness > 230:
        issues.append("too_bright")
    if lap > 1000:
        issues.append("high_noise")
    h, w = gray.shape[:2]
    if h < 500 or w < 500:
        issues.append("low_resolution")
    if not issues:
        return ("good", issues)
    if len(issues) <= 2:
        return ("fair", issues)
    return ("poor", issues)


# --- P7: pipeline order -----------------------------------------------------------------


def preprocess_for_ocr(img: np.ndarray, *, dewarp: bool = True,
                       deskew: bool = True,
                       denoise: bool = True, clahe: bool = True,
                       sharpen: bool = True,
                       binarize: bool = False) -> np.ndarray:
    """P7: the fused pipeline in the reference's order
    (enhance.py:368-428: dewarp -> deskew -> denoise -> CLAHE -> sharpen,
    each flag-gated; dewarp defaults ON, matching the reference's
    PreprocessConfig.dewarp = True, config.py:113, passed through by the
    orchestrator at orchestrator.py:651-661). On full-bleed scans — no
    page outline against a background — detect_page_quad returns None and
    dewarp is a no-op, exactly as the reference's contour detector finds
    no >=30%-area page quadrilateral to correct."""
    out = img
    if dewarp:
        out = perspective_correction(out)
    if deskew:
        out = deskew_image(out)
    if denoise:
        out = denoise_image(out)
    if clahe:
        out = apply_clahe(out)
    if sharpen:
        out = sharpen_image(out)
    if binarize:
        out = adaptive_binarize(out)
    return out


# --- P1: dewarp (perspective correction) -----------------------------------------


def order_points(pts: np.ndarray) -> np.ndarray:
    """Clockwise TL, TR, BR, BL via the sum/diff trick
    (geometry.py:81-103 exactly)."""
    rect = np.zeros((4, 2), dtype=np.float64)
    s = pts.sum(axis=1)
    rect[0] = pts[np.argmin(s)]
    rect[2] = pts[np.argmax(s)]
    diff = np.diff(pts, axis=1).ravel()
    rect[1] = pts[np.argmin(diff)]
    rect[3] = pts[np.argmax(diff)]
    return rect


def detect_page_quad(img: np.ndarray,
                     min_area_ratio: float = 0.30) -> np.ndarray | None:
    """Find the document quadrilateral: the bright "page" region's extreme
    corners (geometry.py:22-78's contour+approxPolyDP replaced by the
    extreme-point estimate over the above-mean mask; same >= 30%-of-image
    area gate)."""
    gray = to_gray(img)
    mask = gray > gray.mean()
    if mask.sum() < min_area_ratio * mask.size:
        return None
    ys, xs = np.nonzero(mask)
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    s = xs + ys
    d = xs.astype(np.int64) - ys
    quad = np.array([pts[np.argmin(s)], pts[np.argmax(d)],
                     pts[np.argmax(s)], pts[np.argmin(d)]])
    # degenerate (page fills the frame edge-to-edge): nothing to correct
    area = 0.5 * abs(
        sum(quad[i][0] * quad[(i + 1) % 4][1] - quad[(i + 1) % 4][0] * quad[i][1]
            for i in range(4)))
    if area < min_area_ratio * mask.size:
        return None
    # full-bleed guard: a quad whose corners sit on (or within a sliver of)
    # the image corners is the page filling the frame — the reference's
    # contour detector finds no page outline against a background there
    # (geometry.py:22-78 needs a closed page contour), so dewarp must be a
    # no-op; warping frame->frame through the resampler would only shift
    # pixels. Tolerance: 1% of each dimension, min 2px.
    h, w = gray.shape[:2]
    tol_x, tol_y = max(2.0, 0.01 * w), max(2.0, 0.01 * h)
    corners = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                       dtype=np.float64)
    ordered = order_points(quad)
    if (np.abs(ordered[:, 0] - corners[:, 0]).max() <= tol_x
            and np.abs(ordered[:, 1] - corners[:, 1]).max() <= tol_y):
        return None
    # degenerate quad (near-duplicate corners -> singular homography, e.g.
    # a gradient picture whose bright-mask extreme points coincide): not a
    # page outline, nothing to correct
    for i in range(4):
        for j in range(i + 1, 4):
            if np.linalg.norm(ordered[i] - ordered[j]) < 8.0:
                return None
    return quad


def _homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """4-point DLT: H with H @ [x_src, y_src, 1] ~ [x_dst, y_dst, 1]."""
    a, b = [], []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    h = np.linalg.solve(np.array(a, dtype=np.float64),
                        np.array(b, dtype=np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def perspective_correction(img: np.ndarray,
                           quad: np.ndarray | None = None,
                           padding: int = 0) -> np.ndarray:
    """P1: warp the document quad to a rectangle (geometry.py:107-165:
    output size = max opposite-side lengths; white border; returns the
    original image unchanged when no quad is found)."""
    if quad is None:
        quad = detect_page_quad(img)
        if quad is None:
            return img
    pts = order_points(np.asarray(quad, dtype=np.float64))
    tl, tr, br, bl = pts
    max_w = int(max(np.linalg.norm(tr - tl), np.linalg.norm(br - bl)))
    max_h = int(max(np.linalg.norm(bl - tl), np.linalg.norm(br - tr)))
    max_w, max_h = max(max_w, 1), max(max_h, 1)
    dst = np.array([[padding, padding],
                    [max_w - 1 + padding, padding],
                    [max_w - 1 + padding, max_h - 1 + padding],
                    [padding, max_h - 1 + padding]], dtype=np.float64)
    # inverse map: for each output pixel, where in the source?
    try:
        h_inv = _homography(dst, pts)
    except np.linalg.LinAlgError:
        # degenerate external quad (caller-supplied): nothing to correct
        return img
    out_h, out_w = max_h + 2 * padding, max_w + 2 * padding
    yy, xx = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    denom = h_inv[2, 0] * xx + h_inv[2, 1] * yy + h_inv[2, 2]
    sx = (h_inv[0, 0] * xx + h_inv[0, 1] * yy + h_inv[0, 2]) / denom
    sy = (h_inv[1, 0] * xx + h_inv[1, 1] * yy + h_inv[1, 2]) / denom
    h, w = img.shape[:2]
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    # bilinear sampling (cv2.warpPerspective's INTER_LINEAR default, the
    # interpolation the reference's geometry.py warp uses) — nearest-neighbor
    # double-rounding visibly degrades small glyphs on mild warps
    sxf = np.clip(sx, 0, w - 1)
    syf = np.clip(sy, 0, h - 1)
    x0 = np.floor(sxf).astype(int)
    y0 = np.floor(syf).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (sxf - x0)
    fy = (syf - y0)
    if img.ndim == 3:
        fx, fy = fx[..., None], fy[..., None]
    a = img[y0, x0].astype(np.float64)
    b = img[y0, x1].astype(np.float64)
    c = img[y1, x0].astype(np.float64)
    d = img[y1, x1].astype(np.float64)
    sampled = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
               + c * (1 - fx) * fy + d * fx * fy)
    sampled = np.clip(np.rint(sampled), 0, 255).astype(img.dtype)
    white = np.full_like(sampled, 255)
    return np.where(inside[..., None] if img.ndim == 3 else inside,
                    sampled, white)
