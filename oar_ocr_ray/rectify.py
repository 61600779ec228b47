"""UVDoc-style document rectification: the warp-field remap math.

Reimplements the geometry of the reference's UVDoc path
(/root/reference/src/models/rectification/uvdoc.rs:37-203 +
processors/uvdoc_postprocess.rs): preprocess resizes to the model's input
shape, the model yields a rectified image (internally a warp field sampled
bilinearly over the input), postprocess scales values back to [0,255] and
resizes to the original size. The neural forward is replaced by a
deterministic stand-in that emits a warp grid (identity by default); the
REMAP — bilinear grid sampling, the actual rectification math — is real.
"""

from __future__ import annotations

import numpy as np


def identity_grid(h: int, w: int) -> np.ndarray:
    """(H, W, 2) sampling grid: grid[y, x] = (x, y) source coordinates."""
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([xs, ys], axis=-1).astype(np.float64)


def grid_sample_bilinear(img: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Bilinear warp-field remap: out[y, x] = img sampled at grid[y, x] =
    (sx, sy), edge-clamped — the grid_sample underlying UVDoc's unwarping.
    img: (H, W) or (H, W, C); grid: (H', W', 2) float source coords."""
    g = np.asarray(grid, dtype=np.float64)
    sx = g[..., 0].ravel()
    sy = g[..., 1].ravel()
    gray = img.ndim == 2
    src = img[..., None] if gray else img
    hh, ww = src.shape[:2]
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, ww - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, hh - 1)
    x1 = np.minimum(x0 + 1, ww - 1)
    y1 = np.minimum(y0 + 1, hh - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)[:, None]
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None]
    p00 = src[y0, x0].astype(np.float64)
    p01 = src[y0, x1].astype(np.float64)
    p10 = src[y1, x0].astype(np.float64)
    p11 = src[y1, x1].astype(np.float64)
    out = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)
    out = out.reshape(g.shape[0], g.shape[1], src.shape[2])
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[..., 0] if gray else out


def grid_sample_bilinear_fill(img: np.ndarray, grid: np.ndarray,
                              fill: float = 255.0) -> np.ndarray:
    """grid_sample_bilinear with a constant out-of-bounds FILL instead of
    edge clamping (imageproc's rotate_about_center samples this way: the
    reference passes a white Rgb fill, processors.rs:155-166)."""
    g = np.asarray(grid, dtype=np.float64)
    sx = g[..., 0].ravel()
    sy = g[..., 1].ravel()
    gray = img.ndim == 2
    src = img[..., None] if gray else img
    hh, ww = src.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < hh) & (xx >= 0) & (xx < ww)
        vals = np.full((len(xx), src.shape[2]), float(fill))
        vals[inb] = src[yy[inb], xx[inb]].astype(np.float64)
        return vals

    out = (tap(y0, x0) * (1 - fx) * (1 - fy) + tap(y0, x0 + 1) * fx * (1 - fy)
           + tap(y0 + 1, x0) * (1 - fx) * fy + tap(y0 + 1, x0 + 1) * fx * fy)
    out = out.reshape(g.shape[0], g.shape[1], src.shape[2])
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[..., 0] if gray else out


def rotate_about_center(img: np.ndarray, angle_deg: float,
                        fill: float = 255.0) -> np.ndarray:
    """ImageRotationProcessor's rotate (reference processors.rs:130-182):
    rotate the image about its center by `angle_deg` (positive =
    counter-clockwise in image coords, matching imageproc's
    rotate_about_center with theta = -angle.to_radians() at the call
    site), bilinear interpolation, constant `fill` (white) background,
    SAME output dimensions as the input (corners crop / fill)."""
    h, w = img.shape[:2]
    t = np.deg2rad(angle_deg)
    c, s = np.cos(t), np.sin(t)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.meshgrid(np.arange(h) - cy, np.arange(w) - cx, indexing="ij")
    # inverse map: rotate output coords by -angle to find source coords
    grid = np.stack([xs * c - ys * s + cx, xs * s + ys * c + cy], axis=-1)
    return grid_sample_bilinear_fill(img, grid, fill=fill)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.INTER_LINEAR-style resize via the same grid sampler (the
    reference resizes with FilterType::Triangle on both legs)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    grid = np.stack(np.meshgrid(xs, ys), axis=-1)
    return grid_sample_bilinear(img, grid)


class UVDocRectifier:
    """Stateful rectification stage (the reference pins the ONNX session
    once per worker; here the stand-in warp-grid generator is the state).

    forward(img): resize to the model input shape, obtain the warp grid
    (stand-in: identity — a real UVDoc session plugs in here), remap via
    grid_sample_bilinear, scale/clamp (uvdoc_postprocess.rs:290-333
    apply_batch semantics with scale=1 on already-[0,255] data), and
    resize back to the original size.
    """

    def __init__(self, input_hw: tuple[int, int] = (712, 488), scale: float = 1.0):
        self.input_hw = input_hw
        self.scale = scale

    def predict_grid(self, img: np.ndarray) -> np.ndarray:
        """The 'neural' forward stand-in: identity warp field. A production
        build returns the UVDoc model's sampling grid here."""
        return identity_grid(img.shape[0], img.shape[1])

    def forward(self, img: np.ndarray) -> np.ndarray:
        oh, ow = img.shape[:2]
        th, tw = self.input_hw
        x = img if (oh, ow) == (th, tw) else resize_bilinear(img, th, tw)
        grid = self.predict_grid(x)
        rectified = grid_sample_bilinear(x, grid)
        rectified = np.clip(rectified.astype(np.float64) * self.scale, 0, 255).astype(np.uint8)
        if rectified.shape[:2] != (oh, ow):
            rectified = resize_bilinear(rectified, oh, ow)
        return rectified
