"""Model-boundary preprocessing: resize policies, normalization, batch
padding — pure numpy, used inside model stages' `__call__`.

Reimplements (semantics, not code) the reference's:
  - DetResizeForTest Type0 limit-side policy with /32 snapping and
    max-side cap (/root/reference/src/processors/resize_detection.rs:244-308;
    constants /root/reference/src/core/constants.rs:11-23). The reference
    resamples with Lanczos3; we use bilinear (deterministic, model-free).
  - small-image guard: pad to at least 32x32
    (/root/reference/src/processors/resize_detection.rs:183-215).
  - OCRResize recognition resize: height fixed, width = h * max_wh_ratio
    capped at max_img_w, right-pad (/root/reference/src/processors/
    resize_recognition.rs:19-160).
  - NormalizeImage: scale + per-channel mean/std, HWC->CHW, optional
    RGB->BGR (/root/reference/src/processors/normalization.rs).
  - ToBatch: pad variable-size CHW images to batch max dims
    (/root/reference/src/core/batch/mod.rs:227-465).
"""

from __future__ import annotations

import numpy as np

DEFAULT_LIMIT_SIDE_LEN = 736
DEFAULT_MAX_SIDE_LIMIT = 4000
DEFAULT_REC_SHAPE = (3, 48, 320)
DEFAULT_MAX_IMG_W = 3200
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic bilinear resample, (H,W[,C]) uint8 -> (out_h,out_w[,C])."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img.copy()
    gray = img.ndim == 2
    src = img[..., None] if gray else img
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    f = src.astype(np.float64)
    a, b = f[y0], f[y1]  # row gathers cached; terms unchanged (bit-identical)
    out = (
        a[:, x0] * (1 - fy) * (1 - fx)
        + a[:, x1] * (1 - fy) * fx
        + b[:, x0] * fy * (1 - fx)
        + b[:, x1] * fy * fx
    )
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[..., 0] if gray else out


def pad_to_min_size(img: np.ndarray, min_side: int = 32) -> np.ndarray:
    """Pad (white) so both sides are >= min_side (resize_detection.rs:183-215)."""
    h, w = img.shape[:2]
    if h >= min_side and w >= min_side:
        return img
    nh, nw = max(h, min_side), max(w, min_side)
    out_shape = (nh, nw) + img.shape[2:]
    out = np.full(out_shape, 255, dtype=img.dtype)
    out[:h, :w] = img
    return out


def det_resize(
    img: np.ndarray,
    limit_side_len: int = DEFAULT_LIMIT_SIDE_LEN,
    limit_type: str = "min",
    max_side_limit: int = DEFAULT_MAX_SIDE_LIMIT,
) -> tuple[np.ndarray, tuple[float, float]]:
    """Type0 limit-side resize: compute ratio per limit_type
    ('max': shrink if long side > limit; 'min': grow if short side < limit;
    'resize_long': long side == limit), cap at max_side_limit, snap dims to
    multiples of 32 ((r + 16) // 32 * 32, min 32). Returns
    (resized, (ratio_h, ratio_w))."""
    h, w = img.shape[:2]
    if limit_type == "max":
        ratio = limit_side_len / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = limit_side_len / min(h, w) if min(h, w) < limit_side_len else 1.0
    elif limit_type == "resize_long":
        ratio = limit_side_len / max(h, w)
    else:
        raise ValueError(f"unknown limit_type {limit_type}")
    rh, rw = int(h * ratio), int(w * ratio)
    if max(rh, rw) > max_side_limit:
        lr = max_side_limit / max(rh, rw)
        rh, rw = int(rh * lr), int(rw * lr)
    rh = max((rh + 16) // 32 * 32, 32)
    rw = max((rw + 16) // 32 * 32, 32)
    if (rh, rw) == (h, w):
        return img, (1.0, 1.0)
    out = resize_bilinear(img, rh, rw)
    return out, (rh / h, rw / w)


def ocr_resize_and_pad(
    img: np.ndarray,
    target_h: int = DEFAULT_REC_SHAPE[1],
    max_img_w: int = DEFAULT_MAX_IMG_W,
    max_wh_ratio: float | None = None,
) -> tuple[np.ndarray, int]:
    """Recognition resize: height -> target_h keeping aspect; batch tensor
    width = target_h * max_wh_ratio (capped at max_img_w); image right-padded
    with zeros to that width. Returns (padded, actual_content_width)."""
    h, w = img.shape[:2]
    if max_wh_ratio is None:
        max_wh_ratio = DEFAULT_REC_SHAPE[2] / DEFAULT_REC_SHAPE[1]
    tensor_w = min(int(np.ceil(target_h * max_wh_ratio)), max_img_w)
    ratio = w / max(h, 1)
    actual_w = min(int(np.ceil(target_h * ratio)), tensor_w)
    actual_w = max(actual_w, 1)
    resized = resize_bilinear(img, target_h, actual_w)
    out_shape = (target_h, tensor_w) + img.shape[2:]
    out = np.zeros(out_shape, dtype=img.dtype)
    out[:, :actual_w] = resized
    return out, actual_w


def normalize_image(
    img: np.ndarray,
    scale: float = 1.0 / 255.0,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    to_chw: bool = True,
    rgb_to_bgr: bool = False,
) -> np.ndarray:
    """(H,W,3) uint8 -> float32 (3,H,W): x*scale then (x - mean) / std per
    channel; optional channel swap (normalization.rs semantics)."""
    f = img.astype(np.float32)
    if f.ndim == 2:
        f = np.repeat(f[:, :, None], 3, axis=2)
    if rgb_to_bgr:
        f = f[:, :, ::-1]
    f = f * scale
    f = (f - mean[None, None, :]) / std[None, None, :]
    return np.ascontiguousarray(f.transpose(2, 0, 1)) if to_chw else f


def gray_batch_tensor(
    imgs: list[np.ndarray] | np.ndarray,
    scale: float = 1.0 / 255.0,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> np.ndarray:
    """Fused `to_batch([normalize_image(g) for g in imgs])` for
    EQUAL-SHAPE GRAYSCALE images: one (B, 3, H, W) float32 allocation,
    the x*scale -> (x - mean[c]) / std[c] chain applied channel-broadcast.
    Bit-identical to the per-image path (same float32 elementwise ops in
    the same order) with ~3x less float work and no per-image channel
    repeat / transpose / contiguous copy — the hot preprocess of the det
    and rec session seams (profiled: normalize was ~25% of the tensor
    wall)."""
    arr = np.asarray(imgs) if not isinstance(imgs, np.ndarray) else imgs
    if arr.ndim != 3:
        raise ValueError(f"expected (B, H, W) grayscale stack, got {arr.shape}")
    g = arr.astype(np.float32) * np.float32(scale)
    out = np.empty((arr.shape[0], 3) + arr.shape[1:], dtype=np.float32)
    for c in range(3):
        out[:, c] = (g - mean[c]) / std[c]
    return out


def to_batch(imgs: list[np.ndarray]) -> np.ndarray:
    """Pad CHW float32 images to common (B, C, Hmax, Wmax), zero-filled;
    contiguous fast path when all dims equal (batch/mod.rs:227-465)."""
    if not imgs:
        return np.zeros((0, 0, 0, 0), dtype=np.float32)
    shapes = {im.shape for im in imgs}
    if len(shapes) == 1:
        return np.ascontiguousarray(np.stack(imgs)).astype(np.float32, copy=False)
    c = imgs[0].shape[0]
    hmax = max(im.shape[1] for im in imgs)
    wmax = max(im.shape[2] for im in imgs)
    out = np.zeros((len(imgs), c, hmax, wmax), dtype=np.float32)
    for i, im in enumerate(imgs):
        out[i, :, :im.shape[1], :im.shape[2]] = im
    return out


# ---------------------------------------------------------------------------
# PP-LCNet classification preprocess (models/classification/pp_lcnet.rs:
# resize-shorter-side + center-crop) and UniMERNet formula preprocess
# (processors/unimernet_preprocess.rs:44-250: crop-margin, min-side resize
# with shrink-to-fit, white-pad to target)
# ---------------------------------------------------------------------------

def resize_short(img: np.ndarray, target: int = 256) -> np.ndarray:
    """Resize so the SHORTER side equals `target` (aspect preserved,
    bilinear) — the PP-LCNet eval resize."""
    from .rectify import resize_bilinear

    h, w = img.shape[:2]
    if h <= w:
        nh, nw = target, max(int(round(w * target / h)), 1)
    else:
        nh, nw = max(int(round(h * target / w)), 1), target
    return resize_bilinear(img, nh, nw)


def center_crop(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Center crop to (size, size) (PP-LCNet eval crop). Images smaller
    than the crop are edge-clamped by the slice."""
    h, w = img.shape[:2]
    y0 = max((h - size) // 2, 0)
    x0 = max((w - size) // 2, 0)
    return img[y0:y0 + size, x0:x0 + size]


def crop_margin(img: np.ndarray, threshold: int = 200) -> np.ndarray:
    """UniMERNet crop-margin (unimernet_preprocess.rs:48-110): min-max
    normalize the gray image, binarize BELOW threshold as content, crop to
    the content bbox (inclusive ends). Uniform images returned unchanged."""
    gray = img if img.ndim == 2 else img[..., 0]
    mn, mx = int(gray.min()), int(gray.max())
    if mn == mx:
        return img
    norm = ((gray.astype(np.float64) - mn) / (mx - mn) * 255.0).astype(np.uint8)
    content = norm < threshold
    if not content.any():
        return img
    ys, xs = np.nonzero(content)
    return img[ys.min():ys.max() + 1, xs.min():xs.max() + 1]


def resize_unimernet(img: np.ndarray, target_hw: tuple[int, int] = (192, 672)) -> np.ndarray:
    """UniMERNet resize (unimernet_preprocess.rs:113-145): scale so the
    smaller image side matches min(target); if the result overflows the
    target box, shrink to fit (both legs bilinear)."""
    from .rectify import resize_bilinear

    th, tw = target_hw
    h, w = img.shape[:2]
    min_target = min(th, tw)
    scale = min_target / w if w <= h else min_target / h
    nh, nw = int(h * scale), int(w * scale)
    out = resize_bilinear(img, max(nh, 1), max(nw, 1))
    ch, cw = out.shape[:2]
    if cw > tw or ch > th:
        s = min(tw / cw, th / ch)
        out = resize_bilinear(out, max(int(ch * s), 1), max(int(cw * s), 1))
    return out


def pad_to_target(img: np.ndarray, target_hw: tuple[int, int] = (192, 672),
                  fill: int = 255) -> np.ndarray:
    """UniMERNet centered white padding (unimernet_preprocess.rs:148-170)."""
    th, tw = target_hw
    h, w = img.shape[:2]
    pad_top = max(th - h, 0) // 2
    pad_left = max(tw - w, 0) // 2
    shape = (th, tw) if img.ndim == 2 else (th, tw, img.shape[2])
    out = np.full(shape, fill, dtype=img.dtype)
    out[pad_top:pad_top + min(h, th), pad_left:pad_left + min(w, tw)] = img[:min(h, th), :min(w, tw)]
    return out
