"""Preprocessing-policy tests (reference: resize_detection.rs Type0,
resize_recognition.rs, normalization.rs, batch/mod.rs ToBatch)."""

import numpy as np
import pytest

from oar_ocr_ray.preprocess import (
    det_resize,
    normalize_image,
    ocr_resize_and_pad,
    pad_to_min_size,
    resize_bilinear,
    to_batch,
)


def test_det_resize_min_grows_short_side():
    img = np.full((100, 200), 128, dtype=np.uint8)
    out, (rh, rw) = det_resize(img, limit_side_len=736, limit_type="min")
    # ratio 7.36 -> 736x1472, already multiples of 32
    assert out.shape == (736, 1472)
    assert rh == pytest.approx(7.36) and rw == pytest.approx(7.36)


def test_det_resize_max_shrinks_long_side_and_snaps_32():
    img = np.zeros((500, 1000), dtype=np.uint8)
    out, _ = det_resize(img, limit_side_len=960, limit_type="max")
    # long side 1000 > 960 -> ratio .96 -> 480x960 both /32-snapped
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape == (480, 960)


def test_det_resize_noop_when_within_limits():
    img = np.zeros((736, 736), dtype=np.uint8)
    out, ratios = det_resize(img, limit_side_len=736, limit_type="min")
    assert out.shape == (736, 736) and ratios == (1.0, 1.0)


def test_det_resize_max_side_cap():
    img = np.zeros((100, 4000), dtype=np.uint8)
    out, _ = det_resize(img, limit_side_len=736, limit_type="min", max_side_limit=4000)
    assert max(out.shape) <= 4000 + 16  # snapped to /32 after cap


def test_pad_to_min_size():
    img = np.full((10, 20), 7, dtype=np.uint8)
    out = pad_to_min_size(img)
    assert out.shape == (32, 32)
    assert (out[:10, :20] == 7).all() and out[31, 31] == 255


def test_ocr_resize_and_pad():
    img = np.full((24, 96), 50, dtype=np.uint8)  # wh_ratio 4
    out, actual = ocr_resize_and_pad(img, target_h=48, max_wh_ratio=10.0)
    assert out.shape == (48, 480)
    assert actual == 192  # 48 * 4
    assert (out[:, :actual] == 50).all()
    assert (out[:, actual:] == 0).all()


def test_ocr_resize_cap_at_tensor_width():
    img = np.full((10, 1000), 50, dtype=np.uint8)  # ratio 100 > max 10
    out, actual = ocr_resize_and_pad(img, target_h=48, max_wh_ratio=10.0)
    assert out.shape == (48, 480) and actual == 480


def test_normalize_image():
    img = np.full((4, 5, 3), 255, dtype=np.uint8)
    out = normalize_image(img)
    assert out.shape == (3, 4, 5) and out.dtype == np.float32
    # channel 0: (1.0 - 0.485) / 0.229
    assert out[0, 0, 0] == pytest.approx((1.0 - 0.485) / 0.229, rel=1e-5)
    bgr = normalize_image(img[:, :, ::-1].copy(), rgb_to_bgr=True)
    np.testing.assert_allclose(bgr, out, rtol=1e-5)


def test_to_batch_contiguous_fast_path():
    imgs = [np.ones((3, 8, 8), dtype=np.float32)] * 4
    out = to_batch(imgs)
    assert out.shape == (4, 3, 8, 8) and (out == 1).all()


def test_to_batch_mixed_dims_pads():
    imgs = [np.ones((3, 8, 8), dtype=np.float32), np.ones((3, 4, 12), dtype=np.float32)]
    out = to_batch(imgs)
    assert out.shape == (2, 3, 8, 12)
    assert out[0, 0, 0, 8:].sum() == 0  # padding zeroed
    assert out[1, 0, 4:, :].sum() == 0


def test_resize_bilinear_identity_and_shape():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (resize_bilinear(img, 3, 4) == img).all()
    assert resize_bilinear(img, 6, 8).shape == (6, 8)


def _empty_det_out():
    return {k: [] for k in ("doc_id", "offset", "det_idx", "kind", "text",
                            "media_ref", "part", "crop", "crop_h", "crop_w", "wh_ratio",
                            "bx0", "by0", "bx1", "by1")}


def test_det_resize_cap_wired_maps_boxes_back():
    """Oversized pages go through the DetResizeForTest max-side cap inside
    MediaDetect: detection runs on the downscaled image, boxes map back by
    ratio (floor/ceil cover), crops slice the ORIGINAL page."""
    from oar_ocr_ray.stages.media import MediaDetect
    from oar_ocr_ray.stubs import detect_boxes_batch

    md = MediaDetect(media_refs={}, det_max_side=512)
    img = np.full((256, 4096), 255, np.uint8)
    img[100:140, 1000:1400] = 0
    out = _empty_det_out()
    md._detect_chunk([("d", 0, "r", 0, 0)], [img], detect_boxes_batch, out)
    assert len(out["bx0"]) == 1
    # thresholding after bilinear downscale erodes edges by up to ~2 resized
    # px (the reference's DB pipeline compensates with unclip); the mapped
    # box must land within that band of the true block on every side
    tol = 2 * (4096 / 512)
    assert abs(out["bx0"][0] - 1000) <= tol and abs(out["bx1"][0] - 1400) <= tol
    assert abs(out["by0"][0] - 100) <= tol and abs(out["by1"][0] - 140) <= tol
    # crop was sliced from the ORIGINAL frame: full-resolution extent
    assert out["crop_w"][0] >= 400 - tol


def test_det_resize_noop_below_cap():
    """In-range pages bypass the resize entirely (bit-identical boxes)."""
    from oar_ocr_ray.stages.media import MediaDetect
    from oar_ocr_ray.stubs import detect_boxes, detect_boxes_batch

    md = MediaDetect(media_refs={})
    img = np.full((100, 200), 255, np.uint8)
    img[10:20, 30:90] = 0
    out = _empty_det_out()
    md._detect_chunk([("d", 0, "r", 0, 0)], [img], detect_boxes_batch, out)
    direct = detect_boxes(img)
    assert [out["bx0"][0], out["by0"][0], out["bx1"][0], out["by1"][0]] == \
        [float(v) for v in direct[0]]


def test_small_page_padded_before_detect():
    """Sub-32px pages are white-padded (resize_detection.rs small-image
    guard); boxes stay exact in the original frame."""
    from oar_ocr_ray.stages.media import MediaDetect
    from oar_ocr_ray.stubs import detect_boxes_batch

    md = MediaDetect(media_refs={})
    img = np.full((10, 20), 255, np.uint8)
    img[2:8, 3:15] = 0
    out = _empty_det_out()
    md._detect_chunk([("d", 0, "r", 0, 0)], [img], detect_boxes_batch, out)
    assert (out["bx0"][0], out["by0"][0], out["bx1"][0], out["by1"][0]) == (3.0, 2.0, 15.0, 8.0)


def test_cell_patch_survives_model_input_chain_exactly():
    """The fixture cell encoding must survive ocr_resize_and_pad ->
    normalize_image -> to_batch EXACTLY: vertically-constant rows make the
    bilinear height resize exact, 3-px cells keep a center sample's
    bilinear neighbours inside the cell for any upscale, and the float32
    normalize round-trips 0..255 within rint. StubCtcSession must decode
    the same text from the tensor that read_crop_text reads from the raw
    crop, across the full fixture geometry range (bh 8..14, n 1..31) and
    a shared batch max_wh_ratio."""
    import numpy as np

    from oar_ocr_ray.ctc import ctc_greedy_decode
    from oar_ocr_ray.fixtures import text_patch
    from oar_ocr_ray.preprocess import normalize_image, ocr_resize_and_pad, to_batch
    from oar_ocr_ray.stubs import StubCtcSession, read_crop_text

    rng = np.random.default_rng(42)
    cases = []
    for _ in range(64):
        n = int(rng.integers(1, 32))
        t = "".join(chr(int(rng.integers(32, 127))) for _ in range(n))
        p = text_patch(t, int(rng.integers(8, 15)))
        assert read_crop_text(p) == t
        assert read_crop_text(np.rot90(p, 2).copy()) == ""  # flip invalid
        cases.append((t, p))
    max_wh = max(p.shape[1] / p.shape[0] for _, p in cases)
    tensor = to_batch([
        normalize_image(ocr_resize_and_pad(p, target_h=48, max_wh_ratio=max_wh)[0])
        for _, p in cases
    ])
    assert tensor.dtype == np.float32 and tensor.shape[1:3] == (3, 48)
    for (t, _), logits in zip(cases, StubCtcSession()(tensor)):
        assert ctc_greedy_decode(logits)[0] == t


def test_word_boxes_identical_pixel_vs_tensor_path():
    """emit_word_boxes must produce IDENTICAL texts, confidences and
    per-character boxes whether recognition reads stub pixels or runs the
    model-input tensor chain — the CTC column math is shared, so any
    divergence means the session wiring changed semantics. Includes a
    flipped line (second-session-call retry) and a skewed line
    (ImageRotation unrotate before preprocess)."""
    import numpy as np
    import pyarrow as pa

    from oar_ocr_ray.fixtures import skew_text_patch, text_patch
    from oar_ocr_ray.rectify import rotate_about_center
    from oar_ocr_ray.stages.media import BBOX_FIELDS, CROP_FIELDS, Recognize

    crops = [text_patch("Hello world", 10),
             np.rot90(text_patch("Flipped line", 12), 2).copy()]
    p = skew_text_patch("Skewed+text", 12)
    pad = 6
    canvas = np.full((12 + 2 * pad, p.shape[1] + 2 * pad), 255, np.uint8)
    canvas[pad:pad + 12, pad:pad + p.shape[1]] = p
    rot = rotate_about_center(canvas, 2.4, fill=255)
    ys, xs = np.nonzero(rot < 128)
    crops.append(rot[ys.min():ys.max() + 1, xs.min():xs.max() + 1])

    cols = {"doc_id": pa.array(["d"] * len(crops), pa.string()),
            "text": pa.array([""] * len(crops), pa.string())}
    for (name, typ), vals in zip(
        CROP_FIELDS,
        [[c.tobytes() for c in crops],
         [c.shape[0] for c in crops],
         [c.shape[1] for c in crops],
         [c.shape[1] / c.shape[0] for c in crops]],
    ):
        cols[name] = pa.array(vals, typ)
    for (name, typ), vals in zip(
        BBOX_FIELDS,
        [[0.0] * len(crops), [0.0] * len(crops),
         [float(c.shape[1]) for c in crops],
         [float(c.shape[0]) for c in crops]],
    ):
        cols[name] = pa.array(vals, typ)
    batch = pa.table(cols)

    pix = Recognize(emit_word_boxes=True)(batch).to_pydict()
    ten = Recognize(emit_word_boxes=True, model_input=True)(batch).to_pydict()
    assert pix["text"] == ten["text"]
    assert sorted(pix["text"]) == sorted(["Hello world", "Flipped line",
                                          "Skewed+text"])
    assert pix["word_boxes"] == ten["word_boxes"]
    assert any(wb for wb in pix["word_boxes"])  # boxes actually emitted
