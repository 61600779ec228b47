"""Fixture generator coherence: the pixel contract must let the stub stages
recover exactly the ground truth the golden oracle uses."""

import numpy as np

from oar_ocr_ray.fixtures import gen_document, golden_extract, media_bucket
from oar_ocr_ray.geometry import aabb_to_quad, get_rotate_crop_image
from oar_ocr_ray.png_codec import decode_png
from oar_ocr_ray.sorting import sort_quad_boxes_indices
from oar_ocr_ray.stubs import (
    classify_orientation,
    correct_orientation,
    detect_boxes,
    read_crop_text,
)


def test_gen_document_deterministic():
    a, ma = gen_document(42, 3)
    b, mb = gen_document(42, 3)
    assert a == b
    assert len(ma) == len(mb)
    for x, y in zip(ma, mb):
        assert x["png"] == y["png"] and x["boxes"] == y["boxes"]


def test_offsets_are_gapless_but_shuffled():
    row, _ = gen_document(42, 5)
    offs = [s["offset"] for s in row["spans"]]
    assert sorted(offs) == list(range(len(offs)))


def test_stub_pipeline_recovers_truth():
    """For many media images: decode -> orient -> detect -> sort -> crop ->
    read must reproduce (text, raster order) from ground truth."""
    checked = 0
    for i in range(60):
        _row, media = gen_document(42, i)
        for m in media:
            img = decode_png(m["png"])[:, :, 0]
            cls = classify_orientation(img)
            assert cls == m["rot"]
            upright = correct_orientation(img, cls)
            assert upright.shape == (m["height"], m["width"])
            boxes = detect_boxes(upright)
            truth = m["boxes"]
            assert len(boxes) == len(truth), f"det count mismatch on {m['media_ref']}"
            want = {(b["x0"], b["y0"], b["x1"], b["y1"]): b["text"] for b in truth}
            order = sort_quad_boxes_indices(boxes.astype(float))
            got_texts = []
            for j in order:
                key = tuple(int(v) for v in boxes[j])
                assert key in want, f"box {key} not in truth"
                crop = get_rotate_crop_image(upright, aabb_to_quad(boxes[j].astype(float))[0])
                # some lines render upside down: classify + correct first
                from oar_ocr_ray.stubs import classify_line_orientation, correct_line_orientation

                crop = correct_line_orientation(crop, classify_line_orientation(crop))
                assert read_crop_text(crop) == want[key]
                got_texts.append(want[key])
            # golden ordering uses the same sort on truth boxes
            tarr = np.array([[b["x0"], b["y0"], b["x1"], b["y1"]] for b in truth], dtype=float)
            want_texts = [truth[int(j)]["text"] for j in sort_quad_boxes_indices(tarr)] if len(truth) else []
            assert got_texts == want_texts
            checked += 1
    assert checked > 30  # enough media exercised, incl. rotated ones


def test_golden_extract_shapes():
    row, media = gen_document(42, 0)
    truth = {m["media_ref"]: m for m in media}
    g = golden_extract(row, truth)
    orders = [s["order"] for s in g["spans"]]
    assert orders == list(range(len(orders)))
    for s in g["spans"]:
        assert s["kind"] in ("text", "image")
        if s["kind"] == "text":
            assert s["media_ref"] == "" and s["text"]
        else:
            assert s["media_ref"].startswith("media://")


def test_media_bucket_stable():
    assert media_bucket("media://doc-00000001/3") == media_bucket("media://doc-00000001/3")
    assert 0 <= media_bucket("x", 16) < 16


def test_rotate_boxes_back_matches_numpy_rotation():
    """Verify the coordinate mapping against actual pixel rotation."""
    from oar_ocr_ray.stubs import rotate_boxes_back

    rng = np.random.default_rng(3)
    upright = np.zeros((30, 50), dtype=np.uint8)
    # mark a rectangle in upright coords
    x0, y0, x1, y1 = 10, 5, 30, 12
    upright[y0:y1, x0:x1] = 200
    for cls in range(4):
        stored = np.rot90(upright, k=-cls)
        (bx0, by0, bx1, by1) = rotate_boxes_back(
            np.array([[x0, y0, x1, y1]]), cls, upright.shape[1], upright.shape[0]
        )[0]
        region = stored[int(by0):int(by1), int(bx0):int(bx1)]
        assert region.size > 0 and (region == 200).all(), cls
        assert (stored == 200).sum() == region.size, cls


def test_flipped_lines_generated_and_corrected():
    """The fixture renders some upside-down lines; the orientation
    classifier + correction must recover the exact text."""
    import numpy as np

    from oar_ocr_ray.fixtures import _draw_line
    from oar_ocr_ray.stubs import (
        classify_line_orientation,
        correct_line_orientation,
        read_crop_text,
    )

    rng = np.random.default_rng(0)
    n_flipped = 0
    for _ in range(200):
        img = np.full((40, 80), 255, dtype=np.uint8)
        ln = _draw_line(img, rng, 2, 2, 78, 38)
        if ln is None:
            continue
        x0, y0, x1, y1, text = ln
        crop = img[y0:y1, x0:x1]
        ang = classify_line_orientation(crop)
        if ang == 180:
            n_flipped += 1
        assert read_crop_text(correct_line_orientation(crop, ang)) == text
    assert n_flipped > 5, "flip path never exercised"
