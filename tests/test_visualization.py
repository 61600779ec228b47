"""Visualization canvas (visualization.rs analogue): layout, clamping, and
the machine-readable round-trip — every drawn text line decodes back via
the same pixel-text contract the recognizer reads."""

import sys

import numpy as np

sys.path.insert(0, "tools")

from oar_ocr_ray.fixtures import _gen_image
from oar_ocr_ray.png_codec import decode_png
from oar_ocr_ray.stubs import read_crop_text
from oar_ocr_ray.visualization import (
    create_ocr_visualization,
    create_structure_visualization,
    get_element_shade,
    visualize_ocr_png,
)


def page(seed=11):
    rng = np.random.default_rng(seed)
    while True:
        png, w, h, rot, boxes = _gen_image(rng)
        if len(boxes) >= 2:
            return png, w, h, rot, boxes


def test_canvas_layout_and_roundtrip():
    from ocr_server import predict_image

    png, w, h, rot, boxes = page()
    res = predict_image(png)
    vis = decode_png(visualize_ocr_png(png, res))
    vis = vis if vis.ndim == 2 else vis[:, :, 0]  # codec may emit RGB
    assert vis.shape == (res["height"], res["width"] * 2)
    # left half is the upright page; right half background is white
    assert vis[0, res["width"] * 2 - 1] == 255
    # every span's text decodes back out of the right half (shifted box,
    # +1 inset past the outline)
    W = res["width"]
    for s in res["spans"]:
        x0, y0, x1, y1 = s["box"]
        patch = vis[y0 + 1:y1 - 1, W + x0 + 1:W + x1 - 1]
        assert read_crop_text(patch) == s["text"][:31]


def test_out_of_bounds_boxes_are_clamped():
    img = np.full((40, 40), 255, dtype=np.uint8)
    spans = [{"box": [-10, -10, 60, 60], "text": "clip"},
             {"box": [35, 35, 36, 36], "text": "tiny"},
             {"box": [5, 5, 5, 5], "text": "degenerate"}]
    vis = create_ocr_visualization(img, spans)
    assert vis.shape == (40, 80)  # no exception, canvas intact
    # the original-page panel must be untouched: a negative-x box clamps to
    # the page frame, it never bleeds left of column w
    assert (vis[:, :40] == img).all()


def test_structure_shades_distinct():
    img = np.full((60, 50), 255, dtype=np.uint8)
    els = [{"box": [2, 2, 30, 12], "type": "doc_title"},
           {"box": [2, 20, 30, 32], "type": "table"},
           {"box": [2, 40, 30, 52], "type": "unknown_kind"}]
    vis = create_structure_visualization(img, els)
    assert vis[2, 50 + 2] == get_element_shade("doc_title")
    assert vis[20, 50 + 2] == get_element_shade("table")
    assert vis[40, 50 + 2] == get_element_shade("unknown_kind")
    assert get_element_shade("doc_title") != get_element_shade("table")


def test_cli_structure_subcommand(tmp_path, capsys):
    from ocr_server import main

    from oar_ocr_ray.fixtures import gen_structure_page

    rng = np.random.default_rng(3)
    png, w, h, rot, blocks, lines, cells, regions = gen_structure_page(rng)
    src = tmp_path / "page.png"
    src.write_bytes(png)
    out = tmp_path / "layout.png"
    rc = main(["structure", str(src), "--format", "markdown",
               "--visualize", str(out)])
    assert rc == 0
    md = capsys.readouterr().out
    # every rendered line's text surfaces in the markdown export
    recovered = sum(1 for *_, t in lines if t in md)
    assert recovered >= len(lines) // 2  # table cells render as HTML rows
    vis = decode_png(out.read_bytes())
    vis = vis if vis.ndim == 2 else vis[:, :, 0]
    assert vis.shape[1] % 2 == 0

    rc = main(["structure", str(src), "--format", "json"])
    assert rc == 0
    import json as _json

    res = _json.loads(capsys.readouterr().out)
    assert res["n_elements"] >= 1 and "markdown" in res


def test_cli_visualize_flag(tmp_path):
    from ocr_server import main

    png, *_ = page()
    src = tmp_path / "page.png"
    src.write_bytes(png)
    out = tmp_path / "vis.png"
    rc = main(["predict", str(src), "--format", "text",
               "--visualize", str(out)])
    assert rc == 0
    vis = decode_png(out.read_bytes())
    vis = vis if vis.ndim == 2 else vis[:, :, 0]
    assert vis.shape[1] % 2 == 0
