"""Single-image predict CLI + HTTP server (tools/ocr_server.py) — the
reference's oar-ocr-server surface (server/main.rs:28-164): shared
pipeline state, json|text|pretty formats, per-request decode."""

import json
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, "tools")

from oar_ocr_ray.fixtures import _gen_image
from oar_ocr_ray.png_codec import encode_png

from ocr_server import format_result, predict_image


def page(seed=7):
    rng = np.random.default_rng(seed)
    while True:
        png, w, h, rot, boxes = _gen_image(rng)
        if len(boxes) >= 2:
            return png, w, h, rot, boxes


def test_predict_matches_fixture_truth():
    png, w, h, rot, boxes = page()
    res = predict_image(png)
    assert res["width"] in (w, h) and res["height"] in (w, h)
    assert res["orientation_class"] == rot
    got = [s["text"] for s in res["spans"]]
    assert sorted(got) == sorted(t for *_, t in boxes)
    # reading order: spans sorted by their emitted order field
    assert [s["order"] for s in res["spans"]] == list(range(len(got)))
    for s in res["spans"]:
        x0, y0, x1, y1 = s["box"]
        assert 0 <= x0 < x1 <= w and 0 <= y0 < y1 <= h
        assert 0.0 < s["confidence"] <= 1.0


def test_predict_empty_page():
    img = np.full((64, 64), 255, dtype=np.uint8)
    res = predict_image(encode_png(img))
    assert res["spans"] == []


def test_formats():
    png, *_ = page()
    res = predict_image(png)
    js = json.loads(format_result(res, "json"))
    assert js == res
    txt = format_result(res, "text")
    assert txt.splitlines() == [s["text"] for s in res["spans"]]
    pretty = format_result(res, "pretty")
    assert "orientation=" in pretty and res["spans"][0]["text"] in pretty


@pytest.fixture(scope="module")
def server():
    from ocr_server import make_server

    httpd = make_server("127.0.0.1", 0)  # the production handler, OS port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def test_http_roundtrip(server):
    png, w, h, rot, boxes = page()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/ocr", data=png, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
        res = json.loads(r.read())
    assert sorted(s["text"] for s in res["spans"]) == sorted(t for *_, t in boxes)

    bad = urllib.request.Request(
        f"http://127.0.0.1:{server}/ocr", data=b"not a png", method="POST")
    try:
        urllib.request.urlopen(bad, timeout=10)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised

    with urllib.request.urlopen(
            f"http://127.0.0.1:{server}/health", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_http_structure_endpoint(server):
    from oar_ocr_ray.fixtures import gen_structure_page

    png, *_ = gen_structure_page(np.random.default_rng(5))
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/structure", data=png, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
        res = json.loads(r.read())
    assert res["n_elements"] >= 1
    assert "markdown" in res and "html" in res


def test_predict_model_input_matches_pixel_path():
    """--model-input runs both model boundaries (StubDbSession det heatmap
    + tensor recognition via LineReader); texts and reading order must
    match the pixel path over fixture pages (boxes may differ by the
    documented ~2px unclip margin)."""
    for i in (3, 9, 21):
        rng = np.random.default_rng([31, i])
        png, w, h, rot, truth = _gen_image(rng)
        a = predict_image(png)
        b = predict_image(png, model_input=True)
        assert [s["text"] for s in a["spans"]] == [s["text"] for s in b["spans"]]
        for sa, sb in zip(a["spans"], b["spans"]):
            assert max(abs(x - y) for x, y in zip(sa["box"], sb["box"])) <= 2
