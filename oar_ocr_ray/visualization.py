"""OCR / structure result visualization — side-by-side canvas.

Mirror of the reference's visualization module
(/root/reference/src/utils/visualization.rs): `create_ocr_visualization`
builds a (w*2, h) canvas — original page on the left, detection results on
the right over a white background (visualization.rs:200-217); structure
visualization shades each element by its type class
(visualization.rs:873-943 get_element_color).

Environment-honest rendering: the container has no font rasterizer
(ab_glyph in the reference), so recognized text is drawn in THIS repo's
pixel-text convention — a patch whose row 1 encodes [len][ascii...]
(fixtures.py contract) — which keeps the visualization machine-readable:
`stubs.read_crop_text` decodes every drawn line back (round-trip tested).
Grayscale instead of RGB for the same reason (own PNG codec is gray);
element classes map to distinct gray shades.
"""

from __future__ import annotations

import numpy as np

from .png_codec import encode_png

BACKGROUND = 255
BOX_BORDER = 0
FILL_VALUE = 230  # patch background, matches fixtures.FILL_VALUE contract

# get_element_color analogue: distinct gray shade per element class
# (reference groups classes into color families; families keep adjacent
# shades here)
ELEMENT_SHADES = {
    "doc_title": 40,
    "paragraph_title": 56,
    "text": 72,
    "content": 88,
    "abstract": 104,
    "image": 120,
    "table": 136,
    "chart": 152,
    "formula": 168,
    "figure_title": 184,
    "table_title": 200,
    "header": 216,
    "footer": 224,
    "seal": 48,
    "list": 160,
}
DEFAULT_SHADE = 96


def get_element_shade(element_type: str) -> int:
    return ELEMENT_SHADES.get(str(element_type).lower(), DEFAULT_SHADE)


def draw_rect_outline(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
                      value: int = BOX_BORDER) -> None:
    """1-px rectangle outline, clamped to the canvas (draw_hollow_rect)."""
    h, w = img.shape[:2]
    x0, x1 = max(0, min(x0, w - 1)), max(0, min(x1, w))
    y0, y1 = max(0, min(y0, h - 1)), max(0, min(y1, h))
    if x1 <= x0 or y1 <= y0:
        return
    img[y0, x0:x1] = value
    img[y1 - 1, x0:x1] = value
    img[y0:y1, x0] = value
    img[y0:y1, x1 - 1] = value


def draw_text_patch(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
                    text: str) -> None:
    """Render text INSIDE the box in the pixel-text convention (row 1 =
    [len][ord...]); truncated to what fits, ascii-only (non-ascii chars
    are replaced — the reference falls back glyph-by-glyph the same way)."""
    h, w = img.shape[:2]
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(w, x1), min(h, y1)
    bw, bh = x1 - x0, y1 - y0
    if bw < 3 or bh < 2:
        return
    enc = text.encode("ascii", errors="replace")[: min(31, bw - 2)]
    if not enc:
        return
    patch = np.full((bh, bw), FILL_VALUE, dtype=np.uint8)
    patch[1, 0] = len(enc)
    patch[1, 1:1 + len(enc)] = np.frombuffer(enc, dtype=np.uint8)
    img[y0:y1, x0:x1] = patch


def create_ocr_visualization(page: np.ndarray, spans: list[dict]) -> np.ndarray:
    """(h, w) page + spans [{box: [x0,y0,x1,y1], text: str}, ...] ->
    (h, 2w) canvas: original left, white background + outlined boxes with
    decodable text right (visualization.rs:200-217 layout)."""
    page = page if page.ndim == 2 else page[:, :, 0]
    h, w = page.shape
    canvas = np.full((h, w * 2), BACKGROUND, dtype=np.uint8)
    canvas[:, :w] = page
    for s in spans:
        x0, y0, x1, y1 = (int(v) for v in s["box"])
        draw_rect_outline(canvas, w + x0, y0, w + x1, y1)
        draw_text_patch(canvas, w + x0 + 1, y0 + 1, w + x1 - 1, y1 - 1,
                        s.get("text", ""))
    return canvas


def create_structure_visualization(page: np.ndarray,
                                   elements: list[dict]) -> np.ndarray:
    """Structure variant: right side outlines each element in its
    class shade (get_element_color analogue) with the class name drawn
    above-left inside the box when it fits."""
    page = page if page.ndim == 2 else page[:, :, 0]
    h, w = page.shape
    canvas = np.full((h, w * 2), BACKGROUND, dtype=np.uint8)
    canvas[:, :w] = page
    for el in elements:
        x0, y0, x1, y1 = (int(v) for v in el["box"])
        shade = get_element_shade(el.get("type", ""))
        draw_rect_outline(canvas, w + x0, y0, w + x1, y1, value=shade)
        draw_text_patch(canvas, w + x0 + 1, y0 + 1, w + x1 - 1, y1 - 1,
                        str(el.get("type", "")))
    return canvas


def visualize_ocr_png(png_bytes: bytes, result: dict) -> bytes:
    """predict_image() result -> visualization PNG (the save_results /
    CLI `--visualize` artifact, domain/structure.rs:558)."""
    from .png_codec import decode_png
    from .stubs import classify_orientation, correct_orientation

    img = decode_png(png_bytes)
    # spans are reported in the upright frame; visualize that frame
    up = correct_orientation(img, classify_orientation(img))
    return encode_png(create_ocr_visualization(up, result["spans"]))
