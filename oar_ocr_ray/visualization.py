"""OCR / structure result visualization — side-by-side canvas.

Mirror of the reference's visualization module
(/root/reference/src/utils/visualization.rs): `create_ocr_visualization`
builds a (w*2, h) canvas — original page on the left, detection results on
the right over a white background (visualization.rs:200-217); structure
visualization shades each element by its type class
(visualization.rs:873-943 get_element_color).

Environment-honest rendering: the container has no font rasterizer
(ab_glyph in the reference), so recognized text is drawn in THIS repo's
pixel-text cell convention — vertically-constant CELL_W-wide cells
encoding [len][ascii...] (fixtures.py contract) — which keeps the
visualization machine-readable:
`stubs.read_crop_text` decodes every drawn line back (round-trip tested).
Grayscale instead of RGB for the same reason (own PNG codec is gray);
element classes map to distinct gray shades.
"""

from __future__ import annotations

import numpy as np

from .png_codec import encode_png

from .fixtures import FILL_VALUE  # patch background: the SAME pixel-text
# contract the fixture renderer uses (dark < 128), so a visualization fed
# back through detect_boxes/read_crop_text behaves like a fixture page

BACKGROUND = 255
BOX_BORDER = 0

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
    """Render text INSIDE the box in the pixel-text cell convention
    (fixtures.text_patch: vertically-constant CELL_W-wide cells,
    [len][ord...]); truncated to what fits — including a pixel of outline
    inset on each side so read_crop_text's s=1 fallback still decodes —
    ascii-only (non-ascii chars are replaced, the reference falls back
    glyph-by-glyph the same way)."""
    from .fixtures import CELL_W, text_patch

    h, w = img.shape[:2]
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(w, x1), min(h, y1)
    bw, bh = x1 - x0, y1 - y0
    if bw < CELL_W * 2 + 2 or bh < 2:
        return
    # fit: the caller passes the already-inset interior box, which is
    # exactly what read_crop_text will see — its s=1 branch needs
    # CELL_W*(n+1)+1 <= bw => n <= (bw - 4) / CELL_W
    n_max = min(31, (bw - CELL_W - 1) // CELL_W)
    enc = text.encode("ascii", errors="replace")[: max(n_max, 0)]
    if not enc:
        return
    patch = text_patch(enc.decode("ascii"), bh)[:, :bw]
    out = np.full((bh, bw), FILL_VALUE, dtype=np.uint8)
    out[:, : patch.shape[1]] = patch
    img[y0:y1, x0:x1] = out


def _side_by_side(page: np.ndarray,
                  items: list[tuple[list, int, str]]) -> np.ndarray:
    """Shared canvas builder: original left, each (box, shade, text) item
    outlined + text-patched on the right. Boxes are clamped to the PAGE
    frame before the right-half shift so an out-of-bounds box can never
    bleed onto the original-page panel."""
    page = page if page.ndim == 2 else page[:, :, 0]
    h, w = page.shape
    canvas = np.full((h, w * 2), BACKGROUND, dtype=np.uint8)
    canvas[:, :w] = page
    for box, shade, text in items:
        x0, y0, x1, y1 = (int(v) for v in box)
        x0, x1 = max(0, x0), min(w, x1)
        y0, y1 = max(0, y0), min(h, y1)
        if x1 <= x0 or y1 <= y0:
            continue
        draw_rect_outline(canvas, w + x0, y0, w + x1, y1, value=shade)
        draw_text_patch(canvas, w + x0 + 1, y0 + 1, w + x1 - 1, y1 - 1, text)
    return canvas


def create_ocr_visualization(page: np.ndarray, spans: list[dict]) -> np.ndarray:
    """(h, w) page + spans [{box: [x0,y0,x1,y1], text: str}, ...] ->
    (h, 2w) canvas: original left, white background + outlined boxes with
    decodable text right (visualization.rs:200-217 layout)."""
    return _side_by_side(
        page, [(s["box"], BOX_BORDER, s.get("text", "")) for s in spans])


def create_structure_visualization(page: np.ndarray,
                                   elements: list[dict]) -> np.ndarray:
    """Structure variant: each element outlined in its class shade
    (get_element_color analogue) with the class name drawn inside."""
    return _side_by_side(
        page, [(el["box"], get_element_shade(el.get("type", "")),
                str(el.get("type", ""))) for el in elements])


def visualize_ocr_png(png_bytes: bytes, result: dict,
                      decoded: np.ndarray | None = None) -> bytes:
    """predict_image() result -> visualization PNG (the save_results /
    CLI `--visualize` artifact, domain/structure.rs:558). Pass `decoded`
    to skip the redundant PNG decode when the caller already has it."""
    from .png_codec import decode_png
    from .stubs import classify_orientation, correct_orientation

    img = decode_png(png_bytes) if decoded is None else decoded
    # spans are reported in the upright frame; visualize that frame
    up = correct_orientation(img, classify_orientation(img))
    return encode_png(create_ocr_visualization(up, result["spans"]))
