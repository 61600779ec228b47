"""Single-image OCR predict CLI + HTTP server.

The Ray-side analogue of the reference's `oar-ocr-server` entry point
(/root/reference/src/bin/server/main.rs:28-164 CLI, src/bin/server/ocr.rs:34-80
HTTP): pipeline state is built ONCE and shared read-only across requests
(the Arc<OAROCR> pattern), responses format as json | text | pretty.

No Ray here on purpose: a single image is below any distribution threshold
(the reference's own ParallelPolicy keeps <=4 items sequential,
src/core/config/parallel.rs:82-90). The corpus-scale batch surface is
`python -m oar_ocr_ray.pipelines.extract` — same stage semantics, Ray Data
execution. This binary exists so a reference user's request-at-a-time
workflow ports 1:1.

Usage:
  python tools/ocr_server.py predict page.png --format pretty
  python tools/ocr_server.py serve --port 8765
  curl -s --data-binary @page.png http://127.0.0.1:8765/ocr | jq .
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oar_ocr_ray.ctc import ctc_greedy_decode, encode_ctc_logits
from oar_ocr_ray.png_codec import decode_png
from oar_ocr_ray.preprocess import det_resize, pad_to_min_size
from oar_ocr_ray.sorting import sort_quad_boxes_indices
from oar_ocr_ray.stubs import (
    classify_orientation,
    correct_orientation,
    detect_boxes,
)

DET_MAX_SIDE = 4000  # DetResizeForTest max_side_limit (core/constants.rs)


def predict_image(png_bytes: bytes, min_area: int = 9,
                  decoded: np.ndarray | None = None,
                  model_input: bool = False) -> dict:
    """One image through the exact flagship stage semantics:
    orientation -> detection (DB stand-in, or with model_input=True the
    REAL model boundary: normalize -> StubDbSession heatmap -> real
    DBPostProcess) -> raster reading-order sort -> crop (vertical
    auto-rotate) -> recognition via the shared LineReader (skew gate +
    fused 0/180 retry; tensor path when model_input=True)."""
    img = decode_png(png_bytes) if decoded is None else decoded
    cls = classify_orientation(img)
    up = correct_orientation(img, cls)

    h, w = up.shape[:2]
    if max(h, w) > DET_MAX_SIDE:
        det_in, (ry, rx) = det_resize(
            up, limit_side_len=DET_MAX_SIDE, limit_type="max",
            max_side_limit=DET_MAX_SIDE)
    elif min(h, w) < 32:
        det_in, (ry, rx) = pad_to_min_size(up, 32), (1.0, 1.0)
    else:
        det_in, (ry, rx) = up, (1.0, 1.0)

    if model_input:
        from oar_ocr_ray.geometry import db_boxes_from_bitmap
        from oar_ocr_ray.preprocess import normalize_image, to_batch
        from oar_ocr_ray.stubs import StubDbSession

        prob = StubDbSession()(to_batch([normalize_image(det_in)]))[0, 0]
        boxes, _scores = db_boxes_from_bitmap(
            prob[: det_in.shape[0], : det_in.shape[1]], score_mode="slow")
    else:
        boxes = detect_boxes(det_in, min_area=min_area)
    if len(boxes) and (ry, rx) != (1.0, 1.0):
        b = boxes.astype(np.float64)
        b[:, [0, 1]] = np.floor(b[:, [0, 1]] / [rx, ry])
        b[:, [2, 3]] = np.ceil(b[:, [2, 3]] / [rx, ry])
        boxes[:, 0] = np.clip(b[:, 0], 0, w)
        boxes[:, 1] = np.clip(b[:, 1], 0, h)
        boxes[:, 2] = np.clip(b[:, 2], 0, w)
        boxes[:, 3] = np.clip(b[:, 3], 0, h)

    from oar_ocr_ray.stages.media import LineReader

    reader = LineReader(model_input=model_input)
    spans = []
    order = sort_quad_boxes_indices(boxes.astype(np.float64)) if len(boxes) else []
    for det_idx, j in enumerate(order):
        x0, y0, x1, y1 = (int(v) for v in boxes[j])
        crop = up[y0:y1, x0:x1]
        if crop.shape[0] >= 1.5 * crop.shape[1]:  # vertical text auto-rotate
            crop = np.ascontiguousarray(np.rot90(crop, k=1))
        raw = reader.read(crop)  # skew gate + fused 0/180 retry
        text, conf, _ = ctc_greedy_decode(encode_ctc_logits(raw))
        if not text:  # empty/low-score filter (ocr.rs drop path)
            continue
        spans.append({
            "order": det_idx,
            "text": text,
            "confidence": round(float(conf), 6),
            "box": [x0, y0, x1, y1],
        })
    # dims of the UPRIGHT frame — the frame the span boxes live in (the
    # pipeline's report_original_frame=False convention, stages/media.py)
    return {
        "width": int(up.shape[1]),
        "height": int(up.shape[0]),
        "orientation_class": int(cls),
        "spans": spans,
    }


def format_result(result: dict, fmt: str) -> str:
    if fmt == "json":
        return json.dumps(result)
    if fmt == "text":
        return "\n".join(s["text"] for s in result["spans"])
    lines = [
        f"page {result['width']}x{result['height']} "
        f"orientation={result['orientation_class'] * 90}deg "
        f"spans={len(result['spans'])}"
    ]
    for s in result["spans"]:
        x0, y0, x1, y1 = s["box"]
        lines.append(
            f"  [{s['order']:>3}] ({x0:>4},{y0:>4})-({x1:>4},{y1:>4}) "
            f"conf={s['confidence']:.4f}  {s['text']}"
        )
    return "\n".join(lines)


def make_server(host: str, port: int):
    """Build (not start) the HTTP server; port 0 = OS-assigned."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        # pipeline state is module-level pure functions — read-only, safely
        # shared across handler threads (the Arc<OAROCR> analogue)
        def do_GET(self):
            if self.path == "/health":
                body = b'{"status":"ok"}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path not in ("/ocr", "/structure"):
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                img = decode_png(data)
            except Exception as e:  # client sent a bad PNG -> 400
                body = json.dumps({"error": f"invalid png: {e}"}).encode()
                self._reply(400, body)
                return
            try:
                if self.path == "/ocr":
                    result = predict_image(data, decoded=img)
                else:
                    from oar_ocr_ray.stages.structure_stage import (
                        predict_structure_page,
                    )

                    result = predict_structure_page(
                        img if img.ndim == 2 else img[:, :, 0])
                body = json.dumps(result).encode()
                code = 200
            except Exception:  # pipeline defect -> 500, no internals leaked
                body = b'{"error":"internal error"}'
                code = 500
            self._reply(code, body)

        def _reply(self, code: int, body: bytes) -> None:
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(host: str, port: int) -> None:
    httpd = make_server(host, port)
    print(f"listening on http://{host}:{httpd.server_address[1]}/ocr", flush=True)
    httpd.serve_forever()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("predict", help="OCR one PNG file")
    pp.add_argument("image")
    pp.add_argument("--format", choices=["json", "text", "pretty"],
                    default="json")
    pp.add_argument("--model-input", action="store_true",
                    help="run detection AND recognition through the model "
                         "boundaries (session tensors + real DB postprocess)")
    pp.add_argument("--visualize", metavar="OUT_PNG",
                    help="also write a side-by-side visualization PNG")
    st = sub.add_parser(
        "structure",
        help="PP-StructureV3 page parse of one PNG (OARStructure::predict_image)")
    st.add_argument("image")
    st.add_argument("--format", choices=["json", "markdown", "html"],
                    default="markdown")
    st.add_argument("--visualize", metavar="OUT_PNG",
                    help="write a layout visualization PNG (element-class shades)")
    ps = sub.add_parser("serve", help="HTTP server: POST /ocr with PNG body")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8765)
    args = p.parse_args(argv)

    if args.cmd == "predict":
        with open(args.image, "rb") as f:
            data = f.read()
        img = decode_png(data)
        result = predict_image(data, decoded=img, model_input=args.model_input)
        if args.visualize:
            from oar_ocr_ray.visualization import visualize_ocr_png

            with open(args.visualize, "wb") as f:
                f.write(visualize_ocr_png(data, result, decoded=img))
        print(format_result(result, args.format))
        return 0
    if args.cmd == "structure":
        from oar_ocr_ray.stages.structure_stage import predict_structure_page
        from oar_ocr_ray.stubs import classify_orientation, correct_orientation

        with open(args.image, "rb") as f:
            img = decode_png(f.read())
        img = img if img.ndim == 2 else img[:, :, 0]
        res = predict_structure_page(img, return_elements=True)
        if args.visualize:
            from oar_ocr_ray.png_codec import encode_png
            from oar_ocr_ray.visualization import create_structure_visualization

            up = correct_orientation(img, classify_orientation(img))
            els = [{"box": e["bbox"], "type": e["label"]}
                   for e in res["elements"]]
            with open(args.visualize, "wb") as f:
                f.write(encode_png(create_structure_visualization(up, els)))
        if args.format == "markdown":
            print(res["markdown"])
        elif args.format == "html":
            print(res["html"])
        else:
            print(json.dumps({k: v for k, v in res.items() if k != "html"}))
        return 0
    serve(args.host, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
