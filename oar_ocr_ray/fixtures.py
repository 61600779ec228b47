"""Deterministic synthetic corpus generator + pure-python golden oracle.

Implements FIXTURES.md F1/F2/F4: an interleaved text+media `documents` table
(the BASELINE.json `input_hint` schema), a `media` store of rendered page
images (our own PNG codec — no imaging libs in this environment), and the
golden expected span sequences computed by a single-process oracle that uses
generation ground truth only (never the pipeline under test).

The reference precedent for testing with deterministic stand-ins instead of
real model weights is its mock-adapter pattern
(/root/reference/src/oarocr/preprocess.rs:157-262).

Image encoding contract (consumed by oar_ocr_ray.stubs):
  - white page (255), text lines are solid dark rectangles (fill value 90);
  - row y0+1 of each rectangle encodes the line text as pixel values:
    [len][ord(char)...] (ASCII 32..126, all < 128 so the rect stays one
    dark connected component);
  - 10% of images are stored rotated by class*90° CW (class in {1,2,3});
    pixel [0,0] carries the orientation tag: value 10 + class*20;
  - ground-truth `boxes` are in UNROTATED (upright) coordinates.

Everything is seeded per-document: rng(seed, doc_index), so output is
byte-stable regardless of file partitioning.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .png_codec import encode_png
from .sorting import sort_quad_boxes_indices
from .textproc import strip_boilerplate

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCUMENTS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

OUT_SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)
OUTPUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(OUT_SPAN_STRUCT))])

BOX_STRUCT = pa.struct(
    [
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("text", pa.string()),
    ]
)
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("rot", pa.int32()),
        ("png", pa.binary()),
        ("boxes", pa.list_(BOX_STRUCT)),
    ]
)

FILL_VALUE = 90
TAG_BASE = 10
TAG_STEP = 20
DEFAULT_MEDIA_BUCKETS = 16

_WORDS = (
    "the quick brown fox jumps over lazy dog data stream shard actor batch "
    "arrow block table span media layout page line text region detect crop "
    "decode order offset pipeline ray lance commit fragment schema column "
    "vector index merge sort group join filter scan write read study model"
).split()

_BOILER_CHOICES = [
    "Home | About | Contact",
    "Skip to content",
    "Menu",
    "Navigation",
    "Sign in | Register",
    "Subscribe to our newsletter",
    "Accept all cookies",
    "Cookie Policy",
    "Privacy Policy | Terms of Service",
    "All rights reserved.",
    "(c) placeholder",  # replaced below to include the © pattern
    "Back to top",
    "Advertisement",
]
_BOILER_CHOICES[10] = "© 2024 Example Corp"

_LINE_CHARS = np.array(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 -+/#."),
)


def media_bucket(ref: str, n_buckets: int = DEFAULT_MEDIA_BUCKETS) -> int:
    """Stable bucket id for a media_ref (crc32; python hash() is salted)."""
    return zlib.crc32(ref.encode()) % n_buckets


# ---------------------------------------------------------------------------
# Per-document generation
# ---------------------------------------------------------------------------

def _gen_text(rng: np.random.Generator) -> str:
    """A text span: sentences + injected boilerplate lines + messy whitespace."""
    n_sent = int(rng.integers(1, 5))
    lines = []
    for _ in range(n_sent):
        k = int(rng.integers(4, 12))
        words = rng.choice(_WORDS, size=k)
        sent = " ".join(words).capitalize() + "."
        if rng.random() < 0.2:  # messy internal whitespace
            sent = sent.replace(" ", "   ", 1)
        lines.append(sent)
    n_boiler = int(rng.integers(0, 3))
    for _ in range(n_boiler):
        pos = int(rng.integers(0, len(lines) + 1))
        lines.insert(pos, str(rng.choice(_BOILER_CHOICES)))
    if rng.random() < 0.3:
        lines.insert(int(rng.integers(0, len(lines) + 1)), "   ")
    return "\n".join(lines)


def _gen_line_text(rng: np.random.Generator) -> str:
    k = int(rng.integers(4, 24))
    s = "".join(rng.choice(_LINE_CHARS, size=k)).strip()
    return s if s else "x"


def _gen_image(rng: np.random.Generator):
    """Render one synthetic page. Returns (png_bytes, w, h, rot, boxes)
    where boxes = [(x0, y0, x1, y1, text), ...] in upright coords."""
    w = int(rng.integers(180, 320))
    h = int(rng.integers(140, 280))
    img = np.full((h, w), 255, dtype=np.uint8)
    n_lines = int(rng.integers(0, 9))
    boxes = []
    row_y = 12
    while len(boxes) < n_lines and row_y < h - 20:
        two = rng.random() < 0.25 and (n_lines - len(boxes)) >= 2
        slots = [(8, w // 2 - 10), (w // 2 + 4, w - 10)] if two else [(8, w - 10)]
        for x_lo, x_hi in slots:
            if len(boxes) >= n_lines:
                break
            text = _gen_line_text(rng)
            bw = max(len(text) + 4, 12)
            if x_lo + bw + 2 >= x_hi:
                text = text[: max(4, x_hi - x_lo - 8)]
                bw = max(len(text) + 4, 12)
                if x_lo + bw + 2 >= x_hi:
                    continue
            x0 = int(rng.integers(x_lo, x_hi - bw))
            bh = int(rng.integers(8, 15))
            y0 = row_y + int(rng.integers(-3, 4))
            if y0 + bh >= h - 4:
                continue
            img[y0:y0 + bh, x0:x0 + bw] = FILL_VALUE
            enc = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
            img[y0 + 1, x0] = len(enc)
            img[y0 + 1, x0 + 1:x0 + 1 + len(enc)] = enc
            boxes.append((x0, y0, x0 + bw, y0 + bh, text))
        row_y += 26
    rot = int(rng.choice([0, 1, 2, 3], p=[0.9, 0.04, 0.03, 0.03]))
    stored = np.rot90(img, k=-rot) if rot else img
    stored = stored.copy()
    stored[0, 0] = TAG_BASE + rot * TAG_STEP  # orientation tag pixel
    return encode_png(stored), w, h, rot, boxes


def gen_document(seed: int, i: int):
    """Generate one document. Returns (doc_row, media_rows).

    doc_row = {doc_id, spans=[{kind,text,media_ref,offset}...]} with list
    order randomized (pipelines must sort by offset, FIXTURES.md F1).
    media_rows = list of MEDIA_SCHEMA dicts for this doc's image spans.
    """
    rng = np.random.default_rng([seed, i])
    doc_id = f"doc-{i:08d}"
    heavy = rng.random() < 0.02
    if heavy:
        n_spans = int(rng.integers(64, 129))
        p_image = 0.8
    else:
        n_spans = int(rng.integers(1, 25))
        p_image = 0.25
    spans = []
    media_rows = []
    for k in range(n_spans):
        if rng.random() < p_image:
            ref = f"media://{doc_id}/{k}"
            png, w, h, rot, boxes = _gen_image(rng)
            media_rows.append(
                {
                    "media_ref": ref,
                    "width": w,
                    "height": h,
                    "rot": rot,
                    "png": png,
                    "boxes": [
                        {"x0": b[0], "y0": b[1], "x1": b[2], "y1": b[3], "text": b[4]}
                        for b in boxes
                    ],
                }
            )
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": k})
        else:
            spans.append(
                {"kind": "text", "text": _gen_text(rng), "media_ref": "", "offset": k}
            )
    perm = rng.permutation(n_spans)
    spans = [spans[j] for j in perm]
    return {"doc_id": doc_id, "spans": spans}, media_rows


# ---------------------------------------------------------------------------
# Golden oracle (FIXTURES.md F4)
# ---------------------------------------------------------------------------

def golden_extract(doc_row: dict, media_truth: dict[str, dict]) -> dict:
    """Expected output spans for one document, from ground truth only.

    - text spans: offset order, boilerplate stripped; empty-after-strip spans
      dropped (reference filter precedent structure.rs:2200);
    - image spans: expand to recognized lines in raster reading order
      (sort_quad_boxes over upright ground-truth boxes), media_ref kept;
    - global `order` = enumeration over (offset asc, det_idx asc).
    """
    out = []
    for span in sorted(doc_row["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "text":
            stripped = strip_boilerplate(span["text"])
            if stripped:
                out.append(("text", stripped, ""))
        else:
            truth = media_truth[span["media_ref"]]
            bs = truth["boxes"]
            if not bs:
                continue
            arr = np.array([[b["x0"], b["y0"], b["x1"], b["y1"]] for b in bs], dtype=float)
            for j in sort_quad_boxes_indices(arr):
                out.append(("image", bs[int(j)]["text"], span["media_ref"]))
    return {
        "doc_id": doc_row["doc_id"],
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "order": i}
            for i, (k, t, m) in enumerate(out)
        ],
    }


# ---------------------------------------------------------------------------
# Corpus writer
# ---------------------------------------------------------------------------

def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    n_doc_files: int = 8,
    n_media_buckets: int = DEFAULT_MEDIA_BUCKETS,
    with_golden: bool = True,
) -> dict:
    """Write documents/ (n_doc_files parquet), media/ (hash-bucketed parquet)
    and optionally golden/ under out_dir. Returns path metadata."""
    doc_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media")
    os.makedirs(doc_dir, exist_ok=True)
    os.makedirs(media_dir, exist_ok=True)

    docs = []
    media = []
    golden = []
    for i in range(n_docs):
        row, m = gen_document(seed, i)
        docs.append(row)
        media.extend(m)
        if with_golden:
            truth = {r["media_ref"]: r for r in m}
            golden.append(golden_extract(row, truth))

    per = max(1, (n_docs + n_doc_files - 1) // n_doc_files)
    doc_files = []
    for f in range(0, n_docs, per):
        chunk = docs[f:f + per]
        path = os.path.join(doc_dir, f"part-{f // per:05d}.parquet")
        pq.write_table(pa.Table.from_pylist(chunk, schema=DOCUMENTS_SCHEMA), path)
        doc_files.append(path)

    buckets: dict[int, list] = {}
    for r in media:
        buckets.setdefault(media_bucket(r["media_ref"], n_media_buckets), []).append(r)
    for b in range(n_media_buckets):
        rows = buckets.get(b, [])
        path = os.path.join(media_dir, f"bucket-{b:03d}.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), path)

    meta = {
        "doc_dir": doc_dir,
        "media_dir": media_dir,
        "doc_files": doc_files,
        "n_docs": n_docs,
        "n_media": len(media),
        "n_media_buckets": n_media_buckets,
        "seed": seed,
    }
    if with_golden:
        golden_path = os.path.join(out_dir, "golden.parquet")
        pq.write_table(pa.Table.from_pylist(golden, schema=OUTPUT_SCHEMA), golden_path)
        meta["golden_path"] = golden_path
    return meta


# ---------------------------------------------------------------------------
# Interleaved corpus derived from a flat documents table (driver testdata)
# ---------------------------------------------------------------------------

def interleave_from_flat(
    flat_docs,
    out_dir: str,
    seed: int = 42,
    n_doc_files: int = 4,
    n_media_buckets: int = DEFAULT_MEDIA_BUCKETS,
) -> dict:
    """Derive an interleaved text+media `documents` table (input_hint schema)
    from the driver's flat documents table (doc_id:int64, text:string):
    each flat doc's text is split into 1-3 text spans, interleaved with 0-2
    deterministic synthetic media spans (seeded per doc). Used by entry()
    and the extract_interleaved query so the flagship runs over driver
    testdata without external data."""
    os.makedirs(out_dir, exist_ok=True)
    doc_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media")
    os.makedirs(doc_dir, exist_ok=True)
    os.makedirs(media_dir, exist_ok=True)

    flat = flat_docs.to_pylist() if isinstance(flat_docs, pa.Table) else flat_docs
    docs, media = [], []
    for row in flat:
        i = int(row["doc_id"])
        rng = np.random.default_rng([seed, i])
        doc_id = f"doc-{i:08d}"
        words = (row.get("text") or "").split()
        n_text = int(rng.integers(1, 4))
        chunks = [
            " ".join(words[j::n_text]) for j in range(n_text)
        ]  # deterministic round-robin split
        spans = []
        k = 0
        for c in chunks:
            spans.append({"kind": "text", "text": c, "media_ref": "", "offset": k})
            k += 1
            if rng.random() < 0.4:
                ref = f"media://{doc_id}/{k}"
                png, w, h, rot, boxes = _gen_image(rng)
                media.append(
                    {
                        "media_ref": ref, "width": w, "height": h, "rot": rot,
                        "png": png,
                        "boxes": [
                            {"x0": b[0], "y0": b[1], "x1": b[2], "y1": b[3], "text": b[4]}
                            for b in boxes
                        ],
                    }
                )
                spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": k})
                k += 1
        perm = rng.permutation(len(spans))
        docs.append({"doc_id": doc_id, "spans": [spans[j] for j in perm]})

    per = max(1, (len(docs) + n_doc_files - 1) // n_doc_files)
    doc_files = []
    for f in range(0, len(docs), per):
        path = os.path.join(doc_dir, f"part-{f // per:05d}.parquet")
        pq.write_table(
            pa.Table.from_pylist(docs[f:f + per], schema=DOCUMENTS_SCHEMA), path
        )
        doc_files.append(path)
    buckets: dict[int, list] = {}
    for r in media:
        buckets.setdefault(media_bucket(r["media_ref"], n_media_buckets), []).append(r)
    for b in range(n_media_buckets):
        pq.write_table(
            pa.Table.from_pylist(buckets.get(b, []), schema=MEDIA_SCHEMA),
            os.path.join(media_dir, f"bucket-{b:03d}.parquet"),
        )
    return {
        "doc_dir": doc_dir, "media_dir": media_dir, "doc_files": doc_files,
        "n_docs": len(docs), "n_media": len(media), "seed": seed,
    }
