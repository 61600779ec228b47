"""Document-structure operators: spatial joins, overlap dedup, stitching,
reading order, markdown export.

Per-page pure functions (numpy) reimplementing the reference's
structure-analysis semantics — used inside `map_batches`/`map_groups` over
page rows (SURVEY.md §2.4: these are within-document joins, never
distributed joins):

  - OCR box <-> layout block overlap match: intersection w AND h > 3 px,
    no ratio threshold (/root/reference/src/oarocr/structure.rs:1223-1242,
    stitching.rs:581-601);
  - overlap dedup: pairwise IoA-over-smaller > threshold; image loses to
    text, else smaller area loses (layout_utils.rs:618-840);
  - element -> region assignment: best IoA, threshold 0.1
    (structure.rs:1899-1958, sorting.rs:584-607);
  - orphan OCR text -> new Text elements unless IoA > 0.3 with a table
    (stitching.rs:132-201);
  - stitch: per-element smart join of matched OCR texts with the element
    bbox as container (stitching.rs:603-697), XY-cut reading order,
    order_index assignment;
  - title heading levels from numbering (structure.rs:17-95) and
    markdown export (structure.rs:227).
"""

from __future__ import annotations

import re

import numpy as np

from .geometry import box_area, intersection_area, ioa_matrix
from .sorting import sort_by_xycut
from .textproc import smart_join

_CJK_NUM = "一二三四五六七八九十百千万亿零壹贰叁肆伍陆柒捌玖拾"
TITLE_NUMBERING_REGEX = re.compile(
    r"^\s*("
    r"[1-9][0-9]*(?:\.[1-9][0-9]*)*[\.、]?"
    r"|[(（][1-9][0-9]*(?:\.[1-9][0-9]*)*[)）]"
    rf"|[{_CJK_NUM}][、.]?"
    rf"|[(（][{_CJK_NUM}]+[)）]"
    r"|(?:I|II|III|IV|V|VI|VII|VIII|IX|X)(?:\.|\b)"
    r")(\s+)(.*)$"
)


def format_title_with_level(title: str) -> tuple[int, str]:
    """Heading level from numbering prefix (structure.rs:46-95):
    '1 Intro' -> (1, ...), '1.2.3 X' -> (3, ...), no numbering -> level 2."""
    cleaned = title.replace("-\n", "").replace("\n", " ")
    m = TITLE_NUMBERING_REGEX.match(cleaned)
    if not m:
        return 2, cleaned
    numbering = m.group(1).strip()
    content = m.group(3) or ""
    level = numbering.count(".") + 1 if "." in numbering else 1
    level = min(max(level, 1), 6)
    num = numbering.rstrip(".")
    formatted = f"{num} {content.lstrip()}" if content else num
    return level, formatted


def overlap_match(ocr_boxes: np.ndarray, layout_boxes: np.ndarray, min_px: float = 3.0) -> np.ndarray:
    """(N_ocr, N_layout) bool: intersection width AND height > min_px
    (structure.rs:1223-1242 — no area-ratio threshold)."""
    a = np.atleast_2d(np.asarray(ocr_boxes, dtype=np.float64))
    b = np.atleast_2d(np.asarray(layout_boxes, dtype=np.float64))
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), dtype=bool)
    iw = np.minimum(a[:, None, 2], b[None, :, 2]) - np.maximum(a[:, None, 0], b[None, :, 0])
    ih = np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1])
    return (iw > min_px) & (ih > min_px)


def ioa_smaller(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection / min(area_a, area_b)."""
    inter = intersection_area(a, b)
    aa = box_area(np.atleast_2d(a))[:, None]
    ab = box_area(np.atleast_2d(b))[None, :]
    smaller = np.minimum(aa, ab)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(smaller > 0, inter / smaller, 0.0)


def remove_overlap_blocks(boxes: np.ndarray, labels: list[str], threshold: float = 0.5) -> np.ndarray:
    """Keep-mask after pairwise overlap dedup (layout_utils.rs:618-700):
    overlap ratio = IoA-over-smaller; when one of the pair is labeled
    'image' and the other is not, the image is dropped; otherwise the
    smaller-area box is dropped. Greedy in index order like the reference."""
    b = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
    n = len(b)
    keep = np.ones(n, dtype=bool)
    if n <= 1:
        return keep
    ratio = ioa_smaller(b, b)
    areas = box_area(b)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            if ratio[i, j] > threshold:
                i_img = labels[i] == "image"
                j_img = labels[j] == "image"
                if i_img != j_img:
                    drop = i if i_img else j
                else:
                    drop = i if areas[i] < areas[j] else j
                keep[drop] = False
                if drop == i:
                    break
    return keep


def assign_to_regions(elem_boxes: np.ndarray, region_boxes: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """Best-IoA region index per element, -1 when below threshold
    (structure.rs:1899-1958)."""
    a = np.atleast_2d(np.asarray(elem_boxes, dtype=np.float64))
    r = np.atleast_2d(np.asarray(region_boxes, dtype=np.float64))
    if len(a) == 0 or len(r) == 0:
        return np.full(len(a), -1, dtype=np.int64)
    ioa = ioa_matrix(a, r)
    best = ioa.argmax(axis=1)
    out = np.where(ioa[np.arange(len(a)), best] >= threshold, best, -1)
    return out.astype(np.int64)


def stitch_page(
    layout_boxes: np.ndarray,
    layout_labels: list[str],
    layout_scores: np.ndarray,
    ocr_boxes: np.ndarray,
    ocr_texts: list[str],
    *,
    overlap_threshold: float = 0.5,
    orphan_table_ioa: float = 0.3,
) -> list[dict]:
    """Full per-page stitch (ResultStitcher::stitch semantics):

    1. overlap-dedup layout elements;
    2. match OCR boxes to surviving elements (w/h > 3 px overlap);
    3. per element, smart-join its matched texts with the element bbox as
       container (same-line spacing + paragraph-break heuristic);
    4. unmatched OCR boxes become new Text elements unless inside a table
       (IoA > 0.3);
    5. XY-cut reading order over all elements, assign order_index.

    Returns elements as dicts (bbox, label, score, text, order_index),
    sorted by order_index.
    """
    lb = np.atleast_2d(np.asarray(layout_boxes, dtype=np.float64)).reshape(-1, 4)
    ob = np.atleast_2d(np.asarray(ocr_boxes, dtype=np.float64)).reshape(-1, 4)
    keep = remove_overlap_blocks(lb, list(layout_labels), overlap_threshold) if len(lb) else np.zeros(0, bool)
    lb = lb[keep]
    labels = [l for l, k in zip(layout_labels, keep) if k]
    scores = np.asarray(layout_scores, dtype=np.float64)[keep] if len(keep) else np.zeros(0)

    match = overlap_match(ob, lb)
    elements: list[dict] = []
    for j in range(len(lb)):
        idxs = np.flatnonzero(match[:, j])
        text = smart_join(
            [ocr_texts[i] for i in idxs], ob[idxs] if len(idxs) else np.zeros((0, 4)),
            container=tuple(lb[j]),
        ) if len(idxs) else ""
        elements.append(
            {"bbox": lb[j].tolist(), "label": labels[j], "score": float(scores[j]), "text": text}
        )

    # orphans -> new Text elements (stitching.rs:132-201)
    matched_any = match.any(axis=1) if match.size else np.zeros(len(ob), bool)
    table_boxes = lb[[i for i, l in enumerate(labels) if l == "table"]] if len(lb) else np.zeros((0, 4))
    for i in np.flatnonzero(~matched_any):
        if not ocr_texts[i]:
            continue
        if len(table_boxes) and ioa_matrix(ob[i:i + 1], table_boxes).max() > orphan_table_ioa:
            continue
        elements.append(
            {"bbox": ob[i].tolist(), "label": "text", "score": 0.0, "text": ocr_texts[i]}
        )

    if not elements:
        return []
    all_boxes = np.array([e["bbox"] for e in elements])
    order = list(sort_by_xycut(all_boxes, "vertical", 1))
    # XY-cut works on int-truncated boxes: an element thinner than 1px can
    # vanish from the projection profile (the reference's `as i32` cast has
    # the same hole). Never drop content — append any missing indices in
    # stable order.
    missing = [i for i in range(len(elements)) if i not in set(order)]
    order.extend(missing)
    ordered = []
    for rank, idx in enumerate(order):
        e = elements[int(idx)]
        e["order_index"] = rank
        ordered.append(e)
    return ordered


def page_to_markdown(elements: list[dict]) -> str:
    """Markdown export (structure.rs:227): titles get heading levels from
    their numbering; text elements are paragraphs; images placeholders."""
    parts = []
    for e in sorted(elements, key=lambda x: x.get("order_index", 0)):
        label = e.get("label", "text")
        text = e.get("text", "")
        if label in ("doc_title",):
            parts.append(f"# {text}")
        elif label in ("paragraph_title", "title"):
            level, formatted = format_title_with_level(text)
            parts.append(f"{'#' * level} {formatted}")
        elif label == "image":
            parts.append("![image]()")
        elif label == "table":
            parts.append(text if text.startswith("<") else f"<table>{text}</table>")
        elif text:
            parts.append(text)
    return "\n\n".join(p for p in parts if p)
