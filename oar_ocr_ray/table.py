"""Table-structure operators: token grid parsing, HTML rendering, OCR/formula
-> cell assignment.

Pure per-table functions (used inside `map_batches` over table rows)
reimplementing the semantics of:
  - /root/reference/src/processors/table_structure_decode.rs:37-390
    (wrap_table_html / wrap_table_html_with_content / parse_cell_grid_info:
    structure tokens -> HTML and (row, col, rowspan, colspan) grid, with
    colspan/rowspan occupancy tracking);
  - /root/reference/src/oarocr/stitching.rs:319-357 (OCR -> cell greedy
    min-cost assignment, cost = (1 - IoU, L1 center distance));
  - /root/reference/src/oarocr/stitching.rs:421-482 (formula -> cell attach
    by max IoU above threshold, appended as $latex$).
"""

from __future__ import annotations

import re

import numpy as np

from .geometry import iou_matrix

_SPAN_RE = re.compile(r'(colspan|rowspan)\s*=\s*"?(\d+)"?')


def _td_attrs(tokens: list[str], idx: int) -> tuple[str, int, int, int]:
    """Parse a <td...> opening at tokens[idx]; supports the single-token form
    '<td colspan="2"></td>' and the split form '<td', ' colspan="2"', '>'
    (optionally followed by '</td>'). Returns (attrs, colspan, rowspan,
    next_index past the cell)."""
    tok = tokens[idx]
    if tok.endswith("</td>"):  # single token cell
        inner = tok[len("<td"):tok.index(">")]
        spans = dict((m.group(1), int(m.group(2))) for m in _SPAN_RE.finditer(inner))
        return inner, spans.get("colspan", 1), spans.get("rowspan", 1), idx + 1
    # split form: accumulate until '>'
    attrs = tok[len("<td"):]
    j = idx + 1
    while j < len(tokens) and ">" not in tokens[j - 1] and tokens[j] != ">":
        if tokens[j].startswith("</td"):
            break
        attrs += tokens[j]
        j += 1
    if j < len(tokens) and tokens[j] == ">":
        j += 1
    if j < len(tokens) and tokens[j] == "</td>":
        j += 1
    spans = dict((m.group(1), int(m.group(2))) for m in _SPAN_RE.finditer(attrs))
    return attrs.rstrip(">"), spans.get("colspan", 1), spans.get("rowspan", 1), j


def parse_cell_grid_info(tokens: list[str]) -> list[dict]:
    """Structure tokens -> one {row, col, row_span, col_span} per <td>, in
    order of appearance, with rowspan occupancy tracked across rows."""
    cells: list[dict] = []
    row = col = 0
    occupied: set[tuple[int, int]] = set()
    idx = 0
    while idx < len(tokens):
        tok = tokens[idx]
        if tok == "<tr>":
            col = 0
            while (row, col) in occupied:
                col += 1
            idx += 1
            continue
        if tok == "</tr>":
            row += 1
            idx += 1
            continue
        if tok == "<td></td>":
            while (row, col) in occupied:
                col += 1
            cells.append({"row": row, "col": col, "row_span": 1, "col_span": 1})
            col += 1
            while (row, col) in occupied:
                col += 1
            idx += 1
            continue
        if tok.startswith("<td"):
            _attrs, cspan, rspan, nxt = _td_attrs(tokens, idx)
            while (row, col) in occupied:
                col += 1
            cells.append({"row": row, "col": col, "row_span": rspan, "col_span": cspan})
            for r in range(row, row + rspan):
                for c in range(col, col + cspan):
                    occupied.add((r, c))
            col += cspan
            while (row, col) in occupied:
                col += 1
            idx = nxt
            continue
        idx += 1
    return cells


def render_table_html(tokens: list[str], cell_texts: list[str | None] | None = None) -> str:
    """Tokens -> '<html><body><table>...</table></body></html>' with cell
    texts filled by td order (wrap_table_html[_with_content] semantics)."""
    out: list[str] = ["<html><body>"]
    has_table = bool(tokens) and "<table" in tokens[0]
    if not has_table:
        out.append("<table>")
    td_index = 0
    idx = 0
    while idx < len(tokens):
        tok = tokens[idx]
        if tok == "<td></td>":
            out.append("<td>")
            if cell_texts and td_index < len(cell_texts) and cell_texts[td_index]:
                out.append(cell_texts[td_index])
            out.append("</td>")
            td_index += 1
            idx += 1
            continue
        if tok.startswith("<td"):
            attrs, _c, _r, nxt = _td_attrs(tokens, idx)
            out.append(f"<td{attrs}>")
            if cell_texts and td_index < len(cell_texts) and cell_texts[td_index]:
                out.append(cell_texts[td_index])
            out.append("</td>")
            td_index += 1
            idx = nxt
            continue
        out.append(tok)
        idx += 1
    if not has_table:
        out.append("</table>")
    out.append("</body></html>")
    return "".join(out)


def assign_ocr_to_cells(ocr_boxes: np.ndarray, cell_boxes: np.ndarray) -> np.ndarray:
    """Per OCR box: best cell index by min cost (1 - IoU, L1 center
    distance); -1 when no cell has IoU > 0 (stitching.rs:319-357)."""
    a = np.atleast_2d(np.asarray(ocr_boxes, dtype=np.float64)).reshape(-1, 4)
    b = np.atleast_2d(np.asarray(cell_boxes, dtype=np.float64)).reshape(-1, 4)
    if len(a) == 0 or len(b) == 0:
        return np.full(len(a), -1, dtype=np.int64)
    iou = iou_matrix(a, b)
    ca = np.stack([(a[:, 0] + a[:, 2]) / 2, (a[:, 1] + a[:, 3]) / 2], axis=1)
    cb = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2], axis=1)
    dist = np.abs(ca[:, None, :] - cb[None, :, :]).sum(axis=2)
    out = np.full(len(a), -1, dtype=np.int64)
    for i in range(len(a)):
        cand = np.flatnonzero(iou[i] > 0)
        if len(cand) == 0:
            continue
        costs = sorted(((1.0 - iou[i, j], dist[i, j], j) for j in cand))
        out[i] = costs[0][2]
    return out


def attach_formulas_to_cells(
    formula_boxes: np.ndarray,
    latex: list[str],
    cell_boxes: np.ndarray,
    cell_texts: list[str],
    min_iou: float = 0.01,
) -> list[str]:
    """Append each formula's $latex$ to its max-IoU cell (above min_iou);
    degenerate boxes (w or h <= 1) skipped. Returns updated cell texts."""
    fb = np.atleast_2d(np.asarray(formula_boxes, dtype=np.float64)).reshape(-1, 4)
    cb = np.atleast_2d(np.asarray(cell_boxes, dtype=np.float64)).reshape(-1, 4)
    texts = list(cell_texts)
    if len(fb) == 0 or len(cb) == 0:
        return texts
    iou = iou_matrix(fb, cb)
    for i in range(len(fb)):
        if fb[i, 2] - fb[i, 0] <= 1.0 or fb[i, 3] - fb[i, 1] <= 1.0:
            continue
        j = int(iou[i].argmax())
        if iou[i, j] > min_iou:
            tex = latex[i]
            formatted = tex if tex.startswith("$") and tex.endswith("$") else f"${tex}$"
            texts[j] = f"{texts[j]} {formatted}".strip() if texts[j] else formatted
    return texts
