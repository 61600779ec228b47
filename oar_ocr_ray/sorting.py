"""Reading-order heuristics.

Reimplements the ordering semantics of
/root/reference/src/processors/sorting.rs:
  - sort_quad_boxes (35-84): lexicographic (y_min, x_min) sort + a bubble
    pass swapping adjacent boxes when |Δy| < 10 px and x order is inverted
    — top-left raster order with a same-line tolerance. This IS the order
    that defines the media-derived span sequence (the north-rule `order`).
  - sort_poly_boxes (100-118): stable sort by y_min only.
  - sort_by_xycut (161-493): recursive projection-profile XY-cut (Y-first),
    histogram projection + gap splitting.

All functions take AABBs as (N,4) float arrays [x0,y0,x1,y1] and return
index arrays into the input (the reference returns reordered boxes; indices
compose better with Arrow takes).
"""

from __future__ import annotations

import numpy as np

SAME_LINE_Y_TOLERANCE = 10.0  # px, sorting.rs:69 / stitching.rs cfg


def sort_quad_boxes_indices(boxes: np.ndarray, y_tol: float = SAME_LINE_Y_TOLERANCE) -> np.ndarray:
    """Raster reading order over AABBs; returns argsort indices.

    Mirrors sorting.rs:35-84: primary stable sort by (y_min, x_min), then the
    exact bubble pass: for i in 0..n-1, walk j from i down, swapping when the
    two adjacent boxes are within y_tol vertically and out of x order,
    stopping at the first non-swap.
    """
    b = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
    n = len(b)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    order = np.lexsort((b[:, 0], b[:, 1]))  # by y_min then x_min
    idx = list(order)
    ys = b[:, 1]
    xs = b[:, 0]
    for i in range(n - 1):
        for j in range(i, -1, -1):
            if j + 1 >= n:
                break
            cy, ny = ys[idx[j]], ys[idx[j + 1]]
            cx, nx = xs[idx[j]], xs[idx[j + 1]]
            if abs(ny - cy) < y_tol and nx < cx:
                idx[j], idx[j + 1] = idx[j + 1], idx[j]
            else:
                break
    return np.asarray(idx, dtype=np.int64)


def sort_poly_boxes_indices(boxes: np.ndarray) -> np.ndarray:
    """Stable sort by y_min (sorting.rs:100-118, seal-text ordering)."""
    b = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.argsort(b[:, 1], kind="stable").astype(np.int64)


# ---------------------------------------------------------------------------
# XY-cut (sorting.rs:161-493)
# ---------------------------------------------------------------------------

def projection_by_bboxes(boxes: np.ndarray, axis: int) -> np.ndarray:
    """1D occupancy histogram of int boxes along axis (0=x, 1=y).

    sorting.rs:projection_by_bboxes — length = max(end coord)+1; each box
    increments [start, end) (end exclusive).
    """
    assert axis in (0, 1)
    b = np.atleast_2d(np.asarray(boxes, dtype=np.int64))
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    start = np.abs(b[:, axis])
    end = np.abs(b[:, axis + 2])
    start, end = np.minimum(start, end), np.maximum(start, end)
    max_len = int(end.max())
    if max_len == 0:
        return np.zeros(0, dtype=np.int64)
    proj = np.zeros(max_len + 2, dtype=np.int64)
    np.add.at(proj, start, 1)
    np.add.at(proj, np.minimum(end, max_len + 1), -1)
    return np.cumsum(proj)[: max_len + 1]


def split_projection_profile(profile: np.ndarray, min_value: int, min_gap: int):
    """Split profile into segments separated by gaps > min_gap.

    Returns (starts, ends) arrays (ends exclusive) or None when nothing
    exceeds min_value (sorting.rs:split_projection_profile).
    """
    sig = np.flatnonzero(np.asarray(profile) > min_value)
    if len(sig) == 0:
        return None
    gaps = np.diff(sig)
    cut = np.flatnonzero(gaps > min_gap)
    starts = np.concatenate([[sig[0]], sig[cut + 1]])
    ends = np.concatenate([sig[cut] + 1, [sig[-1] + 1]])
    return starts, ends


def sort_by_xycut(boxes: np.ndarray, direction: str = "vertical", min_gap: int = 1) -> np.ndarray:
    """Recursive XY-cut reading order; returns indices into `boxes`.

    direction="vertical" = Y-first (YX-cut, the reference default for
    top-to-bottom pages); "horizontal" = X-first.
    """
    b = np.atleast_2d(np.asarray(boxes, dtype=np.float64)).astype(np.int64)
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    result: list[int] = []
    indices = np.arange(len(b))
    if direction == "vertical":
        _recursive_cut(b, indices, result, min_gap, y_first=True)
    else:
        _recursive_cut(b, indices, result, min_gap, y_first=False)
    return np.asarray(result, dtype=np.int64)


def _recursive_cut(boxes: np.ndarray, indices: np.ndarray, result: list[int],
                   min_gap: int, y_first: bool) -> None:
    if len(boxes) == 0:
        return
    a1 = 1 if y_first else 0  # first projection axis
    a2 = 0 if y_first else 1
    order1 = np.argsort(boxes[:, a1], kind="stable")
    b1 = boxes[order1]
    i1 = indices[order1]
    proj1 = projection_by_bboxes(b1, a1)
    split1 = split_projection_profile(proj1, 0, 1)
    if split1 is None:
        return
    starts1, ends1 = split1
    for s1, e1 in zip(starts1, ends1):
        in1 = (np.abs(b1[:, a1]) >= s1) & (np.abs(b1[:, a1]) < e1)
        if not in1.any():
            continue
        chunk_b = b1[in1]
        chunk_i = i1[in1]
        order2 = np.argsort(chunk_b[:, a2], kind="stable")
        b2 = chunk_b[order2]
        i2 = chunk_i[order2]
        proj2 = projection_by_bboxes(b2, a2)
        split2 = split_projection_profile(proj2, 0, min_gap)
        if split2 is None:
            continue
        starts2, ends2 = split2
        if len(starts2) == 1:
            result.extend(int(x) for x in i2)
            continue
        for s2, e2 in zip(starts2, ends2):
            in2 = (np.abs(b2[:, a2]) >= s2) & (np.abs(b2[:, a2]) < e2)
            if not in2.any():
                continue
            _recursive_cut(b2[in2], i2[in2], result, min_gap, y_first)
