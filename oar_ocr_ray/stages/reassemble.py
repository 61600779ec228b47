"""Reassembly: span rows -> ordered per-document span lists.

The one all-to-all exchange of the pipeline: rows are grouped by the `part`
key (crc32(doc_id) % n_parts, assigned at explode time) and each partition is
rebuilt VECTORIZED in Arrow/numpy — sort by (doc_id, offset, det_idx), find
document boundaries, emit list<struct> spans with order = within-document
rank. Grouping on the coarse `part` key instead of doc_id means one Python
call per partition (not per document), and the same key could be reused by
any later stage.

This reconstructs the reference's ordering guarantees: detection order
restored by index scatter (/root/reference/src/oarocr/ocr.rs:728-808) and
per-page span sequence = reading order (/root/reference/src/oarocr/result.rs:147-163),
generalized to (offset, det_idx) across interleaved text+media spans —
the north-rule `order` key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures import OUT_SPAN_STRUCT
from .explode import ANCHOR_KIND


def rebuild_partition(table: pa.Table) -> pa.Table:
    """(span rows of one partition) -> (doc_id, spans) rows, vectorized."""
    if len(table) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.string()),
             "spans": pa.array([], pa.list_(OUT_SPAN_STRUCT))}
        )
    idx = pc.sort_indices(
        table,
        sort_keys=[("doc_id", "ascending"), ("offset", "ascending"), ("det_idx", "ascending")],
    )
    t = table.take(idx).combine_chunks()

    doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
    n = len(doc)
    starts = np.r_[0, np.flatnonzero(doc[1:] != doc[:-1]) + 1]
    counts = np.diff(np.r_[starts, n])

    kind_np = np.asarray(t["kind"].to_numpy(zero_copy_only=False))
    nonanchor = kind_np != ANCHOR_KIND
    c = np.cumsum(nonanchor)
    base = np.repeat(c[starts] - nonanchor[starts], counts)
    order_all = (c - base - 1).astype(np.int32)  # valid on nonanchor rows

    keep = np.flatnonzero(nonanchor)
    kept = t.take(pa.array(keep))
    span_struct = pa.StructArray.from_arrays(
        [
            kept["kind"].combine_chunks(),
            kept["text"].combine_chunks(),
            kept["media_ref"].combine_chunks(),
            pa.array(order_all[keep], type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "order"],
    )
    spans_per_doc = np.add.reduceat(nonanchor.astype(np.int64), starts) if n else np.zeros(0, np.int64)
    # reduceat quirk: a group whose slice is empty copies the next element — but
    # every group is non-empty here (each doc has at least its anchor row), and
    # reduceat over nonanchor counts anchors as 0, so values are correct.
    offsets = pa.array(np.r_[0, np.cumsum(spans_per_doc)], type=pa.int32())
    spans_list = pa.ListArray.from_arrays(offsets, span_struct)
    doc_ids = t["doc_id"].take(pa.array(starts))
    return pa.table({"doc_id": doc_ids, "spans": spans_list})
