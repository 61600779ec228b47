"""Property-based tests (hypothesis) for the correctness-critical kernels.

The north-rule invariant is exact sequence reconstruction through
explode/shuffle/reassemble — so the key properties are permutation
invariance and scalar/vectorized agreement.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from oar_ocr_ray.ctc import ctc_greedy_decode, encode_ctc_logits
from oar_ocr_ray.sorting import sort_quad_boxes_indices
from oar_ocr_ray.stages.reassemble import merge_partials, pack_partial, rebuild_partition
from oar_ocr_ray.textproc import strip_boilerplate, strip_boilerplate_series

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
)


@settings(max_examples=60, deadline=None)
@given(st.lists(printable, max_size=6).map("\n".join))
def test_strip_scalar_equals_vectorized(text):
    assert strip_boilerplate_series(pd.Series([text])).iloc[0] == strip_boilerplate(text)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
def test_ctc_encode_decode_roundtrip(s):
    text, conf, cols = ctc_greedy_decode(encode_ctc_logits(s))
    assert text == s
    assert len(cols) == len(s)


box_strategy = st.tuples(
    st.integers(0, 300), st.integers(0, 300), st.integers(1, 60), st.integers(1, 30)
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


@settings(max_examples=40, deadline=None)
@given(st.lists(box_strategy, min_size=0, max_size=12), st.randoms(use_true_random=False))
def test_sort_quad_boxes_permutation_invariant(boxes, rnd):
    """The raster order must not depend on input order (the detector emits
    boxes in arbitrary order, FIXTURES.md F3). Boxes sharing an exact
    (y_min, x_min) are excluded: the reference sorts on those two keys only
    (sorting.rs:43-56), so tie order is input-order-dependent there too —
    and physically impossible for disjoint detection boxes."""
    seen = set()
    uniq = []
    for bx in boxes:
        if (bx[0], bx[1]) not in seen:
            seen.add((bx[0], bx[1]))
            uniq.append(bx)
    b = np.array(uniq, dtype=float).reshape(-1, 4)
    perm = list(range(len(b)))
    rnd.shuffle(perm)
    shuffled = b[perm]
    a_sorted = [tuple(x) for x in b[sort_quad_boxes_indices(b)]]
    s_sorted = [tuple(x) for x in shuffled[sort_quad_boxes_indices(shuffled)]]
    assert a_sorted == s_sorted


def _span_rows_strategy():
    span = st.tuples(
        st.sampled_from(["text", "image"]),
        printable,
        st.integers(0, 3),  # det_idx
    )
    doc = st.tuples(st.integers(0, 5), st.lists(span, min_size=0, max_size=6))
    return st.lists(doc, min_size=1, max_size=6)


@settings(max_examples=40, deadline=None)
@given(_span_rows_strategy(), st.randoms(use_true_random=False))
def test_pack_merge_equals_direct_rebuild(docs, rnd):
    """Combiner path (pack per block -> merge) must equal the direct
    rebuild, for ANY split of rows into blocks and any row order."""
    rows = []
    for di, spans in docs:
        doc_id = f"doc-{di:04d}"
        part = di % 3
        rows.append((doc_id, -1, -1, "__doc__", "", "", part))  # anchor
        for off, (kind, text, det) in enumerate(spans):
            rows.append((doc_id, off, det, kind, text or "x", "", part))
    rnd.shuffle(rows)
    names = ["doc_id", "offset", "det_idx", "kind", "text", "media_ref", "part"]

    def tbl(rs):
        cols = list(zip(*rs)) if rs else [[] for _ in names]
        return pa.table(
            {
                "doc_id": pa.array(cols[0], pa.string()),
                "offset": pa.array(cols[1], pa.int32()),
                "det_idx": pa.array(cols[2], pa.int32()),
                "kind": pa.array(cols[3], pa.string()),
                "text": pa.array(cols[4], pa.string()),
                "media_ref": pa.array(cols[5], pa.string()),
                "part": pa.array(cols[6], pa.int32()),
            }
        )

    direct = rebuild_partition(tbl(rows)).to_pylist()

    cut = rnd.randrange(len(rows) + 1)
    blocks = [rows[:cut], rows[cut:]]
    packed = [pack_partial(tbl(b)) for b in blocks if True]
    merged = merge_partials(pa.concat_tables(packed)).to_pylist()

    key = lambda out: {r["doc_id"]: r["spans"] for r in out}
    assert key(direct) == key(merged)
