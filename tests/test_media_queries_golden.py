"""Golden verification for the two media-path queries that have no SQL
oracle (ocr_word_boxes, crop_aspect_buckets): their outputs are checked
against the interleaved corpus's media GROUND TRUTH — the same truth the
flagship golden uses — so 'rows-only' here still means verified, not just
'ran'."""

import importlib.util
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from oar_ocr_ray.sorting import sort_quad_boxes_indices

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_meta():
    spec = importlib.util.spec_from_file_location(
        "_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._interleaved_corpus(SF)


def media_truth(meta):
    """{media_ref: [box rows sorted in raster reading order]}"""
    rows = {}
    for f in sorted(os.listdir(meta["media_dir"])):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(meta["media_dir"], f))
        for r in t.to_pylist():
            bs = r["boxes"]
            if not bs:
                rows[r["media_ref"]] = []
                continue
            arr = np.array([[b["x0"], b["y0"], b["x1"], b["y1"]] for b in bs],
                           dtype=float)
            order = sort_quad_boxes_indices(arr)
            rows[r["media_ref"]] = [bs[int(j)] for j in order]
    return rows


@pytest.mark.usefixtures("ray_session")
def test_crop_aspect_buckets_matches_truth_histogram(corpus_meta):
    from oar_ocr_ray.queries import crop_aspect_buckets

    truth = media_truth(corpus_meta)
    edges = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    ratios = []
    for bs in truth.values():
        for b in bs:
            w, h = b["x1"] - b["x0"], max(b["y1"] - b["y0"], 1e-9)
            ratios.append(w / h)
    expect = pd.Series(np.digitize(ratios, edges)).value_counts().sort_index()

    got = crop_aspect_buckets(SF).set_index("bucket")["n"]
    assert got.to_dict() == {int(k): int(v) for k, v in expect.items()}


@pytest.mark.usefixtures("ray_session")
def test_ocr_word_boxes_match_truth(corpus_meta):
    from oar_ocr_ray.queries import ocr_word_boxes

    truth = media_truth(corpus_meta)
    out = ocr_word_boxes(SF).to_pandas()
    assert len(out) > 0
    # every truth line appears exactly once with the right det_idx
    n_truth = sum(len(bs) for bs in truth.values())
    assert len(out) == n_truth
    for (ref, det_idx, text, n_chars, wb) in out.itertuples(index=False):
        tb = truth[ref][det_idx]
        assert text == tb["text"], (ref, det_idx)
        assert n_chars == len(text)
        assert len(wb) == len(text)
        lx0, ly0, lx1, ly1 = tb["x0"], tb["y0"], tb["x1"], tb["y1"]
        xs = [b[0] for b in wb]
        assert xs == sorted(xs)  # char boxes advance left-to-right
        for b in wb:
            assert lx0 - 1e-6 <= b[0] <= b[2] <= lx1 + 1e-6
            assert ly0 - 1e-6 <= b[1] <= b[3] <= ly1 + 1e-6
