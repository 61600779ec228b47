"""Skew robustness: a few 'whale' documents carry two orders of magnitude
more media spans than the median doc (the north-star's media-heavy-document
skew case). The pipeline must stay correct — whale span sequences rebuild
exactly through the fan-out and the single shuffle — with no per-doc size
assumption anywhere."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oar_ocr_ray.fixtures import (
    DEFAULT_MEDIA_BUCKETS,
    DOCUMENTS_SCHEMA,
    MEDIA_SCHEMA,
    OUTPUT_SCHEMA,
    _gen_image,
    golden_extract,
    media_bucket,
)
from oar_ocr_ray.pipelines.extract import build_extract_pipeline

from test_extract_e2e import assert_matches_golden

N_WHALES = 3
WHALE_MEDIA = 40  # vs 0-1 for the other docs
N_DOCS = 120


def build_skewed_corpus(out_dir: str):
    rng = np.random.default_rng(123)
    doc_dir, media_dir = os.path.join(out_dir, "documents"), os.path.join(out_dir, "media")
    os.makedirs(doc_dir), os.makedirs(media_dir)
    docs, media, golden = [], [], []
    for i in range(N_DOCS):
        doc_id = f"doc-{i:08d}"
        spans, m_rows, k = [], [], 0
        n_media = WHALE_MEDIA if i < N_WHALES else int(rng.random() < 0.3)
        spans.append({"kind": "text", "text": f"lead text {i}", "media_ref": "",
                      "offset": k})
        k += 1
        for _ in range(n_media):
            ref = f"media://{doc_id}/{k}"
            png, w, h, rot, boxes = _gen_image(rng)
            m_rows.append({
                "media_ref": ref, "width": w, "height": h, "rot": rot, "png": png,
                "boxes": [{"x0": b[0], "y0": b[1], "x1": b[2], "y1": b[3],
                           "text": b[4]} for b in boxes],
            })
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": k})
            k += 1
        perm = rng.permutation(len(spans))  # stored order is shuffled
        row = {"doc_id": doc_id, "spans": [spans[j] for j in perm]}
        docs.append(row)
        media.extend(m_rows)
        golden.append(golden_extract(row, {r["media_ref"]: r for r in m_rows}))

    files = []
    for f in range(0, N_DOCS, 30):
        p = os.path.join(doc_dir, f"part-{f // 30:05d}.parquet")
        pq.write_table(pa.Table.from_pylist(docs[f:f + 30], schema=DOCUMENTS_SCHEMA), p)
        files.append(p)
    buckets: dict[int, list] = {}
    for r in media:
        buckets.setdefault(media_bucket(r["media_ref"]), []).append(r)
    for b in range(DEFAULT_MEDIA_BUCKETS):
        pq.write_table(pa.Table.from_pylist(buckets.get(b, []), schema=MEDIA_SCHEMA),
                       os.path.join(media_dir, f"bucket-{b:03d}.parquet"))
    gp = os.path.join(out_dir, "golden.parquet")
    pq.write_table(pa.Table.from_pylist(golden, schema=OUTPUT_SCHEMA), gp)
    return files, media_dir, gp


@pytest.mark.usefixtures("ray_session")
def test_whale_docs_match_golden(tmp_path):
    import ray

    files, media_dir, golden_path = build_skewed_corpus(str(tmp_path / "skew"))
    ds = build_extract_pipeline(files, media_dir, n_parts=8)
    table = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
    assert_matches_golden(table, golden_path, N_DOCS)
