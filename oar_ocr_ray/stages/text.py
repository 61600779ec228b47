"""Text-span path: vectorized boilerplate strip over mixed span batches.

The Ray-idiomatic analogue of the reference's text cleanup/join semantics
(/root/reference/src/oarocr/stitching.rs:603-697 normalization + trim;
empty-prediction filtering /root/reference/src/oarocr/structure.rs:2200).

Operates on mixed span-row batches: rows with kind=='text' get their text
stripped (Arrow-native RE2 kernel path, byte-identical to the per-string
golden implementation — tested); text rows that become empty are dropped;
all other rows pass through untouched. Stateless map_batches task.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def strip_text_spans(batch: pa.Table) -> pa.Table:
    is_text = pc.equal(batch["kind"], "text")
    if not pc.any(is_text).as_py():
        return batch
    from ..textproc import strip_boilerplate_arrow  # noqa: local to keep
    # the module import light for non-flagship users

    text_col = batch["text"].combine_chunks()
    # Arrow-native end to end (RE2 kernels, no pandas round-trip); media
    # spans carry "" so stripping the whole column then masking is cheaper
    # than a gather/scatter
    stripped = strip_boilerplate_arrow(text_col)
    new_text = pc.if_else(is_text.combine_chunks(), stripped, text_col)
    out = batch.set_column(batch.schema.get_field_index("text"), "text", new_text)
    # drop text spans that stripped to empty
    drop = pc.and_(pc.equal(out["kind"], "text"), pc.equal(out["text"], ""))
    return out.filter(pc.invert(drop))
