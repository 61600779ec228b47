"""Text-span path: vectorized boilerplate strip over mixed span batches.

The Ray-idiomatic analogue of the reference's text cleanup/join semantics
(/root/reference/src/oarocr/stitching.rs:603-697 normalization + trim;
empty-prediction filtering /root/reference/src/oarocr/structure.rs:2200).

Operates on mixed span-row batches: rows with kind=='text' get their text
stripped (pandas vectorized regex path, byte-identical to the per-string
golden implementation — tested); text rows that become empty are dropped;
all other rows pass through untouched. Stateless map_batches task.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..textproc import strip_boilerplate_series


def strip_text_spans(batch: pa.Table) -> pa.Table:
    is_text = pc.equal(batch["kind"], "text")
    if not pc.any(is_text).as_py():
        return batch
    import pandas as pd

    text_col = batch["text"].combine_chunks()
    mask = is_text.combine_chunks().to_numpy(zero_copy_only=False)
    s = pd.Series(text_col.to_pandas())
    stripped = strip_boilerplate_series(s[mask])
    s = s.copy()
    s[mask] = stripped
    new_text = pa.array(s, type=pa.string())
    out = batch.set_column(batch.schema.get_field_index("text"), "text", new_text)
    # drop text spans that stripped to empty
    drop = pc.and_(pc.equal(out["kind"], "text"), pc.equal(out["text"], ""))
    return out.filter(pc.invert(drop))
