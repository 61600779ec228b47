"""Document-table reader with the Lance substitution seam.

BASELINE.json's input hint names LANCE tables of interleaved documents;
the `lance` package is absent in this container, so the corpus is stored
as the SAME schema in parquet (BASELINE.md "Environment substitution").
This module makes that substitution an explicit, tested SEAM instead of
a scattered `read_parquet` call: every pipeline reads the documents
table through `read_documents`, which dispatches on the source format —

  - `.lance` source + `lance` importable  -> `ray.data.read_lance`
    (streaming fragment reads, column projection pushed down);
  - `.lance` source, package absent       -> loud NotImplementedError
    naming the `lance_reader=` injection point (never a silent parquet
    fallback on a mis-typed path);
  - anything else                         -> `ray.data.read_parquet`
    with the same column pruning / block override.

`lance_reader=` injects any `ray.data.read_lance`-shaped callable —
a production build passes the real reader; tests pass a double to prove
column pruning and block overrides survive the dispatch unchanged.
"""

from __future__ import annotations


def is_lance_source(source) -> bool:
    """A source is Lance iff its (first) path ends in `.lance` — the
    dataset-directory convention `lance.write_dataset` produces."""
    if isinstance(source, (list, tuple)):
        if not source:
            return False
        return all(is_lance_source(s) for s in source)
    return str(source).rstrip("/").endswith(".lance")


def read_documents(source, *, columns=None, override_num_blocks=None,
                   lance_reader=None):
    """Read the documents table as a `ray.data.Dataset`, dispatching on
    the source format. Column projection (`columns`) and block sizing
    (`override_num_blocks`) pass through to either reader so the
    prune-at-the-read property holds regardless of storage format."""
    import ray.data

    if lance_reader is None and is_lance_source(source):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"{source!r} is a Lance dataset but the `lance` package is "
                f"not installed in this environment; install pylance or "
                f"inject a ray.data.read_lance-shaped callable via "
                f"lance_reader= (see oar_ocr_ray/sources/documents.py)."
            ) from e
        lance_reader = ray.data.read_lance
    if lance_reader is not None:
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = columns
        if override_num_blocks is not None:
            kwargs["override_num_blocks"] = override_num_blocks
        return lance_reader(source, **kwargs)
    return ray.data.read_parquet(
        source, columns=columns, override_num_blocks=override_num_blocks)
