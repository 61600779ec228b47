"""Sharded, resumable structure-extraction runner — the PP-StructureV3
page pipeline's analogue of pipelines/extract.run_extract (north rule:
per-partition lineage + metrics, killed runs resume from the last
committed partition).

Shards key on MEDIA BUCKETS (the corpus's one partition key): shard i
owns a fixed group of bucket ids, its refs are filtered by
crc32(media_ref) % n_buckets, and its tasks therefore touch only its own
bucket files (the bucket-locality property the bench relies on). Commit
protocol mirrors the flagship: tmp dir -> atomic rename -> fsync'd
manifest line carrying inputs, page/element counts and wall time.
"""

from __future__ import annotations

import os
import shutil
import time

import ray


def build_structure_pipeline(
    refs_path: str | list[str],
    media_dir: str,
    *,
    buckets: list[int] | None = None,
    n_buckets: int = 16,
    n_blocks: int | None = None,
    min_line_area: int = 9,
    rec_model_input: bool = False,
    det_model_input: bool = False,
    layout_model_input: bool = False,
    aux_model_input: bool = False,
    formula_model_input: bool = False,
) -> "ray.data.Dataset":
    """Lazy per-page structure DAG: refs (optionally filtered to a bucket
    group) -> actor-pool StructureExtract. Blocks default to the bucket
    count so tasks stay bucket-local (see BASELINE.md round 3)."""
    import pyarrow.dataset as pads
    import ray.data

    from ..stages.media import cached_stage
    from ..stages.structure_stage import StructureExtract

    blocks = n_blocks if n_blocks else (len(buckets) if buckets else n_buckets)
    flt = None
    if buckets is not None:
        # the manifest persists the bucket id as a column (bucket-sorted),
        # so a bucket-group shard is a parquet predicate pushdown — whole
        # row groups are skipped at the read; no Python runs per row
        schema = pads.dataset(refs_path, format="parquet").schema
        if "bucket" not in schema.names:
            raise ValueError(
                "bucket-group filtering needs the refs manifest's persisted "
                "`bucket` column (written by write_structure_corpus); "
                "regenerate the manifest — per-row bucket hashing in the "
                "read path is deliberately unsupported")
        persisted = (schema.metadata or {}).get(b"n_buckets")
        if persisted is not None and int(persisted) != n_buckets:
            raise ValueError(
                f"bucket-count mismatch: the refs manifest was written with "
                f"n_buckets={int(persisted)} but this run filters with "
                f"n_buckets={n_buckets} — pages in persisted buckets outside "
                f"range({n_buckets}) would be SILENTLY dropped while every "
                f"shard commits; re-run with n_buckets={int(persisted)}")
        flt = pads.field("bucket").isin(sorted(set(buckets)))
    ds = ray.data.read_parquet(
        refs_path, columns=["media_ref"], override_num_blocks=blocks,
        filter=flt,
    )
    return ds.map_batches(
        cached_stage(StructureExtract, media_dir=media_dir,
                     min_line_area=min_line_area,
                     rec_model_input=rec_model_input,
                     det_model_input=det_model_input,
                     layout_model_input=layout_model_input,
                     aux_model_input=aux_model_input,
                     formula_model_input=formula_model_input),
        batch_format="pyarrow", batch_size=None,
    )


def run_structure_extract(
    refs_path: str | list[str],
    media_dir: str,
    out_dir: str,
    *,
    n_shards: int = 4,
    n_buckets: int = 16,
    max_shards: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Sharded, resumable run over bucket groups; re-running skips
    committed shards, `max_shards` limits work per invocation (the
    kill/resume test hook, same contract as run_extract)."""
    from ..state.checkpoint import ShardManifest

    os.makedirs(out_dir, exist_ok=True)
    manifest = ShardManifest(out_dir)
    done = manifest.completed()

    n_shards = min(n_shards, n_buckets)
    groups = [list(range(n_buckets))[i::n_shards] for i in range(n_shards)]
    for sid, rec in done.items():
        if sid >= len(groups) or rec.get("buckets") != groups[sid]:
            raise RuntimeError(
                f"resume mismatch: committed shard {sid} covered buckets "
                f"{rec.get('buckets')} but this run computes "
                f"{groups[sid] if sid < len(groups) else None}; re-run with "
                "the original --shards/--buckets or use a fresh --out"
            )

    processed = 0
    t_start = time.perf_counter()
    for sid, buckets in enumerate(groups):
        if sid in done or not buckets:
            continue
        if max_shards is not None and processed >= max_shards:
            break
        t0 = time.perf_counter()
        ds = build_structure_pipeline(
            refs_path, media_dir, buckets=buckets, n_buckets=n_buckets,
            **pipeline_kwargs,
        )
        final = os.path.join(out_dir, f"shard-{sid:05d}")
        tmp = os.path.join(out_dir, f".tmp-shard-{sid:05d}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        n_pages = 0
        n_elements = 0
        for f in os.listdir(final):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(final, f)
            n_pages += pq.read_metadata(path).num_rows
            col = pq.read_table(path, columns=["n_elements"])["n_elements"]
            n_elements += int(pc.sum(col).as_py() or 0)
        manifest.commit(sid, {
            "buckets": buckets,
            "output": final,
            "pages": n_pages,
            "elements": n_elements,
            "wall_sec": round(time.perf_counter() - t0, 3),
        })
        processed += 1
    return {
        "out_dir": out_dir,
        "shards_total": n_shards,
        "shards_done": len(manifest.completed()),
        "shards_processed_now": processed,
        "wall_sec": time.perf_counter() - t_start,
    }


def read_structure_output(out_dir: str):
    """All committed shard outputs as one pyarrow Table (test helper)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.checkpoint import ShardManifest

    tables = []
    for rec in ShardManifest(out_dir).completed().values():
        d = rec["output"]
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(d, f)))
    return pa.concat_tables(tables) if tables else None
