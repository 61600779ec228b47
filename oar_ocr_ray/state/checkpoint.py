"""Per-shard commit manifest for resumable runs.

The reference has no checkpointing (first error aborts,
/root/reference/src/oarocr/ocr.rs:510-523 is the only fallback); at 10^12-doc
scale resumability is mandatory (north rule). Protocol:

  - input fragments are split into shards (at production scale: Lance
    fragment ranges; here: parquet file groups);
  - each shard's output is written to a temp dir then atomically renamed to
    its final name; the manifest line (shard id, inputs, row counts, wall
    time) is appended LAST, so a crash can never mark an incomplete shard
    as done (commit manifest last — SURVEY.md §7 hard parts);
  - resume = skip shard ids already present in the manifest.
"""

from __future__ import annotations

import json
import os
import time


MANIFEST_NAME = "_MANIFEST.jsonl"


class ShardManifest:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, MANIFEST_NAME)

    def completed(self) -> dict[int, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        done[rec["shard_id"]] = rec
        return done

    def commit(self, shard_id: int, record: dict) -> None:
        rec = {"shard_id": shard_id, "committed_at": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
