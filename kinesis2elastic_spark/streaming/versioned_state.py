"""Versioned-directory state for foreachBatch maintainers — the
replay-idempotence discipline shared by the materialized-view (B126) and
quantile-histogram (B136) writers.

The contract (B118 exactly-once applied to STATE, not just sinks):
Structured Streaming guarantees at-least-once delivery to foreachBatch
with deterministic batch ids, so a state maintainer is exactly-once iff
re-running a batch attempt is a no-op.  Achieved by versioning:

1. each batch merges FROM the highest version strictly BELOW its batch
   id (the pre-batch state — never its own possibly-partial output);
2. it writes the merged state to ``v{batch_id}`` (overwrite — a replay
   deterministically rewrites the same content);
3. versions older than the merge source are pruned, so steady state
   holds at most two copies of the state table.

A crash between the state write and the checkpoint commit therefore
cannot double-merge: the replay re-reads the same pre-batch version.
At 100 TB the versioned-directory dance is metadata-rate; an ACID table
format's snapshot-isolated MERGE INTO is the productionized form.
"""

from __future__ import annotations

import os
import shutil


def versions(state_dir: str) -> list[int]:
    """Sorted version ids present under ``state_dir`` (``v{N}`` dirs)."""
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def latest_version(state_dir: str, below: int | None = None) -> int | None:
    """Highest version id, optionally strictly below ``below``."""
    vs = [v for v in versions(state_dir) if below is None or v < below]
    return max(vs, default=None)


def version_path(state_dir: str, v: int) -> str:
    return os.path.join(state_dir, f"v{int(v)}")


def prune_below(state_dir: str, keep_from: int | None) -> None:
    """Remove versions strictly below ``keep_from`` — a replay of the
    current batch needs its merge source, never anything older."""
    if keep_from is None:
        return
    for v in versions(state_dir):
        if v < keep_from:
            shutil.rmtree(version_path(state_dir, v), ignore_errors=True)
