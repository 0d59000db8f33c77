"""Continuous materialized-view maintenance (B126 streaming leg): a
foreachBatch-maintained aggregate table — the form a 100 TB MV actually
runs: deltas land continuously, the view updates by merging ONLY each
micro-batch's aggregate into the persisted state, and the base data is
never re-aggregated.

Per micro-batch (reusing the batch operators' ONE definition of the view —
``tableops.mv_project`` / ``mv_aggregate`` / ``mv_merge`` — so the batch
oracle pins the streaming state machine row-for-row):

1. aggregate the batch's delta (bounded by the view's group cardinality,
   not the batch size — the shuffle is map-combinable);
2. read the PRE-batch MV state;
3. ``mv_merge`` (counts/sums add, min/max fold, one-sided groups pass);
4. publish the merged state as a REPLACE snapshot commit at version =
   batch id (B138 protocol: data under ``data/c{batch_id}/``, then the
   atomic manifest rename IS the commit).

r11 unification (r10 verdict #4): this writer previously used its own
versioned-directory convention (``versioned_state.py``, now the qhist
writer's only client); publishing through the B138 manifest protocol
instead means (a) replay idempotence falls out of commit ATOMICITY — a
crash between the data write and the manifest rename leaves an orphan
``data/c{N}/`` that no manifest references, so the replayed batch
re-reads the latest manifest STRICTLY BELOW its batch id (the pre-batch
state, never its own partial output), deterministically rewrites the
same data, and re-renames the manifest — and (b) the whole time-travel
read surface works over the streaming table for free:
``read_asof(version=batch_id)`` is the MV as of any retained batch.
Retention is the B145 ``vacuum`` (keep_last=2 — a replay of batch N
needs its merge source N-1, never anything older), and reads below the
floor fail loudly instead of re-reading vacuumed files.

At 100 TB: per-batch cost = one delta scan + an |MV|-sized merge; the
manifest dance is metadata-rate.  (An ACID table format's MERGE INTO
with snapshot isolation is the productionized form of exactly this
loop; the mechanism here is format-free on purpose.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.tableops import MV_STATE_SCHEMA, mv_aggregate, mv_merge, mv_project
from ..operators.timetravel import (
    commit_snapshot,
    read_asof,
    snapshot_versions,
    vacuum,
)


def _prev_version(table_dir: str, batch_id: int) -> int | None:
    """Latest committed version STRICTLY below ``batch_id`` — the
    pre-batch state a (possibly replayed) batch merges from."""
    vs = [v for v in snapshot_versions(table_dir) if v < int(batch_id)]
    return max(vs, default=None)


def matview_writer(spark: SparkSession, state_dir: str):
    """foreachBatch body: orders delta batch → aggregate → merge →
    replace-commit snapshot v{batch_id} → vacuum to the last 2."""

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        delta = mv_aggregate(mv_project(batch_df))
        prev_v = _prev_version(state_dir, int(batch_id))
        if prev_v is None:
            merged = delta
        else:
            prev = read_asof(spark, state_dir, prev_v, schema=MV_STATE_SCHEMA)
            merged = mv_merge(prev, delta)
        # materialize BEFORE writing: data/c{batch_id} may exist from a
        # failed prior attempt of this same batch and the overwrite would
        # otherwise race the lazy read of it
        merged = merged.localCheckpoint(eager=True)
        commit_snapshot(
            spark,
            state_dir,
            merged.coalesce(1),
            int(batch_id),
            carry_forward=False,  # each version IS the whole state table
        )
        # retention: a replay of this batch needs prev_v, never older;
        # min_age_s=0 is safe here because this maintainer is the table's
        # only writer (no concurrent uncommitted files to protect)
        vacuum(state_dir, keep_last=2)

    return fb


def read_matview(spark: SparkSession, state_dir: str) -> DataFrame:
    return read_asof(spark, state_dir, None, schema=MV_STATE_SCHEMA)
