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
4. write the merged state to a NEW versioned directory keyed by batch id.

Versioned state is what makes replay IDEMPOTENT (the B118 exactly-once
discipline applied to state maintenance, not just sinks): a crash between
state write and checkpoint commit replays the batch, which re-reads the
highest version *strictly below* its batch id — the pre-batch state — and
deterministically overwrites its own version.  The double-merge a
plain read-merge-overwrite state file suffers (the CMS writer documents
that trade) cannot happen.  Superseded versions two generations back are
pruned, so steady state holds at most two copies of the |MV|-sized table.

At 100 TB: per-batch cost = one delta scan + an |MV|-sized merge; the
versioned-directory dance is metadata-rate.  (An ACID table format's
MERGE INTO with snapshot isolation is the productionized form of exactly
this loop; the mechanism here is format-free on purpose.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.tableops import MV_STATE_SCHEMA, mv_aggregate, mv_merge, mv_project
from .versioned_state import latest_version as _latest_version
from .versioned_state import prune_below


def matview_writer(spark: SparkSession, state_dir: str):
    """foreachBatch body: orders delta batch → aggregate → merge → v{id}."""

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        delta = mv_aggregate(mv_project(batch_df))
        prev_v = _latest_version(state_dir, below=int(batch_id))
        if prev_v is None:
            merged = delta
        else:
            prev = spark.read.schema(MV_STATE_SCHEMA).parquet(
                os.path.join(state_dir, f"v{prev_v}")
            )
            merged = mv_merge(prev, delta)
        # materialize BEFORE writing: v{batch_id} may exist from a failed
        # prior attempt of this same batch and overwrite would otherwise
        # race the lazy read of it
        merged = merged.localCheckpoint(eager=True)
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{int(batch_id)}")
        )
        # prune versions older than the one this batch merged FROM: a
        # replay of batch_id needs prev_v, never anything older
        prune_below(state_dir, prev_v)

    return fb


def read_matview(spark: SparkSession, state_dir: str) -> DataFrame:
    v = _latest_version(state_dir)
    if v is None:
        return spark.createDataFrame([], MV_STATE_SCHEMA)
    return spark.read.schema(MV_STATE_SCHEMA).parquet(
        os.path.join(state_dir, f"v{v}")
    )
