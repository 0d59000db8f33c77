"""Streaming CDC apply through the snapshot protocol (B155): a
foreachBatch-maintained UPSERT/DELETE table — the form a 100 TB CDC
target actually runs: each micro-batch lands as an equality-delete
commit plus an append commit, NEVER a table rewrite, and the reader
merge-on-reads the latest state (B152).  The batch twin is B47's
``cdc_latest`` ("latest state per key, tombstone drops the key"): one
definition of the state machine, two execution modes.

Per micro-batch (batch id b):

1. reduce the batch to its LAST op per key — ``max_by`` over the
   (ts, event_id) order, a map-combinable aggregate (the B142/B123
   discipline: no window over the key, hot keys collapse map-side);
   event_type 'error' is the tombstone, anything else upserts the row;
2. ``commit_delete`` of ALL touched keys as version ``2b`` — by the
   B152 sequence rule this removes every EARLIER version of those keys
   and cannot touch data committed after it;
3. ``commit_snapshot`` (append) of the surviving upsert rows as version
   ``2b+1`` — the append outlives step 2's delete because its sequence
   number is strictly larger;
4. ``set_ref('main', 2b+1)`` — the B153 publish: readers follow the
   ref, so the torn state between the two commits (deletes applied,
   upserts not yet) is NEVER visible to them, crash or no crash.

Replay idempotence is structural: versions derive from the batch id, a
replayed batch rewrites manifests 2b/2b+1 with a deterministic
carry-forward from 2b−1 (the matview discipline, B126), and the ref
only ever moves to a fully-committed pair.  Ordering contract: the
source must deliver a key's changes in event-time order across batches
(the Kafka per-key-partition guarantee); WITHIN a batch any order is
fine — the argmax reduction restores it.

At 100 TB: per-batch cost = one batch-sized reduction + keys-rate
delete + upsert-rate append, all metadata-rate on the manifest side;
``optimize_snapshot`` periodically folds the accumulated delete debt
(copy-on-write) and ``vacuum`` expires history — both documented
interplays of B152/B145.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timetravel import (
    commit_delete,
    commit_snapshot,
    read_branch,
    set_ref,
)

CDC_STATE_SCHEMA = (
    "user_id long, event_type string, ts timestamp, value double"
)


def cdc_writer(spark: SparkSession, table_dir: str):
    """foreachBatch body: change batch → last-op-per-key reduction →
    delete commit (v=2b) + append commit (v=2b+1) → atomic ref publish."""

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        b = int(batch_id)
        last = (
            batch_df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "ts", "value"),
                    F.struct("ts", "event_id"),
                ).alias("m")
            )
            .select("user_id", "m.event_type", "m.ts", "m.value")
            # materialize BEFORE the writes: the commit dirs may exist
            # from a failed prior attempt of this same batch and the
            # overwrite would otherwise race the lazy read (the
            # matview_stream discipline)
            .localCheckpoint(eager=True)
        )
        commit_delete(spark, table_dir, last.select("user_id"), 2 * b)
        commit_snapshot(
            spark,
            table_dir,
            last.filter(F.col("event_type") != "error"),
            2 * b + 1,
        )
        set_ref(table_dir, "main", 2 * b + 1)

    return fb


def read_cdc_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """The CDC target's current state: the published ref, merge-on-read."""
    return read_branch(spark, table_dir, "main")


def gated_cdc_writer(spark: SparkSession, table_dir: str, audit):
    """Expectations-gated CDC apply (B162): the B155 writer with the
    B153 WAP gate INSIDE the loop — each batch's delete+append pair
    commits as usual, but the ref only advances if ``audit`` (a
    callable on the STAGED post-batch state, e.g. a B159 expectation
    suite) passes.  A failing batch is QUARANTINED: its manifests exist
    (forensics can read them as-of their versions, or via a named ref)
    but production readers never see them, and the NEXT batch builds on
    the last PUBLISHED snapshot via explicit ``parent=`` — quarantined
    lineage never leaks forward.  The age-gated vacuum eventually
    reclaims quarantined files like any unreferenced commit.

    This is the streaming form of the ingestion data-quality gate: at
    100 TB a poisoned CDC batch (upstream schema break, null-key
    flood) must neither corrupt the serving table nor kill the stream —
    it lands, fails its audit, is skipped, and the pipeline keeps
    draining (the dead-letter-over-fail-the-batch doctrine applied to
    whole commits).  Returns the writer plus a mutable report list the
    caller can inspect (batch id → published/quarantined)."""
    report: list[dict] = []

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.timetravel import read_asof, read_ref

        b = int(batch_id)
        published = read_ref(table_dir, "main")
        # no published snapshot yet -> carry from NOTHING (-1 resolves to
        # the empty set), never from a possibly-quarantined predecessor
        parent = published if published is not None else -1
        last = (
            batch_df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "ts", "value"),
                    F.struct("ts", "event_id"),
                ).alias("m")
            )
            .select("user_id", "m.event_type", "m.ts", "m.value")
            .localCheckpoint(eager=True)
        )
        commit_delete(
            spark, table_dir, last.select("user_id"), 2 * b, parent=parent
        )
        commit_snapshot(
            spark,
            table_dir,
            last.filter(F.col("event_type") != "error"),
            2 * b + 1,
        )
        staged = read_asof(spark, table_dir, 2 * b + 1)
        if audit(staged):
            set_ref(table_dir, "main", 2 * b + 1)
            report.append({"batch": b, "published": True})
        else:
            report.append({"batch": b, "published": False})

    return fb, report


def sync_view_from_feed(
    spark: SparkSession,
    src_table: str,
    view_table: str,
    group_cols: list[str],
    sum_col,
) -> dict:
    """Downstream incremental sync (B179): maintain a (group, count,
    sum) VIEW TABLE from a source table's row-level change feed (B171),
    with the cursor carried BY VERSION ALIGNMENT — the view commits at
    the source version it reflects, so 'what have I applied?' is the
    view's own latest snapshot number: no side-channel cursor file, and
    a replayed sync is structurally idempotent (same source version →
    same view version, deterministic replace commit).

    Each call: read the feed (applied, latest]; fold it into the stored
    view via ``apply_change_feed_to_view`` (inserts add, deletes
    subtract, zero-count groups drop — B174); publish the new view as a
    REPLACE commit at version == source latest.  Bootstrap is the same
    code path: an empty view + v_from = −1 makes the source's entire
    history the first delta.  Cost per sync: |delta| + |view|, never a
    source rescan — the scheduled-downstream form (search index, BI
    extract, replica) of the B174 maintenance math.

    ``sum_col`` is a Column in integer units over the feed's columns.
    Returns {"applied_from", "applied_to", "n_changes"}."""
    from ..operators.timetravel import (
        apply_change_feed_to_view,
        commit_snapshot,
        read_asof,
        read_change_feed,
        snapshot_versions,
    )

    src_vs = snapshot_versions(src_table)
    if not src_vs:
        return {"applied_from": None, "applied_to": None, "n_changes": 0}
    latest = src_vs[-1]
    view_vs = snapshot_versions(view_table)
    applied = view_vs[-1] if view_vs else -1
    if latest <= applied:
        return {"applied_from": applied, "applied_to": applied, "n_changes": 0}
    feed = read_change_feed(spark, src_table, applied, latest).withColumn(
        "__sum", sum_col
    )
    if view_vs:
        view = read_asof(spark, view_table)
    else:
        # Bootstrap view schema derives the group-column types from the
        # FEED (r12 ADVICE): hardcoding string made the later full_outer
        # join in apply_change_feed_to_view match a string view key
        # against the feed's native type — cast-dependent matching (or
        # analysis failure) on the first numeric-keyed deployment.
        import pyspark.sql.types as T

        view = spark.createDataFrame(
            [],
            T.StructType(
                [feed.schema[c] for c in group_cols]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("sum_val", T.LongType()),
                ]
            ),
        )
    new_view = apply_change_feed_to_view(view, feed, group_cols, "__sum")
    n_changes = feed.count()
    commit_snapshot(
        spark,
        view_table,
        new_view.localCheckpoint(eager=True),
        latest,
        carry_forward=False,
    )
    return {"applied_from": applied, "applied_to": latest, "n_changes": n_changes}
