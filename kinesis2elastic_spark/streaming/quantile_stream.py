"""Continuous quantile-histogram maintenance (B136): a foreachBatch-merged
fixed-grid value histogram per group — the MERGEABLE quantile sketch that
completes the repo's sketch family (B65 HLL for distincts, B102 CMS for
frequencies, this for order statistics).  Continuous latency/value
percentiles over an unbounded stream cannot keep raw values; a fixed
integer bin grid gives counter state that merges by plain addition
across batches/partitions/days, with a deterministic worst-case error of
ONE bin width.

Grid: values snap to integer micro-units (``floor(v*1e6 + 0.5)``) and
bin = ``clamp(vm div QHIST_W_MICRO, 0, QHIST_BINS-1)`` — FIXED edges, so
two batches' histograms are over the same grid and addition is exact
(an adaptive-edge sketch like t-digest merges approximately; the fixed
grid trades a configured value range for exact mergeability and
cross-engine reproducibility — every readout below is pure BIGINT
arithmetic both engines replay identically).

Per micro-batch (the B102 CMS writer discipline):
1. partial-aggregate the batch into (group, bin, cnt) cells — at most
   |groups| × ``QHIST_BINS`` rows out regardless of batch size;
2. read the CURRENT materialized counter table (bounded by the same);
3. merge by addition; 4. localCheckpoint, then overwrite the state path
(materialize-before-overwrite).  A replay after a crash between state
write and checkpoint commit would double-merge — the versioned-state
discipline of ``matview_stream.py`` is the exactly-once upgrade when
that matters; the equivalence query restarts BETWEEN drains (clean
commits), which this form handles exactly.

At 100 TB: per-batch shuffle ≤ |groups|×4096 counter cells per map
partition; state is a fixed-size table; quantile readout is a window
over the BOUNDED histogram, never the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QHIST_BINS = 4096
QHIST_W_MICRO = 125_000  # 0.125-unit bins: grid covers [0, 512) exactly
QHIST_STATE_SCHEMA = "event_type string, bin long, cnt long"


def qhist_partials(df: DataFrame) -> DataFrame:
    """(event_type, value) rows → (event_type, bin, cnt) counter cells."""
    bin_ = F.expr(
        f"least({QHIST_BINS - 1}, greatest(0, "
        f"CAST(floor(value * 1000000 + 0.5) AS BIGINT) div {QHIST_W_MICRO}))"
    )
    return df.groupBy("event_type", bin_.alias("bin")).agg(
        F.count("*").cast("long").alias("cnt")
    )


def merge_qhist(spark: SparkSession, state_path: str, partials: DataFrame) -> None:
    if os.path.isdir(state_path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(state_path)
    ):
        existing = spark.read.schema(QHIST_STATE_SCHEMA).parquet(state_path)
        src = existing.unionByName(partials.selectExpr("event_type", "bin", "cnt"))
    else:
        src = partials.selectExpr("event_type", "bin", "cnt")
    merged = (
        src.groupBy("event_type", "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # materialize BEFORE overwriting source
    )
    merged.coalesce(1).write.mode("overwrite").parquet(state_path)


def continuous_qhist_writer(spark: SparkSession, state_path: str):
    """foreachBatch body: events batch → bin cells → add-merge."""

    def fb(batch_df: DataFrame, _batch_id: int) -> None:
        merge_qhist(
            spark, state_path, qhist_partials(batch_df.select("event_type", "value"))
        )

    return fb


def read_qhist(spark: SparkSession, state_path: str) -> DataFrame:
    if not os.path.isdir(state_path):
        return spark.createDataFrame([], QHIST_STATE_SCHEMA)
    return spark.read.schema(QHIST_STATE_SCHEMA).parquet(state_path)
