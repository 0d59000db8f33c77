"""Structured Streaming operators (SURVEY §2 B27-B31 + A1/A35 semantics).

The reference's unit of streaming is one Firehose HTTP delivery = one
micro-batch (upstream buffers 1 MB / 60 s and retries for 300 s,
cloudformation-template.yaml:147-162; all data is also backed up to S3).
Spark-first mapping:

- source: ``readStream`` over a file directory (the S3-backup replay path —
  the reference architecture already writes every envelope to S3, so a file
  stream over that bucket is a *faithful* source, not a test shortcut; a
  Kinesis connector slots in by swapping ``format``);
- trigger: ``availableNow`` in tests (deterministic drain),
  ``processingTime='60 seconds'`` in production to mirror the upstream
  buffer cadence;
- event time: ``record.data.logEvents.timestamp`` is the watermark column —
  the envelope @timestamp is delivery time and deliberately NOT used
  (main.go:524-526 keeps them distinct because "firehose batches and
  buffers the records");
- at-least-once upstream + deterministic document ids downstream (sink.py)
  = effectively-once, the fix for the reference's duplicate-on-retry
  behavior (no _id at main.go:555-559).

State-store sizing at 100 TB: windowed aggregations keep |keys x open
windows| rows of state; the watermark bounds open windows, so the delay
below is the knob that trades late-data tolerance for state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import FIREHOSE_ENVELOPE

# Event-stream schema used by the streaming tests (mirrors the events table).
EVENT_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def stream_envelopes(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """A1: file-stream source over Firehose envelope JSON (S3-backup
    replay shape).  Explicit schema — no inference job at stream start."""
    reader = spark.readStream.schema(FIREHOSE_ENVELOPE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def normalize_connector_payload(df: DataFrame) -> DataFrame:
    """Normalize a connector-delivered stream to the envelope schema.

    Stream connectors deliver the envelope JSON as an opaque payload
    column — ``data`` (the Kinesis connector's record payload) or
    ``value`` (Kafka / text) — rather than parsed columns.  Cast to
    string, parse with the explicit envelope schema, flatten.  Records
    that fail to parse surface as all-null rows (caught downstream by the
    decode chain's error column), never as stream-killing exceptions."""
    if "data" in df.columns:
        payload = F.col("data")
    elif "value" in df.columns:
        payload = F.col("value")
    else:
        raise ValueError(
            f"no payload column ('data' or 'value') in {df.columns}"
        )
    return df.select(
        F.from_json(payload.cast("string"), FIREHOSE_ENVELOPE).alias("env")
    ).select("env.*")


def envelope_source(
    spark: SparkSession,
    source_format: str = "json",
    path: str | None = None,
    options: dict | None = None,
    payload_expr: str | None = None,
) -> DataFrame:
    """A1 source seam (main.go:248-365): one factory for every envelope
    transport, returning the same envelope-schema DataFrame so the rest of
    the pipeline is source-agnostic.

    - ``json`` (default): file stream over the spool / S3-backup directory
      (the reference deployment's ``S3BackupMode: AllData`` replay path);
    - ``kinesis``: pass-through to a Kinesis connector (e.g. the AWS
      ``spark-streaming-sql-kinesis`` connector) — supply its options
      (``streamName``, ``region``, ``endpointUrl``,
      ``startingPosition``, ...) via ``options``; the connector's binary
      ``data`` column is parsed with the envelope schema;
    - ``kafka``: pass-through (``kafka.bootstrap.servers``,
      ``subscribe``, ...); the binary ``value`` column is parsed the same
      way.

    ``payload_expr`` (connector branch only): SQL expression evaluated
    over the RAW connector stream to derive the payload column before
    normalization — for connectors that wrap the envelope (e.g. Kinesis
    KPL-aggregated records needing a slice/unpack) and for driving the
    seam from payload-less synthetic sources (``rate``) in tests and
    soak runs.

    No connector jar ships here (none is available in this sandbox); the
    seam is the contract: ``.format(fmt).options(**opts).load()`` [+
    ``payload_expr``] + ``normalize_connector_payload``.  Tested with the
    built-in ``text`` source (opaque ``value`` column, the Kafka shape)
    and the built-in ``rate`` source (non-file, unbounded — the Kinesis
    cadence shape) driving the identical generic branch."""
    options = dict(options or {})
    if source_format == "json":
        if path is None:
            path = options.pop("path", None)
        reader = spark.readStream.schema(FIREHOSE_ENVELOPE).options(**options)
        return reader.json(path)
    if path is not None:
        options.setdefault("path", path)
    df = spark.readStream.format(source_format).options(**options).load()
    if payload_expr is not None:
        df = df.selectExpr(f"({payload_expr}) AS data")
    return normalize_connector_payload(df)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-stream source over event-shaped JSON fixtures."""
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """B27: tumbling event-time window aggregate with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame, window: str = "10 minutes", slide: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """B27: sliding window variant."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    """B28: session windows (same semantics as the batch q_sessionize:
    a session closes after ``gap`` of inactivity)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """B30: drop duplicate event_ids within the watermark horizon — state
    is bounded by the watermark (without it, the seen-set grows forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """B31: arbitrary stateful op via applyInPandasWithState — per-user
    running event count + value sum, emitted per micro-batch."""
    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
SESSION_WM_DELAY_MS = 10 * 60 * 1000  # 10-minute watermark delay


def sessionize_stateful_timeout(events: DataFrame) -> DataFrame:
    """B31, the TIMEOUT path: custom sessionization via
    ``applyInPandasWithState`` + ``EventTimeTimeout`` — the API surface
    ``running_totals_stateful`` (NoTimeout) doesn't touch.  Per user the
    state holds the open session (start, last event, count, micro-unit
    value sum); a session closes and is APPENDED either

    - in-stream, when a later event for the key arrives more than the
      gap after the last one (the state function closes it inline), or
    - by TIMEOUT, when the event-time watermark passes last + gap with
      no new data for the key (``state.hasTimedOut`` → emit + remove).

    Emission is append-mode by construction: a session row is final.
    Timestamps ride through state as integer microseconds; the value
    snap is the same pure-IEEE ``floor(v*1e6 + 0.5)`` as the batch
    operators, so streamed rows are bit-comparable with the batch twin.
    Spark's watermark/timeout bookkeeping is in MILLISECONDS (floored) —
    the equivalence query mirrors that exact integer arithmetic."""
    out_schema = (
        "user_id bigint, session_start timestamp, session_last timestamp,"
        " n_events bigint, sum_v_micro bigint"
    )
    state_schema = "start bigint, last bigint, n bigint, sumv bigint"

    def _row(key, start, last, n, sumv):
        return {
            "user_id": key,
            "session_start": pd.Timestamp(start, unit="us"),
            "session_last": pd.Timestamp(last, unit="us"),
            "n_events": n,
            "sum_v_micro": sumv,
        }

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            start, last, n, sumv = state.get
            state.remove()
            yield pd.DataFrame([_row(key[0], start, last, n, sumv)])
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = batch["ts"].astype("int64").to_numpy() // 1000  # ns → µs
        v_micro = np.floor(batch["value"].to_numpy() * 1e6 + 0.5).astype("int64")
        start, last, n, sumv = state.get if state.exists else (None, 0, 0, 0)
        closed = []
        for t, v in zip(ts_us.tolist(), v_micro.tolist()):
            if start is None:
                start, last, n, sumv = t, t, 1, v
            elif t - last > SESSION_GAP_US:
                closed.append(_row(key[0], start, last, n, sumv))
                start, last, n, sumv = t, t, 1, v
            else:
                last, n, sumv = t, n + 1, sumv + v
        state.update((start, last, n, sumv))
        # Spark timeout bookkeeping is ms-floored
        state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", f"{SESSION_WM_DELAY_MS // 60000} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """B31, Spark-4 form: the same per-user running totals through
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState, with TYPED state handles (ValueState here;
    ListState/MapState/timers available) managed by the state store
    instead of a single opaque tuple.

    At scale this is the API that composes with RocksDB + changelog
    checkpointing (``use_rocksdb_state``): per-key state lives in the
    store, not the Python worker, and each micro-batch streams Arrow
    batches per key through the processor."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` with an event-time interval bound
    (right within [left - within, left]).  Both sides watermarked so the
    join state is bounded: a buffered row can be evicted once the other
    side's watermark passes its eviction bound — without the time bound the
    state would grow forever.

    ``how``: ``inner`` | ``leftOuter`` | ``rightOuter`` | ``fullOuter``.
    Outer results are *deferred* by construction: an unmatched row is only
    emitted (null-padded) once the watermark guarantees no match can still
    arrive — the time bound is what makes outer stream-stream joins
    decidable at all."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how)


def use_rocksdb_state(spark: SparkSession) -> None:
    """Switch the streaming state store to RocksDB (A35/B27-B31 at scale).

    The default HDFS-backed provider keeps every key in executor heap —
    fine for bounded test state, an OOM at 100 TB key cardinality.  RocksDB
    spills to local disk with bounded memory and changelog checkpointing.
    Session-wide conf: set before starting stateful queries."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # changelog checkpointing: upload deltas, not full snapshots, per batch
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def run_to_memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion into an in-memory table
    (availableNow trigger): deterministic for tests; returns the query."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
