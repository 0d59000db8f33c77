"""Custom Python DataSource for the Firehose envelope spool (A1 surface).

The reference is an always-on HTTP ingestion endpoint (main.go:248-365)
whose deployment also writes every envelope to S3 (S3BackupMode: AllData).
This module turns that spool/backup directory into a FIRST-CLASS Spark
source via the Spark 4 Python DataSource API — no JVM connector code:

    spark.dataSource.register(FirehoseSpoolDataSource)
    df = (spark.read.format("firehose_spool")
          .option("path", spool_dir).load())          # batch
    st = (spark.readStream.format("firehose_spool")
          .option("path", spool_dir).load())          # incremental stream

Why this exists alongside ``envelope_source`` (which wraps the built-in
json/kinesis/kafka formats): it is the template for writing a REAL
custom connector against this engine in pure Python — partition planning
(one input partition per spool file → parallel scan), explicit schema
(no inference job), malformed-record tolerance (null-field rows, never
stream-killing exceptions), and a simple incremental stream reader whose
offset is the sorted-filename high-water mark, the same at-least-once
contract the reference's upstream buffering provides (delivery retries →
duplicate envelopes; the sink's deterministic _id makes it
effectively-once downstream).

Scale notes: partition planning is file-granular, so a 100 TB backlog
parallelizes across executors like any file source; the stream reader's
offset is O(1) state (a filename watermark), not a file list."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ENVELOPE_SCHEMA_DDL = (
    "requestId string, timestamp long, records array<struct<data:string>>"
)


def _parse_envelope_line(line: str):
    """One spool line → one envelope tuple; malformed input degrades to a
    null-field row (the decode chain's dead-letter path handles it)."""
    try:
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError("not an object")
        recs = obj.get("records")
        records = (
            [(str(r.get("data")) if r.get("data") is not None else None,)
             for r in recs if isinstance(r, dict)]
            if isinstance(recs, list)
            else None
        )
        ts = obj.get("timestamp")
        return (
            str(obj["requestId"]) if obj.get("requestId") is not None else None,
            int(ts) if isinstance(ts, (int, float)) else None,
            records,
        )
    except (ValueError, KeyError, TypeError):
        return (None, None, None)


def _spool_files(path: str) -> list[str]:
    return sorted(
        p
        for pat in ("*.json", "*.jsonl", "*.ndjson")
        for p in glob.glob(os.path.join(path, pat))
    )


class _SpoolFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _SpoolBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("firehose_spool requires .option('path', <spool dir>)")

    def partitions(self):
        # one partition per spool file: executors scan files in parallel,
        # the planner ships only paths
        return [_SpoolFilePartition(p) for p in _spool_files(self.path)] or [
            _SpoolFilePartition("")
        ]

    def read(self, partition: _SpoolFilePartition):
        if not partition.path:
            return
        with open(partition.path, errors="replace") as f:
            for line in f:
                line = line.strip()
                if line:
                    yield _parse_envelope_line(line)


class _SpoolStreamReader(SimpleDataSourceStreamReader):
    """Incremental reader: the offset is the last-ingested filename (the
    spool writes one file per delivery with monotonically sortable names
    — the receiver uses uuid-prefixed timestamps).  Each micro-batch
    drains every file strictly greater than the watermark."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("firehose_spool requires .option('path', <spool dir>)")

    def initialOffset(self):
        return {"last_file": ""}

    def read(self, start: dict):
        last = start.get("last_file", "")
        new_files = [p for p in _spool_files(self.path) if os.path.basename(p) > last]
        rows = []
        for p in new_files:
            with open(p, errors="replace") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rows.append(_parse_envelope_line(line))
        end = {
            "last_file": os.path.basename(new_files[-1]) if new_files else last
        }
        return (iter(rows), end)  # the runner requires an iterator, not a list

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = start.get("last_file", "")
        hi = end.get("last_file", "")
        rows = []
        for p in _spool_files(self.path):
            if lo < os.path.basename(p) <= hi:
                with open(p, errors="replace") as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            rows.append(_parse_envelope_line(line))
        return iter(rows)

    def commit(self, end: dict):
        pass  # spool files are retained (S3-backup semantics) — no cleanup


class FirehoseSpoolDataSource(DataSource):
    """spark.read/readStream.format("firehose_spool") over a spool dir."""

    @classmethod
    def name(cls) -> str:
        return "firehose_spool"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _SpoolBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SpoolStreamReader(self.options)
