"""Delta table as a Structured Streaming SOURCE (B205).

The canonical lakehouse ingestion pattern: downstream jobs tail a Delta
table's commit log and process each append exactly once —
``spark.readStream.format("delta")`` in delta-spark.  This module
provides that surface over the interop log reader (B190) as a Spark 4
Python DataSource — no JVM connector:

    spark.dataSource.register(DeltaStreamDataSource)
    st = (spark.readStream.format("delta_interop")
          .option("path", table_dir)
          .option("startingVersion", "0")      # default 0 = full history
          .option("ignoreDeletes", "true")     # optional
          .load())

Semantics follow the real Delta source:

- the streaming OFFSET is the table VERSION — O(1) state, no file
  lists in the checkpoint;
- each micro-batch covers the versions ``(start, end]``; per version
  the file-list diff (B203's metadata-rate machinery) yields the
  ADDED files, and those rows are emitted exactly once;
- non-append changes fail loud: a version that removes files or grows
  a deletion vector raises unless ``ignoreDeletes`` is set (then the
  delete-only version is skipped), exactly delta-spark's contract —
  a silent skip would make the stream lossy without the user opting in;
- an added file that carries a deletion vector in the SAME version
  (e.g. a writer publishing pre-compacted state) emits its live rows
  only.

Scale shape: ``partitions()`` plans ONE InputPartition per added data
file, so a large append parallelizes across executors like any file
source; each task reads its parquet with pyarrow, drops DV'd row
indexes by position, and injects the partition-tuple values typed
through the table schema (Delta data files do not contain partition
columns — the B190 rule, applied worker-side here).

Cite: reference repo (Moulick/kinesis2elastic, Go relay) has no table
format; this closes the streaming leg of the B190/B198 interop family.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from . import delta_log as dl


def _coerce(raw: str | None, dtype: str):
    """Partition-value string -> python value per the Spark simpleString
    type (the worker-side twin of read_delta's typed-literal cast)."""
    if raw is None:
        return None
    if dtype in ("bigint", "long", "int", "integer", "smallint", "tinyint"):
        return int(raw)
    if dtype in ("double", "float"):
        return float(raw)
    if dtype == "date":
        return _dt.date.fromisoformat(raw)
    if dtype.startswith("timestamp"):
        return _dt.datetime.fromisoformat(raw)
    if dtype == "boolean":
        return raw.lower() == "true"
    return raw


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        drop_positions: list[int],
        part_values: list,  # aligned with schema field order, None = data col
        version: int,
    ):
        self.path = path
        self.drop_positions = drop_positions
        self.part_values = part_values
        self.version = version


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError(
                "delta_interop requires .option('path', <table dir>)"
            )
        self.starting = int(options.get("startingVersion", 0))
        self.ignore_deletes = str(
            options.get("ignoreDeletes", "false")
        ).lower() in ("true", "1")
        snap = dl.delta_snapshot(self.table_dir)
        self._schema = snap["schema"]
        if snap["column_mapping"] != "none":
            raise NotImplementedError(
                "delta_interop streaming does not support column mapping"
            )

    # ---- offsets ----
    def initialOffset(self) -> dict:
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        return {"version": dl.delta_snapshot(self.table_dir)["version"]}

    # ---- planning (driver, metadata-rate) ----
    def partitions(self, start: dict, end: dict):
        from . import dvectors as _dv

        lo, hi = int(start["version"]), int(end["version"])
        out: list[_DeltaFilePartition] = []
        fields = [(f.name, f.dataType.simpleString()) for f in self._schema]
        prev = (
            dl.delta_snapshot(self.table_dir, lo) if lo >= 0 else None
        )
        prev_by = {f["path"]: f for f in prev["files"]} if prev else {}
        for v in range(lo + 1, hi + 1):
            cur = dl.delta_snapshot(self.table_dir, v)
            cur_by = {f["path"]: f for f in cur["files"]}
            pcols = cur["partition_columns"]
            removed = [p for p in prev_by if p not in cur_by]
            dv_grew = [
                p
                for p in cur_by
                if p in prev_by
                and (cur_by[p].get("deletionVector") or {})
                != (prev_by[p].get("deletionVector") or {})
            ]
            if (removed or dv_grew) and not self.ignore_deletes:
                raise ValueError(
                    f"delta_interop stream: version {v} is not append-only "
                    f"({len(removed)} removed file(s), {len(dv_grew)} DV "
                    "change(s)) — set .option('ignoreDeletes','true') to "
                    "skip delete versions"
                )
            for p, f_ in cur_by.items():
                if p in prev_by:
                    continue
                drop = (
                    _dv.decode_descriptor(
                        self.table_dir, f_["deletionVector"]
                    )
                    if f_.get("deletionVector")
                    else []
                )
                pv = f_["partitionValues"] or {}
                part_values = [
                    _coerce(pv.get(name), dtype) if name in pcols else None
                    for name, dtype in fields
                ]
                out.append(
                    _DeltaFilePartition(p, drop, part_values, v)
                )
            prev_by = cur_by
        return out

    # ---- execution (worker, one parquet file per task) ----
    def read(self, partition: _DeltaFilePartition):
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        drop = set(partition.drop_positions)
        cols = {n: t[n].to_pylist() for n in t.column_names}
        fields = [(f.name, f.dataType.simpleString()) for f in self._schema]
        for i in range(t.num_rows):
            if i in drop:
                continue
            row = []
            for j, (name, dtype) in enumerate(fields):
                if name in cols:
                    row.append(cols[name][i])
                else:
                    row.append(partition.part_values[j])
            yield tuple(row)

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; nothing to clean up


class DeltaStreamDataSource(DataSource):
    """spark.readStream.format("delta_interop") over a _delta_log table."""

    @classmethod
    def name(cls) -> str:
        return "delta_interop"

    def schema(self) -> str:
        snap = dl.delta_snapshot(self.options["path"])
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in snap["schema"]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaStreamReader(self.options)
