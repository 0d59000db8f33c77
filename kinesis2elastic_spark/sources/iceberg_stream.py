"""Iceberg table as a Structured Streaming SOURCE (B217).

The Iceberg twin of B205's Delta source: downstream jobs tail the
snapshot lineage and process each append exactly once — iceberg-spark's
``readStream`` — implemented over the interop metadata reader (B191) as
a Spark 4 Python DataSource:

    spark.dataSource.register(IcebergStreamDataSource)
    st = (spark.readStream.format("iceberg_interop")
          .option("path", table_dir)
          .option("ignoreDeletes", "true")     # optional
          .load())

Semantics (the iceberg-spark contract):

- the streaming OFFSET is the snapshot SEQUENCE NUMBER — O(1)
  checkpoint state; each micro-batch covers the snapshots in
  ``(start, end]`` ordered by sequence number;
- a snapshot's ADDED data files are its manifest entries with
  ``status == 1`` in manifests it added (``added_snapshot_id``) —
  metadata-rate planning, one InputPartition per file;
- non-append snapshots (delete manifests added, or entries marked
  deleted) fail loud unless ``ignoreDeletes``, which skips them;
- Iceberg data files carry ALL columns (B191's rule), so the worker
  read is a plain pyarrow scan — no partition-value injection at all.

Expired snapshots (B207) below the stream's committed offset are fine
(the offset only moves forward); a checkpoint pointing INTO an expired
range fails loud at planning, same as iceberg-spark.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from . import avro_ocf as av
from . import iceberg_meta as im


def _spark_ddl(meta: dict) -> str:
    schema = {s["schema-id"]: s for s in meta["schemas"]}[
        meta["current-schema-id"]
    ]
    parts = []
    for f in schema["fields"]:
        t = f["type"]
        spark_t = im._ICE_TO_SPARK.get(
            t, t if isinstance(t, str) and t.startswith("decimal") else None
        )
        if spark_t is None:
            raise NotImplementedError(
                f"iceberg_interop stream: unmappable column type {t!r}"
            )
        parts.append(f"{f['name']} {spark_t}")
    return ", ".join(parts)


class _IceFilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str], seq: int):
        self.path = path
        self.columns = columns
        self.seq = seq


class _IceStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError(
                "iceberg_interop requires .option('path', <table dir>)"
            )
        self.ignore_deletes = str(
            options.get("ignoreDeletes", "false")
        ).lower() in ("true", "1")
        self.starting = int(options.get("startingSequence", 0))
        meta = im.load_metadata(self.table_dir)
        schema = {s["schema-id"]: s for s in meta["schemas"]}[
            meta["current-schema-id"]
        ]
        self._columns = [f["name"] for f in schema["fields"]]

    def initialOffset(self) -> dict:
        return {"seq": self.starting - 1}

    def latestOffset(self) -> dict:
        meta = im.load_metadata(self.table_dir)
        return {
            "seq": max(
                (int(s["sequence-number"]) for s in meta.get("snapshots", [])),
                default=-1,
            )
        }

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["seq"]), int(end["seq"])
        meta = im.load_metadata(self.table_dir)
        by_seq = {
            int(s["sequence-number"]): s for s in meta.get("snapshots", [])
        }
        covered = [q for q in sorted(by_seq) if lo < q <= hi]
        # a checkpoint that progressed past `starting` but whose next
        # snapshot was expired (B207) has LOST data — fail loud (a
        # fresh start over a partially-expired table is fine: it reads
        # the surviving history, iceberg-spark's behavior)
        if by_seq and lo > self.starting - 1 and lo + 1 < min(by_seq):
            raise ValueError(
                f"iceberg_interop stream: snapshots in ({lo}, "
                f"{min(by_seq)}) were expired — the checkpoint points "
                "into pruned history"
            )
        out: list[_IceFilePartition] = []
        for q in covered:
            snap = by_seq[q]
            sid = snap["snapshot-id"]
            _s, mlist = av.read_ocf(snap["manifest-list"])
            added, removed, delete_files = [], 0, 0
            for m in mlist:
                if int(m.get("added_snapshot_id", -1)) != sid:
                    continue
                if int(m.get("content", 0)) != 0:
                    delete_files += 1
                    continue
                _s2, entries = av.read_ocf(m["manifest_path"])
                for e in entries:
                    st = int(e.get("status", 0))
                    if st == 2:
                        removed += 1
                    elif st == 1 and int(e.get("snapshot_id", sid)) == sid:
                        if int(e["data_file"].get("content", 0)) == 0:
                            added.append(e["data_file"]["file_path"])
                        else:
                            delete_files += 1
            if removed or delete_files:
                if not self.ignore_deletes:
                    raise ValueError(
                        f"iceberg_interop stream: snapshot {sid} is not "
                        f"append-only ({removed} removed entries, "
                        f"{delete_files} delete file(s)) — set "
                        ".option('ignoreDeletes','true') to skip"
                    )
                continue
            out.extend(
                _IceFilePartition(p, self._columns, q) for p in added
            )
        return out

    def read(self, partition: _IceFilePartition):
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        cols = {
            n: (t[n].to_pylist() if n in t.column_names else None)
            for n in partition.columns
        }
        for i in range(t.num_rows):
            yield tuple(
                cols[n][i] if cols[n] is not None else None
                for n in partition.columns
            )

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """spark.readStream.format("iceberg_interop") over metadata.json."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_interop"

    def schema(self) -> str:
        return _spark_ddl(im.load_metadata(self.options["path"]))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IceStreamReader(self.options)
