"""Delta Lake ``_delta_log`` interop reader (B190).

A real 100 TB lakehouse table usually arrives as a DELTA table, not as
this repo's own snapshot protocol (operators/timetravel.py).  This
module reads the open Delta transaction-log format (the published
PROTOCOL.md at github.com/delta-io/delta — JSON commit files of
actions plus parquet checkpoints) WITHOUT the delta-spark runtime:

- log replay: newest checkpoint <= target version seeds the file set,
  then each later ``%020d.json`` commit applies its actions in order
  (``add`` inserts/replaces by path, ``remove`` drops, last
  ``metaData``/``protocol`` wins) — exactly the spec's state
  reconstruction;
- version time travel: replay simply stops at the requested version;
- partition handling: Delta data files do NOT contain the partition
  columns; the add action's ``partitionValues`` (string map) is the
  source of truth.  Files are grouped by partition tuple and each
  group gets its values injected as typed literals (cast through the
  table schema) — at scale the group count is the touched-partition
  count, and each group stays ONE parquet scan, so the plan is a union
  of pruned scans, never a per-file loop;
- schema: ``metaData.schemaString`` is the JSON-serialized Spark
  StructType the spec mandates — parsed with ``StructType.fromJson``;
- safety: reader features beyond protocol v1 (column mapping, deletion
  vectors, ...) FAIL LOUD instead of silently mis-reading.

The writer half (``delta_append`` / ``delta_remove_where`` /
``delta_checkpoint``) exists to build REAL fixture tables for tests and
the oracle query — generator-built, no vendored data — and follows the
same spec: actions as ndjson, checkpoint as a parquet of nullable
action structs plus ``_last_checkpoint``.

Spark-first scale notes: the log itself is metadata (KBs per commit;
checkpoints amortize long logs exactly like the spec intends), and the
data path stays a plain pushdown-friendly parquet scan — predicate/
projection pushdown and partition pruning all still apply because the
reader hands Spark explicit file lists per partition group.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from urllib.parse import quote, unquote

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG = "_delta_log"
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_JSON_RE = re.compile(r"^(\d{20})\.json$")
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def is_delta_table(table_dir: str) -> bool:
    return os.path.isdir(_log_dir(table_dir))


def _list_log(log_dir: str) -> tuple[dict[int, str], dict[int, str]]:
    """(json commits, checkpoints) by version."""
    commits: dict[int, str] = {}
    ckpts: dict[int, str] = {}
    for f in os.listdir(log_dir):
        m = _JSON_RE.match(f)
        if m:
            commits[int(m.group(1))] = os.path.join(log_dir, f)
        m = _CKPT_RE.match(f)
        if m:
            ckpts[int(m.group(1))] = os.path.join(log_dir, f)
    return commits, ckpts


def _read_commit_actions(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _read_checkpoint_actions(path: str) -> list[dict]:
    """A checkpoint parquet holds one action per row in nullable struct
    columns (add / remove / metaData / protocol / txn per the spec);
    re-shape rows back into the JSON-action form so replay has ONE
    code path."""
    t = pq.read_table(path)
    out: list[dict] = []
    for row in t.to_pylist():
        for key in ("protocol", "metaData", "add", "remove", "txn"):
            v = row.get(key)
            if v is not None:
                if key in ("add", "remove") and isinstance(
                    v.get("partitionValues"), list
                ):
                    # pyarrow renders map<string,string> as (k, v) pairs
                    v = dict(v, partitionValues=dict(v["partitionValues"]))
                out.append({key: v})
    return out


def _check_protocol(protocol: dict | None) -> None:
    if not protocol:
        return
    v = int(protocol.get("minReaderVersion", 1))
    feats = protocol.get("readerFeatures") or []
    if v > 1 and not feats:
        raise NotImplementedError(
            f"delta reader protocol v{v} (column mapping / deletion "
            "vectors) not supported by this interop reader"
        )
    unsupported = [f_ for f_ in feats if f_ not in ("timestampNtz",)]
    if unsupported:
        raise NotImplementedError(
            f"unsupported delta readerFeatures: {unsupported}"
        )


def delta_snapshot(table_dir: str, version: int | None = None) -> dict:
    """Reconstruct the table state as of ``version`` (None = latest):
    {"version", "files": [{path(abs), partitionValues, size, stats}],
    "schema": StructType, "partition_columns", "metadata", "protocol",
    "checkpoint_used"}.  Pure metadata work — never touches a data
    file."""
    log_dir = _log_dir(table_dir)
    if not os.path.isdir(log_dir):
        raise ValueError(f"not a delta table (no {_LOG}): {table_dir}")
    commits, ckpts = _list_log(log_dir)
    if not commits and not ckpts:
        raise ValueError(f"empty delta log in {table_dir}")
    latest = max(list(commits) + list(ckpts))
    target = latest if version is None else int(version)
    if target > latest:
        target = latest
    known = sorted(set(commits) | set(ckpts))
    if target not in set(known) and target < known[0]:
        raise ValueError(
            f"version {target} predates the log (earliest {known[0]})"
        )
    # seed from the newest checkpoint <= target (the spec's replay rule;
    # _last_checkpoint is a hint, the listing is the truth)
    ckpt_v = max((v for v in ckpts if v <= target), default=None)
    actions: list[dict] = []
    checkpoint_used = False
    if ckpt_v is not None:
        actions.extend(_read_checkpoint_actions(ckpts[ckpt_v]))
        checkpoint_used = True
        start = ckpt_v + 1
    else:
        start = min(commits) if commits else 0
    for v in range(start, target + 1):
        if v in commits:
            actions.extend(_read_commit_actions(commits[v]))
        elif ckpt_v is None or v > ckpt_v:
            # a gap in the json log below target with no covering
            # checkpoint means an expired/cleaned log we cannot replay
            raise ValueError(
                f"delta log gap at version {v} (no json commit, no "
                "covering checkpoint)"
            )
    live: dict[str, dict] = {}
    metadata: dict | None = None
    protocol: dict | None = None
    for a in actions:
        if "metaData" in a:
            metadata = a["metaData"]
        elif "protocol" in a:
            protocol = a["protocol"]
        elif "add" in a:
            add = a["add"]
            live[add["path"]] = add
        elif "remove" in a:
            live.pop(a["remove"]["path"], None)
    _check_protocol(protocol)
    if metadata is None:
        raise ValueError(f"no metaData action found in {table_dir}")
    fmt = (metadata.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise NotImplementedError(f"delta format provider {fmt!r}")
    schema = StructType.fromJson(json.loads(metadata["schemaString"]))
    files = [
        {
            "path": os.path.join(table_dir, unquote(p)),
            "partitionValues": add.get("partitionValues") or {},
            "size": add.get("size"),
            "stats": add.get("stats"),
        }
        for p, add in live.items()
    ]
    return {
        "version": target,
        "files": files,
        "schema": schema,
        "partition_columns": metadata.get("partitionColumns") or [],
        "metadata": metadata,
        "protocol": protocol,
        "checkpoint_used": checkpoint_used,
    }


def read_delta(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table as of ``version`` through the log replay:
    grouped-by-partition-tuple parquet scans with the partition columns
    injected as typed literals from ``partitionValues`` (the spec's
    source of truth — dir layout is only a convention), unioned and
    projected to the declared schema's column order and types."""
    snap = delta_snapshot(table_dir, version)
    schema: StructType = snap["schema"]
    pcols: list[str] = snap["partition_columns"]
    dtypes = {f.name: f.dataType for f in schema.fields}
    if not snap["files"]:
        return spark.createDataFrame([], schema)
    groups: dict[tuple, list[str]] = {}
    for f_ in snap["files"]:
        key = tuple((f_["partitionValues"] or {}).get(c) for c in pcols)
        groups.setdefault(key, []).append(f_["path"])
    parts: list[DataFrame] = []
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.parquet(*paths)
        for c, raw in zip(pcols, key):
            if raw is None or raw == _HIVE_NULL:
                df = df.withColumn(c, F.lit(None).cast(dtypes[c]))
            else:
                df = df.withColumn(c, F.lit(raw).cast(dtypes[c]))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


# ----------------------------------------------------------------- writer
# Fixture-grade but spec-shaped: enough of the write protocol to build
# REAL delta tables (multi-commit, partitioned, checkpointed) for tests
# and the oracle query.  Single-writer by design — concurrency control
# for the repo's own tables lives in timetravel.commit_snapshot.


def _next_version(table_dir: str) -> int:
    log_dir = _log_dir(table_dir)
    if not os.path.isdir(log_dir):
        return 0
    commits, ckpts = _list_log(log_dir)
    vs = list(commits) + list(ckpts)
    return (max(vs) + 1) if vs else 0


def _write_commit(table_dir: str, version: int, actions: list[dict]) -> None:
    log_dir = _log_dir(table_dir)
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{version:020d}.json")
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    os.replace(tmp, final)


def _rel_files(table_dir: str, sub: str) -> list[str]:
    base = os.path.join(table_dir, sub)
    out = []
    for root, _d, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(
                    os.path.relpath(os.path.join(root, f), table_dir)
                )
    return sorted(out)


def delta_append(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
) -> int:
    """Append ``df`` as one delta commit; first commit also writes the
    protocol + metaData actions.  Data files land under a
    commit-unique subdir (path uniqueness — the spec requires add paths
    never be reused), partition dirs inside it when partitioned."""
    version = _next_version(table_dir)
    pcols = list(partition_by or [])
    sub = f"part-c{version:05d}"
    dest = os.path.join(table_dir, sub)
    w = df.write.mode("overwrite")
    if pcols:
        w = w.partitionBy(*pcols)
    w.parquet(dest)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": pcols,
                    "configuration": {},
                }
            }
        )
    for rel in _rel_files(table_dir, sub):
        pv = {}
        for c in pcols:
            m = re.search(rf"(?:^|/){re.escape(c)}=([^/]+)/", rel)
            if not m:
                raise ValueError(f"partition dir for {c!r} missing in {rel}")
            raw = unquote(m.group(1))
            pv[c] = None if raw == _HIVE_NULL else raw
        abspath = os.path.join(table_dir, rel)
        actions.append(
            {
                "add": {
                    "path": quote(rel),
                    "partitionValues": pv,
                    "size": os.path.getsize(abspath),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    _write_commit(table_dir, version, actions)
    return version


def delta_remove_where(table_dir: str, pred) -> int:
    """Logical delete: one commit of ``remove`` actions for every live
    file whose add entry satisfies ``pred(add_action_dict)`` (e.g. by
    partitionValues) — file-level deletion, the granularity the base
    protocol supports (row-level needs deletion vectors, which this
    reader intentionally rejects)."""
    snap = delta_snapshot(table_dir)
    version = _next_version(table_dir)
    actions = []
    for f_ in snap["files"]:
        rel = quote(os.path.relpath(f_["path"], table_dir))
        if pred({"path": rel, "partitionValues": f_["partitionValues"]}):
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
            )
    if not actions:
        raise ValueError("remove predicate matched no live files")
    _write_commit(table_dir, version, actions)
    return version


def delta_checkpoint(table_dir: str) -> int:
    """Write a checkpoint parquet of the CURRENT state (adds +
    metaData + protocol as nullable structs) and the
    ``_last_checkpoint`` pointer — after which the older json commits
    are redundant for reads at/after this version (log cleanup safe),
    exactly the spec's compaction contract."""
    snap = delta_snapshot(table_dir)
    v = snap["version"]
    pv_type = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pv_type),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    rows: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": int(
                    (snap["protocol"] or {}).get("minReaderVersion", 1)
                ),
                "minWriterVersion": int(
                    (snap["protocol"] or {}).get("minWriterVersion", 2)
                ),
            },
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": snap["metadata"].get("id", ""),
                "format": {"provider": "parquet"},
                "schemaString": snap["metadata"]["schemaString"],
                "partitionColumns": snap["partition_columns"],
            },
            "add": None,
        },
    ]
    for f_ in snap["files"]:
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": quote(os.path.relpath(f_["path"], table_dir)),
                    "partitionValues": [
                        (k, v) for k, v in (f_["partitionValues"] or {}).items()
                    ],
                    "size": int(f_["size"] or 0),
                    "modificationTime": 0,
                    "dataChange": True,
                },
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("protocol", proto_t), ("metaData", meta_t), ("add", add_t)]
        ),
    )
    log_dir = _log_dir(table_dir)
    path = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    lc = os.path.join(log_dir, "_last_checkpoint")
    tmp = lc + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"version": v, "size": table.num_rows}, f)
    os.replace(tmp, lc)
    return v


def expire_delta_log(table_dir: str, before_version: int) -> int:
    """Delete json commits strictly below ``before_version`` that are
    covered by a checkpoint (the spec's log-retention cleanup).  Refuses
    to create a replay gap: only commits <= the newest checkpoint are
    eligible.  Returns the number of files removed."""
    log_dir = _log_dir(table_dir)
    commits, ckpts = _list_log(log_dir)
    if not ckpts:
        raise ValueError("no checkpoint: cleaning the log would orphan reads")
    cover = max(ckpts)
    n = 0
    for v, p in commits.items():
        if v < before_version and v <= cover:
            os.remove(p)
            n += 1
    return n
