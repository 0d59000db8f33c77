"""Delta ``_delta_log`` interop (B190): log replay, checkpoint
compaction, version time travel, partition-value injection, protocol
gating, and the read_asof dispatch."""

import json
import os

import pytest

from kinesis2elastic_spark.sources import delta_log as dl


def _mk(spark, rows, schema="k long, g string, v double"):
    return spark.createDataFrame(rows, schema)


def _keys(df):
    return sorted(r.k for r in df.collect())


def test_log_replay_add_remove_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = dl.delta_append(spark, t, _mk(spark, [(i, "a", 1.0) for i in range(5)]))
    v1 = dl.delta_append(spark, t, _mk(spark, [(i, "b", 2.0) for i in range(5, 9)]))
    assert (v0, v1) == (0, 1)
    assert _keys(dl.read_delta(spark, t)) == list(range(9))
    # remove v0's files (by path prefix of the commit subdir)
    v2 = dl.delta_remove_where(t, lambda a: a["path"].startswith("part-c00000"))
    assert v2 == 2
    assert _keys(dl.read_delta(spark, t)) == list(range(5, 9))
    # time travel: every version reconstructs its own state
    assert _keys(dl.read_delta(spark, t, version=0)) == list(range(5))
    assert _keys(dl.read_delta(spark, t, version=1)) == list(range(9))
    assert _keys(dl.read_delta(spark, t, version=2)) == list(range(5, 9))
    # snapshot is metadata-only and reports the resolved version
    assert dl.delta_snapshot(t, 1)["version"] == 1
    assert dl.delta_snapshot(t)["version"] == 2


def test_checkpoint_compaction_and_log_cleanup(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
    dl.delta_append(spark, t, _mk(spark, [(3, "b", 3.0)]))
    dl.delta_remove_where(t, lambda a: a["path"].startswith("part-c00001"))
    ck = dl.delta_checkpoint(t)
    assert ck == 2
    n = dl.expire_delta_log(t, before_version=ck)
    assert n == 2  # 0.json and 1.json gone; 2.json kept
    snap = dl.delta_snapshot(t)
    assert snap["checkpoint_used"] is True
    assert _keys(dl.read_delta(spark, t)) == [1, 2]
    # post-checkpoint commits still apply on top of the checkpoint seed
    dl.delta_append(spark, t, _mk(spark, [(9, "c", 9.0)]))
    assert _keys(dl.read_delta(spark, t)) == [1, 2, 9]
    # versions below the cleaned log are honestly unreadable
    with pytest.raises(ValueError, match="predates the log|gap"):
        dl.delta_snapshot(t, 0)


def test_partition_values_injected_typed(spark, tmp_path):
    """Partition columns are absent from the data files; the reader
    injects them from partitionValues, cast through the declared
    schema (incl. a null partition and a URL-encodable value)."""
    t = str(tmp_path / "t")
    df = _mk(
        spark,
        [(1, "x y", 1.0), (2, None, 2.0), (3, "x y", 3.0), (4, "z", 4.0)],
    )
    dl.delta_append(spark, t, df, partition_by=["g"])
    # the physical files really lack the partition column
    snap = dl.delta_snapshot(t)
    import pyarrow.parquet as pq

    assert all(
        "g" not in pq.read_schema(f["path"]).names for f in snap["files"]
    )
    got = dl.read_delta(spark, t)
    assert dict(got.dtypes)["g"] == "string"
    assert {(r.k, r.g) for r in got.collect()} == {
        (1, "x y"),
        (2, None),
        (3, "x y"),
        (4, "z"),
    }
    # typed (non-string) partition column round-trips through the cast
    t2 = str(tmp_path / "t2")
    dl.delta_append(
        spark,
        t2,
        spark.createDataFrame([(1, 10, 1.0), (2, 20, 2.0)], "k long, b long, v double"),
        partition_by=["b"],
    )
    got2 = dl.read_delta(spark, t2)
    assert dict(got2.dtypes)["b"] == "bigint"
    assert {(r.k, r.b) for r in got2.collect()} == {(1, 10), (2, 20)}


def test_protocol_gate_fails_loud(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    # v2 with identity mapping (mode none) reads fine (r13: column
    # mapping 'name' mode is supported; see the dedicated test)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2}}) + "\n")
    assert dl.delta_snapshot(t)["version"] == 1
    # v4 without readerFeatures: unknown capability, loud
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 4}}) + "\n")
    with pytest.raises(NotImplementedError, match="protocol v4"):
        dl.delta_snapshot(t)
    # v3 with deletionVectors: SUPPORTED since B198 (r14) — reads fine
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["deletionVectors"],
                    }
                }
            )
            + "\n"
        )
    assert dl.delta_snapshot(t)["version"] == 1
    # ... but an unknown v3 feature still refuses loudly
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        dl.delta_snapshot(t)


def test_read_asof_dispatches_to_delta(spark, tmp_path):
    """timetravel.read_asof on a dir holding a _delta_log reads through
    the interop path, including version time travel."""
    from kinesis2elastic_spark.operators import timetravel as tt

    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    dl.delta_append(spark, t, _mk(spark, [(2, "b", 2.0)]))
    assert _keys(tt.read_asof(spark, t)) == [1, 2]
    assert _keys(tt.read_asof(spark, t, 0)) == [1]


def test_empty_or_missing_log_fails_loud(spark, tmp_path):
    with pytest.raises(ValueError, match="not a delta table"):
        dl.delta_snapshot(str(tmp_path / "nope"))
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    with pytest.raises(ValueError, match="empty delta log"):
        dl.delta_snapshot(t)


# ---------------------------------------------------------------- iceberg


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B test vectors: the bucket hash must be
    murmur3_x86_32 over the spec's serialized form (ints/longs as
    8-byte little-endian, strings as UTF-8) — an md5 bucket would
    silently mis-prune real tables."""
    import struct

    from kinesis2elastic_spark.sources.iceberg_meta import (
        iceberg_bucket,
        murmur3_32,
    )

    assert murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_32("iceberg".encode()) == 1210000089
    assert iceberg_bucket(34, 16) == 2017239379 % 16
    assert iceberg_bucket(None, 16) is None
    assert iceberg_bucket(1.5, 16) is None  # unsupported probe: scan


def test_avro_ocf_roundtrip_and_deflate():
    import tempfile
    import zlib

    from kinesis2elastic_spark.sources import avro_ocf as av

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "double"}},
            {"name": "e", "type": "boolean"},
        ],
    }
    recs = [
        {"a": -1, "b": None, "c": [1, -2, 3], "d": {"x": 0.5}, "e": True},
        {"a": 2**62, "b": "héllo", "c": [], "d": {}, "e": False},
    ]
    p = tempfile.mktemp(suffix=".avro")
    av.write_ocf(p, schema, recs)
    s2, got = av.read_ocf(p)
    assert got == recs
    # deflate-codec files decode too (read-side parity with real writers)
    raw = open(p, "rb").read()
    body = raw.split(b"null", 1)
    # re-write by hand with deflate codec
    import io, json as _json

    from kinesis2elastic_spark.sources.avro_ocf import (
        _MAGIC,
        _enc_bytes,
        _enc_str,
        _encode,
        _register,
        _zigzag,
    )

    names = {}
    _register(schema, names)
    payload = b"".join(_encode(r_, schema, names) for r_ in recs)
    comp = zlib.compress(payload)[2:-4]  # raw deflate
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(_zigzag(2))
    buf.write(_enc_str("avro.schema"))
    buf.write(_enc_bytes(_json.dumps(schema).encode()))
    buf.write(_enc_str("avro.codec"))
    buf.write(_enc_bytes(b"deflate"))
    buf.write(_zigzag(0))
    buf.write(b"S" * 16)
    buf.write(_zigzag(len(recs)))
    buf.write(_zigzag(len(comp)))
    buf.write(comp)
    buf.write(b"S" * 16)
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    _s, got2 = av.read_ocf(p)
    assert got2 == recs


def test_iceberg_spec_evolution_prune_and_travel(spark, tmp_path):
    """Two spec generations coexist: files prune under the spec they
    were written with (B173's per-spec split planning, murmur3 bucket);
    snapshot-id time travel; file-level delete; pruning never wrong."""
    import datetime

    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    rows = [
        (i, datetime.date(2024, 1 + i % 3, 1 + i % 5), i % 10, float(i))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "k long, d date, u long, v double")
    s1 = im.iceberg_append(spark, t, df.filter("k % 2 = 0"), spec=[("d", "month")])
    s2 = im.iceberg_append(
        spark, t, df.filter("k % 2 = 1"), spec=[("d", "month"), ("u", "bucket[4]")]
    )
    assert im.read_iceberg(spark, t).count() == 120
    assert im.read_iceberg(spark, t, snapshot_id=s1).count() == 60
    # prune: month + bucket; old-spec files prune by month only
    f = [
        ("d", "between", (datetime.date(2024, 2, 1), datetime.date(2024, 2, 28))),
        ("u", "=", 7),
    ]
    kept, total = im.iceberg_prune(t, f)
    assert 0 < len(kept) < total
    got = sorted(r.k for r in im.read_iceberg(spark, t, filters=f).collect())
    want = sorted(i for i in range(120) if (1 + i % 3) == 2 and i % 10 == 7)
    assert got == want and got
    # no false negative over present keys: every (month,u) row reachable
    for probe_u in (0, 3, 7):
        fp = [("u", "=", probe_u)]
        got_u = im.read_iceberg(spark, t, filters=fp).count()
        assert got_u == sum(1 for i in range(120) if i % 10 == probe_u)
    # delete one month partition across BOTH specs
    im.iceberg_delete_files(
        t, lambda fd: fd["partition"].get("d_month") == "2024-03"
    )
    left = {r.k for r in im.read_iceberg(spark, t).collect()}
    assert left == {i for i in range(120) if (1 + i % 3) != 3}
    # pre-delete snapshots still readable (metadata retains history)
    assert im.read_iceberg(spark, t, snapshot_id=s2).count() == 120
    with pytest.raises(ValueError, match="unknown snapshot-id"):
        im.iceberg_snapshot(t, snapshot_id=999)


def test_iceberg_data_files_contain_all_columns(spark, tmp_path):
    """Unlike Delta/Hive, Iceberg data files retain the partition
    source columns — the read is one plain scan, no value injection."""
    import datetime

    import pyarrow.parquet as pq

    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 5, 1.0)], "k long, d date, u long, v double"
    )
    im.iceberg_append(spark, t, df, spec=[("d", "day"), ("u", "bucket[4]")])
    snap = im.iceberg_snapshot(t)
    for f in snap["files"]:
        names = pq.read_schema(f["path"]).names
        assert "d" in names and "u" in names and not any(
            c.startswith("__ipt_") for c in names
        )


def test_read_asof_dispatches_to_iceberg(spark, tmp_path):
    from kinesis2elastic_spark.operators import timetravel as tt
    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a")], "k long, s string")
    df2 = spark.createDataFrame([(2, "b")], "k long, s string")
    s1 = im.iceberg_append(spark, t, df1)
    im.iceberg_append(spark, t, df2)
    assert sorted(r.k for r in tt.read_asof(spark, t).collect()) == [1, 2]
    assert sorted(r.k for r in tt.read_asof(spark, t, s1).collect()) == [1]


def test_iceberg_v2_merge_on_read_deletes(spark, tmp_path):
    """Iceberg v2 MOR: position deletes remove exact rows, equality
    deletes remove keys but only from data with a STRICTLY lower
    sequence number (re-inserted keys survive), both survive appends
    and snapshot time travel; file-level rewrite over a MOR table
    refuses instead of resurrecting rows."""
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)], "k long, g long, v double"
    )
    s1 = im.iceberg_append(spark, t, df)
    # position-delete rows k in {3, 17, 41}
    s2 = im.iceberg_positional_delete(spark, t, F.col("k").isin(3, 17, 41))
    got = {r.k for r in im.read_iceberg(spark, t).collect()}
    assert got == set(range(50)) - {3, 17, 41}
    # time travel to the pre-delete snapshot still sees everything
    assert len(im.read_iceberg(spark, t, snapshot_id=s1).collect()) == 50
    # equality-delete g = 2 (removes 10 rows minus the pos-deleted 17)
    im.iceberg_equality_delete(
        spark, t, spark.createDataFrame([(2,)], "g long"), ["g"]
    )
    got2 = {r.k for r in im.read_iceberg(spark, t).collect()}
    assert got2 == {k for k in range(50) if k % 5 != 2} - {3, 41}
    # re-insert two g=2 rows AFTER the delete: they must survive
    im.iceberg_append(
        spark, t, spark.createDataFrame([(100, 2, 1.0), (101, 2, 2.0)], "k long, g long, v double")
    )
    got3 = {r.k for r in im.read_iceberg(spark, t).collect()}
    assert got3 == got2 | {100, 101}
    # pos-deleted rows stay dead across the append too
    assert 3 not in got3 and 17 not in got3
    # file-level rewrite over live deletes: loud refusal
    with pytest.raises(NotImplementedError, match="resurrect"):
        im.iceberg_delete_files(t, lambda fd: True)


def test_export_delta_log_metadata_only(spark, tmp_path):
    """B196: snapshot-protocol history exports as a Delta log without
    copying data; every original version maps to a Delta version with
    identical content; MOR debt and double-export refuse loudly."""
    import glob

    from kinesis2elastic_spark.operators import timetravel as tt

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tt.commit_snapshot(spark, src, _mk(spark, [(1, "a", 1.0), (2, "a", 2.0)]), 0)
    tt.commit_snapshot(spark, src, _mk(spark, [(3, "b", 3.0)]), 1)
    tt.optimize_snapshot(spark, src, 2, target_bytes=1 << 14)  # rewrite
    n = dl.export_delta_log(spark, src, dst)
    assert n == 3
    # no data parquet under dst (metadata-only)
    assert not [
        f
        for f in glob.glob(dst + "/**/*.parquet", recursive=True)
        if "_delta_log" not in f
    ]
    # per-version content equality incl. across the optimize rewrite
    for dv, v in enumerate([0, 1, 2]):
        want = sorted(r.k for r in tt.read_asof(spark, src, v).collect())
        got = _keys(dl.read_delta(spark, dst, version=dv))
        assert got == want
    # numRecords stats survived into the add actions
    snap = dl.delta_snapshot(dst)
    assert all(
        json.loads(f["stats"])["numRecords"] > 0 for f in snap["files"]
    )
    # refuse a second export into the same log
    with pytest.raises(ValueError, match="already has a _delta_log"):
        dl.export_delta_log(spark, src, dst)
    # refuse merge-on-read debt
    tt.commit_delete(spark, src, spark.createDataFrame([(3,)], "k long"), 3)
    with pytest.raises(ValueError, match="OPTIMIZE first"):
        dl.export_delta_log(spark, src, str(tmp_path / "dst2"))


def test_delta_prune_partition_and_stats(spark, tmp_path):
    """B197: delta reads skip files at metadata rate — by identity
    partitionValues and by per-file stats minValues/maxValues — with
    the residual filter keeping results exact; undecidable filters
    scan (never a false negative)."""
    t = str(tmp_path / "t")
    rows = [(i, f"g{i % 4}", float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    # partitioned by g, stats on k: both pruning axes live
    dl.delta_append(
        spark, t, df.repartition(4, "k"), partition_by=["g"], collect_stats=True
    )
    dl.delta_append(
        spark,
        t,
        spark.createDataFrame([(1000, "g9", 1.0)], "k long, g string, v double"),
        partition_by=["g"],
        collect_stats=True,
    )
    # partition pruning: one partition value
    kept, total = dl.delta_prune(t, [("g", "=", "g2")])
    assert 0 < len(kept) < total
    got = _keys(dl.read_delta(spark, t, filters=[("g", "=", "g2")]))
    assert got == [i for i in range(400) if i % 4 == 2]
    # stats pruning on the non-partition column
    kept2, total2 = dl.delta_prune(t, [("k", "=", 1000)])
    assert 0 < len(kept2) < total2
    assert _keys(dl.read_delta(spark, t, filters=[("k", "=", 1000)])) == [1000]
    # range filter across both axes
    f = [("k", "between", (100, 110)), ("g", "=", "g1")]
    got3 = _keys(dl.read_delta(spark, t, filters=f))
    assert got3 == [i for i in range(100, 111) if i % 4 == 1]
    # no false negative over every row (spot sweep)
    for probe in (0, 7, 399, 1000):
        assert _keys(dl.read_delta(spark, t, filters=[("k", "=", probe)])) == (
            [probe] if probe in {*range(400), 1000} else []
        )


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """Reader protocol v2 columnMapping 'name' mode: data files carry
    PHYSICAL column names (col-uuid style); the reader renames them to
    the logical schema, partitionValues stay keyed physically, and
    pruning works on logical filters; 'id' mode still refuses."""
    t = str(tmp_path / "t")
    os.makedirs(t)
    # physical files: columns phys_k, phys_v; partition dir phys_g
    df = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "a")],
        "phys_k long, phys_v double, phys_g string",
    )
    df.write.partitionBy("phys_g").parquet(t + "/files")
    import glob

    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "phys_k",
                          "delta.columnMapping.id": 1}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "phys_v",
                          "delta.columnMapping.id": 2}},
            {"name": "g", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "phys_g",
                          "delta.columnMapping.id": 3}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "m1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["g"],
            "configuration": {"delta.columnMapping.mode": "name"},
        }},
    ]
    for p in sorted(glob.glob(t + "/files/phys_g=*/*.parquet")):
        rel = os.path.relpath(p, t)
        gval = rel.split("phys_g=")[1].split("/")[0]
        actions.append({"add": {
            "path": rel, "partitionValues": {"phys_g": gval},
            "size": os.path.getsize(p), "modificationTime": 0,
            "dataChange": True,
        }})
    os.makedirs(t + "/_delta_log")
    with open(t + f"/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")

    got = dl.read_delta(spark, t)
    assert got.columns == ["k", "v", "g"]
    assert {(r.k, r.g) for r in got.collect()} == {(1, "a"), (2, "b"), (3, "a")}
    # logical-name pruning reaches the physical partitionValues
    kept, total = dl.delta_prune(t, [("g", "=", "a")])
    assert 0 < len(kept) < total
    assert _keys(
        dl.read_delta(spark, t, filters=[("g", "=", "a")]).selectExpr("k as k")
    ) == [1, 3]
    # id mode refuses
    with open(t + f"/_delta_log/{1:020d}.json", "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "m1", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": ["g"],
            "configuration": {"delta.columnMapping.mode": "id"},
        }}) + "\n")
    with pytest.raises(NotImplementedError, match="'id' not supported"):
        dl.delta_snapshot(t)


def test_delta_prune_date_grain_probes(spark, tmp_path):
    """r13 advice (high): a date/datetime probe against Delta's STRING
    partitionValues must compare at datetime grain — raw str() ranked
    '1998-01-01 00:00:00' above '1998-01-01' and pruned the exactly-
    matching file.  Undecidable pairs scan; results stay exact."""
    import datetime as dt

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, dt.date(1998, 1, 1 + i % 3), float(i)) for i in range(30)],
        "k long, d date, v double",
    )
    dl.delta_append(spark, t, df, partition_by=["d"])
    # the repo's own probe idiom (cf. q_iceberg_read): datetime at
    # midnight against a date-partitioned column — must keep the file
    for probe in (dt.datetime(1998, 1, 2), dt.date(1998, 1, 2)):
        kept, total = dl.delta_prune(t, [("d", "=", probe)])
        assert 0 < len(kept) < total
        got = _keys(dl.read_delta(spark, t, filters=[("d", "=", probe)]))
        assert got == [i for i in range(30) if i % 3 == 1]
    # range probes at date grain
    got = _keys(
        dl.read_delta(
            spark, t, filters=[("d", "<=", dt.datetime(1998, 1, 2, 12))]
        )
    )
    assert got == [i for i in range(30) if i % 3 in (0, 1)]
    got = _keys(
        dl.read_delta(
            spark,
            t,
            filters=[
                ("d", "between", (dt.date(1998, 1, 2), dt.date(1998, 1, 3)))
            ],
        )
    )
    assert got == [i for i in range(30) if i % 3 in (1, 2)]
    # no-match probe still prunes everything without error
    assert (
        _keys(dl.read_delta(spark, t, filters=[("d", "=", dt.date(2001, 1, 1))]))
        == []
    )
    # tz-aware probe: undecidable → full scan, exact result via residual
    aware = dt.datetime(1998, 1, 2, tzinfo=dt.timezone.utc)
    kept, total = dl.delta_prune(t, [("d", "<", aware)])
    assert len(kept) == total


def test_delta_version_beyond_latest_raises(spark, tmp_path):
    """r13 advice (medium): time travel to a version above the log is a
    mistyped / not-yet-replicated request — raise like delta-spark does
    instead of silently serving the latest."""
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    dl.delta_append(spark, t, _mk(spark, [(2, "b", 2.0)]))
    with pytest.raises(ValueError, match="beyond the latest"):
        dl.delta_snapshot(t, 5)
    with pytest.raises(ValueError, match="beyond the latest"):
        dl.read_delta(spark, t, version=3)
    assert dl.delta_snapshot(t, 1)["version"] == 1


def test_checkpoint_preserves_configuration_and_stats(spark, tmp_path):
    """r13 advice (low): checkpoint compaction must carry
    metaData.configuration (columnMapping mode gates the protocol) and
    per-file stats (B197 skipping) — not silently erase them."""
    t = str(tmp_path / "t")
    rows = [(i, f"g{i % 4}", float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    dl.delta_append(spark, t, df.repartition(4, "k"), collect_stats=True)
    before_kept, total = dl.delta_prune(t, [("k", "=", 7)])
    assert 0 < len(before_kept) < total
    ck = dl.delta_checkpoint(t)
    dl.expire_delta_log(t, before_version=ck + 1)
    snap = dl.delta_snapshot(t)
    assert snap["checkpoint_used"] is True
    # stats survived compaction: pruning is as sharp as pre-checkpoint
    after_kept, total2 = dl.delta_prune(t, [("k", "=", 7)])
    assert sorted(after_kept) == sorted(before_kept) and total2 == total
    assert _keys(dl.read_delta(spark, t, filters=[("k", "=", 7)])) == [7]
    # configuration survives: a columnMapping 'name' table keeps its
    # mode through a checkpoint (previously read back 'none')
    with open(os.path.join(t, "_delta_log", f"{ck + 1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "metaData": dict(
                        snap["metadata"],
                        configuration={"delta.columnMapping.mode": "name"},
                    )
                }
            )
            + "\n"
        )
    ck2 = dl.delta_checkpoint(t)
    dl.expire_delta_log(t, before_version=ck2 + 1)
    snap2 = dl.delta_snapshot(t)
    assert snap2["checkpoint_used"] is True
    assert snap2["column_mapping"] == "name"


def test_export_delta_log_schema_drift(spark, tmp_path):
    """r13 advice (low): export must emit a fresh metaData action when
    the snapshot-protocol schema changed between versions (replace
    commits), and refuse loudly when ONE snapshot mixes schemas."""
    from kinesis2elastic_spark.operators import timetravel as tt

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tt.commit_snapshot(
        spark, src, _mk(spark, [(1, "a", 1.0)]), 0, carry_forward=False
    )
    # v1 REPLACES with a widened schema (extra column w)
    df2 = spark.createDataFrame(
        [(2, "b", 2.0, 9), (3, "b", 3.0, 9)], "k long, g string, v double, w long"
    )
    tt.commit_snapshot(spark, src, df2, 1, carry_forward=False)
    assert dl.export_delta_log(spark, src, dst) == 2
    v0 = dl.read_delta(spark, dst, version=0)
    v1 = dl.read_delta(spark, dst, version=1)
    assert v0.columns == ["k", "g", "v"]
    assert v1.columns == ["k", "g", "v", "w"]
    assert _keys(v0) == [1] and _keys(v1) == [2, 3]
    assert {r.w for r in v1.collect()} == {9}
    # APPEND of a different schema → one snapshot mixes files: refuse
    src2 = str(tmp_path / "src2")
    tt.commit_snapshot(spark, src2, _mk(spark, [(1, "a", 1.0)]), 0)
    tt.commit_snapshot(spark, src2, df2, 1)  # carry_forward append
    with pytest.raises(ValueError, match="mixes"):
        dl.export_delta_log(spark, src2, str(tmp_path / "dst2"))


def test_iceberg_equality_ids_resolution(spark, tmp_path):
    """r13 advice (low): real Iceberg v2 manifests carry equality_ids
    (field ids), not names — the reader resolves them through the table
    schemas; an id missing from every schema, or a delete entry with
    neither ids nor names, refuses loudly instead of an opaque
    IndexError."""
    from kinesis2elastic_spark.sources import avro_ocf as av
    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)], "k long, g long, v double"
    )
    im.iceberg_append(spark, t, df)
    # spec-shaped delete: field ids only (g is field id 2)
    im.iceberg_equality_delete(
        spark,
        t,
        spark.createDataFrame([(2,)], "g long"),
        ["g"],
        write_field_ids=True,
    )
    snap = im.iceberg_snapshot(t)
    eq = [d for d in snap["deletes"] if d["kind"] == "eq"]
    assert eq and eq[0]["equality_cols"] == ["g"]
    got = {r.k for r in im.read_iceberg(spark, t).collect()}
    assert got == {k for k in range(50) if k % 5 != 2}
    # corrupt the delete manifest: unknown field id → loud refusal
    meta = im.load_metadata(t)
    mlist = im._resolve_snapshot(meta, None)["manifest-list"]
    _s, rows = av.read_ocf(mlist)
    del_manifest = [
        r["manifest_path"] for r in rows if int(r.get("content", 0)) == 1
    ][0]
    _s2, entries = av.read_ocf(del_manifest)
    entries[0]["data_file"]["equality_ids"] = [999]
    av.write_ocf(del_manifest, im._MANIFEST_SCHEMA, entries)
    with pytest.raises(NotImplementedError, match="field ids \\[999\\]"):
        im.iceberg_snapshot(t)
    # neither ids nor names → loud refusal, not IndexError
    entries[0]["data_file"]["equality_ids"] = None
    entries[0]["data_file"]["equality_cols"] = None
    av.write_ocf(del_manifest, im._MANIFEST_SCHEMA, entries)
    with pytest.raises(NotImplementedError, match="no equality_ids"):
        im.iceberg_snapshot(t)


# ------------------------------------------------------------ B198: DVs


def test_dv_codec_roundtrips():
    """Z85 + roaring portable + RoaringBitmapArray round-trips across
    every container type (array / bitmap / run) and 32-bit boundaries."""
    import random

    from kinesis2elastic_spark.sources import dvectors as dv

    assert dv.z85_decode(dv.z85_encode(bytes(range(16)))) == bytes(range(16))
    rnd = random.Random(11)
    cases = [
        [],
        [0],
        [2**32 - 1, 2**32, 2**33 + 5],                    # bitmap boundary
        sorted(rnd.sample(range(300000), 4000)),           # array containers
        sorted(set(rnd.sample(range(65536), 60000))),      # bitmap container
        list(range(1000, 90000)),                          # run containers
        sorted(set(rnd.sample(range(20000), 15000))) ,     # mixed density
    ]
    for c in cases:
        assert dv.deserialize_positions(dv.serialize_positions(c)) == sorted(
            set(c)
        )


def test_dv_sidecar_layout_and_corruption(tmp_path):
    """On-disk DV layout: version byte, BE size, CRC-32 — checksum and
    size mismatches fail loud; two DVs share one sidecar by offset."""
    import struct

    import pytest as _pytest

    from kinesis2elastic_spark.sources import dvectors as dv

    td = str(tmp_path)
    sc = dv.new_sidecar(td)
    d1 = dv.make_descriptor(td, list(range(500)), 8, sc)
    d2 = dv.make_descriptor(td, [7, 2**32 + 7], 8, sc)
    dv.flush_sidecar(sc)
    assert dv.decode_descriptor(td, d1) == list(range(500))
    assert dv.decode_descriptor(td, d2) == [7, 2**32 + 7]
    path = dv.dv_uuid_path(td, d1["pathOrInlineDv"])
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    assert raw[0] == dv.DV_FORMAT_VERSION
    (sz,) = struct.unpack_from(">i", raw, d1["offset"])
    assert sz == d1["sizeInBytes"]
    # flip one bitmap byte → CRC failure
    raw[d1["offset"] + 4] ^= 0xFF
    with open(path, "wb") as f:
        f.write(raw)
    with _pytest.raises(ValueError, match="checksum"):
        dv.decode_descriptor(td, d1)
    # descriptor cardinality lies → loud
    d3 = dv.make_descriptor(td, [1, 2, 3], 512)
    d3["cardinality"] = 99
    with _pytest.raises(ValueError, match="cardinality"):
        dv.decode_descriptor(td, d3)


def test_dv_uuid_path_prefix():
    from uuid import UUID

    from kinesis2elastic_spark.sources import dvectors as dv

    u = UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = dv.z85_encode(u.bytes)
    assert dv.dv_uuid_path("/t", "ab/" + enc) == (
        f"/t/ab/deletion_vector_{u}.bin"
    )
    assert dv.dv_uuid_path("/t", enc) == f"/t/deletion_vector_{u}.bin"


def test_delta_delete_where_row_level(spark, tmp_path):
    """DV delete: row-level semantics, merge-on-second-delete, time
    travel, and replay through a checkpoint (descriptor carried)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(40)]),
        partition_by=["g"],
    )
    v1 = dl.delta_delete_where(spark, t, F.col("k") % 5 == 0)
    assert _keys(dl.read_delta(spark, t)) == [
        i for i in range(40) if i % 5
    ]
    # second delete MERGES into the existing DVs (pred over partition col)
    dl.delta_delete_where(
        spark, t, (F.col("k") % 5 == 1) & (F.col("g") == "a")
    )
    expect = [i for i in range(40) if i % 5 and not (i % 5 == 1 and i % 2)]
    assert _keys(dl.read_delta(spark, t)) == expect
    # travel: v0 = pre-delete, v1 = first delete only
    assert _keys(dl.read_delta(spark, t, version=0)) == list(range(40))
    assert _keys(dl.read_delta(spark, t, version=v1)) == [
        i for i in range(40) if i % 5
    ]
    # protocol upgraded with the table feature
    proto = dl.delta_snapshot(t)["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    # checkpoint + expire: DV descriptors and features survive compaction
    cv = dl.delta_checkpoint(t)
    assert dl.expire_delta_log(t, before_version=cv) > 0
    snap = dl.delta_snapshot(t)
    assert snap["checkpoint_used"]
    assert "deletionVectors" in snap["protocol"]["readerFeatures"]
    assert any(f.get("deletionVector") for f in snap["files"])
    assert _keys(dl.read_delta(spark, t)) == expect


def test_delta_delete_where_inline_and_filters(spark, tmp_path):
    """Inline ('i') DVs round-trip through the log; B197 file skipping
    composes with DV application (pruned-or-not, reads stay exact)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, chr(97 + i % 3), float(i)) for i in range(30)]),
        partition_by=["g"],
        collect_stats=True,
    )
    dl.delta_delete_where(spark, t, F.col("k") < 6, inline_max_bytes=1 << 16)
    snap = dl.delta_snapshot(t)
    dvs = [f["deletionVector"] for f in snap["files"] if f.get("deletionVector")]
    assert dvs and all(d["storageType"] == "i" for d in dvs)
    got = _keys(dl.read_delta(spark, t, filters=[("g", "=", "a")]))
    assert got == [i for i in range(6, 30) if i % 3 == 0]
    # no rows match → loud
    with pytest.raises(ValueError, match="matched no live rows"):
        dl.delta_delete_where(spark, t, F.col("k") > 10**9)


def test_protocol_gate_still_refuses_unknown_v3_features(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors", "v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        dl.read_delta(spark, t)


# ------------------------------------------------- B199: iceberg export


def test_export_iceberg_meta_with_mor_debt(spark, tmp_path):
    """Timetravel -> Iceberg export carries equality AND position
    deletes as real v2 delete manifests; re-inserted keys survive the
    sequence rule; both travel modes work on the export."""
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.operators import timetravel as tt
    from kinesis2elastic_spark.sources import iceberg_meta as im

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 6).alias("g")
    )
    tt.commit_snapshot(spark, src, df.filter("k < 30"), 0)
    tt.commit_snapshot(spark, src, df.filter("k >= 30"), 1)
    tt.commit_delete(spark, src, df.filter("g = 2").select("g"), 2)
    paths = [
        e["path"] for e in tt.manifest_entries(src, 2) if e["kind"] == "data"
    ]
    pairs = (
        spark.read.parquet(*paths)
        .select(
            "k",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:", ""
            ).alias("file_path"),
            F.col("_metadata.row_index").cast("long").alias("row_index"),
        )
        .filter(F.col("k").isin(7, 8))
        .select("file_path", "row_index")
    )
    tt.commit_positional_delete(spark, src, pairs, 3)
    tt.commit_snapshot(spark, src, df.filter("g = 2 AND k >= 50"), 4)
    assert im.export_iceberg_meta(spark, src, dst) == 5
    exp = sorted(
        (set(range(60)) - {k for k in range(60) if k % 6 == 2} - {7, 8})
        | {k for k in range(60) if k % 6 == 2 and k >= 50}
    )
    assert sorted(r.k for r in im.read_iceberg(spark, dst).collect()) == exp
    # snapshot travel: s2 = equality delete only
    assert sorted(
        r.k for r in im.read_iceberg(spark, dst, snapshot_id=2).collect()
    ) == [k for k in range(60) if k % 6 != 2]
    # metadata-version travel: v1 metadata = first snapshot
    assert sorted(
        r.k for r in im.read_iceberg(spark, dst, metadata_version=1).collect()
    ) == list(range(30))
    # delete manifests carry schema-resolved equality ids
    snap = im.iceberg_snapshot(dst)
    eq = [d for d in snap["deletes"] if d["kind"] == "eq"]
    assert eq and eq[0]["equality_cols"] == ["g"]
    # double export refuses
    with pytest.raises(ValueError, match="already"):
        im.export_iceberg_meta(spark, src, dst)


def test_export_iceberg_meta_refuses_schema_drift(spark, tmp_path):
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.operators import timetravel as tt
    from kinesis2elastic_spark.sources import iceberg_meta as im

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    tt.commit_snapshot(spark, src, df, 0)
    tt.commit_snapshot(
        spark,
        src,
        df.withColumn("extra", F.lit("x")),
        1,
        carry_forward=False,
    )
    with pytest.raises(ValueError, match="drifts|mixes"):
        im.export_iceberg_meta(spark, src, dst)


# ----------------------------------------------------- B203: CDF derive


def test_delta_changes_dv_diff_and_revive(spark, tmp_path):
    """CDF from log replay: DV-growth deletes report ONLY newly-dead
    positions; a hand-rolled DV shrink (RESTORE) reports revived rows
    as inserts; removed files report live-rows-as-of-prior (their DV
    applied, no double-report)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(20)]),
        partition_by=["g"],
    )
    dl.delta_delete_where(spark, t, F.col("k") < 5)          # v1: DV delete
    dl.delta_delete_where(spark, t, F.col("k").isin(5, 6))   # v2: DV grows
    ch = dl.delta_changes(spark, t, 0)
    got = sorted(
        (r._commit_version, r._change_type, r.k) for r in ch.collect()
    )
    assert got == sorted(
        [(1, "delete", k) for k in range(5)]
        + [(2, "delete", 5), (2, "delete", 6)]
    )
    # RESTORE: rewrite v2's DVs back to v1's state (shrink) as v3
    snap1 = dl.delta_snapshot(t, 1)
    v1_dv = {
        os.path.relpath(f["path"], t): f["deletionVector"]
        for f in snap1["files"]
        if f.get("deletionVector")
    }
    snap2 = dl.delta_snapshot(t)
    actions = []
    for f in snap2["files"]:
        rel = os.path.relpath(f["path"], t)
        want = v1_dv.get(rel)
        if f.get("deletionVector") != want:
            actions.append({"remove": {"path": rel, "dataChange": True}})
            add = {
                "path": rel,
                "partitionValues": f["partitionValues"],
                "size": f["size"],
                "modificationTime": 0,
                "dataChange": True,
            }
            if want:
                add["deletionVector"] = want
            actions.append({"add": add})
    assert actions  # v2 touched at least one file's DV state
    dl._write_commit(t, 3, actions)
    revived = sorted(
        r.k
        for r in dl.delta_changes(spark, t, 2).collect()
        if r._change_type == "insert"
    )
    assert revived == [5, 6]
    # file-level remove after DV deletes: only live rows report
    dl.delta_remove_where(t, lambda a: a["partitionValues"].get("g") == "b")
    last = dl.delta_changes(spark, t, 3)
    dels = sorted(r.k for r in last.collect() if r._change_type == "delete")
    # g='b' = even keys; live as of v3 = k >= 5 (restore revived 5, 6)
    assert dels == [k for k in range(20) if k % 2 == 0 and k >= 5]
    # empty range
    assert dl.delta_changes(spark, t, 4).count() == 0
    with pytest.raises(ValueError, match="beyond"):
        dl.delta_changes(spark, t, 9)


# --------------------------------------------------------- B204: vacuum


def test_vacuum_delta_keeps_referenced_dvs(spark, tmp_path):
    """VACUUM deletes only unreferenced data files; DV sidecars
    referenced by retained snapshots survive; retained reads stay
    exact; dry_run lists without deleting."""
    import glob as _glob

    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(30)]),
        partition_by=["g"],
    )
    # row-level delete with an on-disk DV sidecar
    dl.delta_delete_where(spark, t, F.col("k") < 4, inline_max_bytes=0)
    # rewrite: file-level remove of partition 'b', re-append its live rows
    live_b = dl.read_delta(spark, t).filter("g = 'b'")
    rows_b = [(r.k, r.g, r.v) for r in live_b.collect()]
    dl.delta_remove_where(t, lambda a: a["partitionValues"].get("g") == "b")
    dl.delta_append(spark, t, _mk(spark, rows_b), partition_by=["g"])
    expect = sorted(
        r.k for r in dl.read_delta(spark, t).collect()
    )
    # dry run lists the replaced 'b' files but deletes nothing
    listed = dl.vacuum_delta(t, retain_versions=1, dry_run=True)
    assert listed and all(os.path.exists(p) for p in listed)
    assert all("/g=b/" in p for p in listed if p.endswith(".parquet"))
    victims = dl.vacuum_delta(t, retain_versions=1)
    assert victims == listed
    assert not any(os.path.exists(p) for p in victims)
    # the retained snapshot still reads exactly; its DV sidecar survived
    assert sorted(r.k for r in dl.read_delta(spark, t).collect()) == expect
    sidecars = _glob.glob(os.path.join(t, "deletion_vector_*.bin"))
    assert sidecars  # referenced by the live 'a' files
    # guard rails
    with pytest.raises(ValueError, match="retain"):
        dl.vacuum_delta(t, retain_versions=0)


def test_vacuum_delta_retain_two_versions(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    dl.delta_append(spark, t, _mk(spark, [(2, "a", 2.0)]))
    dl.delta_remove_where(t, lambda a: a["path"].startswith("part-c00000"))
    # retaining 2 versions (v2 and v1) keeps v0's file (live at v1)
    assert dl.vacuum_delta(t, retain_versions=2) == []
    # retaining only v2 deletes it
    victims = dl.vacuum_delta(t, retain_versions=1)
    assert victims and all("part-c00000" in p for p in victims)
    assert _keys(dl.read_delta(spark, t)) == [2]


# ------------------------------------------------------- B206: optimize


def test_optimize_delta_retires_dv_debt(spark, tmp_path):
    """OPTIMIZE folds deletion vectors into a compacted rewrite as one
    atomic commit: live rows unchanged, DVs gone, per-file stats
    restored, partition pruning preserved, and time travel below the
    rewrite still sees the DV'd state."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(40)]),
        partition_by=["g"],
        collect_stats=True,
    )
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(40, 60)]),
        partition_by=["g"],
        collect_stats=True,
    )
    dl.delta_delete_where(spark, t, F.col("k") % 5 == 0)
    expect = [i for i in range(60) if i % 5]
    n_files_before = len(dl.delta_snapshot(t)["files"])
    res = dl.optimize_delta(spark, t)
    assert res["files_removed"] == n_files_before
    assert res["files_added"] == 2  # one per partition tuple
    assert res["dv_cardinality_retired"] == 12
    snap = dl.delta_snapshot(t)
    assert not any(f.get("deletionVector") for f in snap["files"])
    assert all(f.get("stats") for f in snap["files"])
    assert _keys(dl.read_delta(spark, t)) == expect
    # partition pruning still exact on the rewritten layout
    got = _keys(dl.read_delta(spark, t, filters=[("g", "=", "a")]))
    assert got == [i for i in expect if i % 2 == 1]
    # travel below the rewrite: DV'd state intact
    assert _keys(dl.read_delta(spark, t, version=res["version"] - 1)) == expect
    assert _keys(dl.read_delta(spark, t, version=1)) == list(range(60))


def test_optimize_delta_invisible_to_cdf(spark, tmp_path):
    """delta_changes skips the dataChange=false rewrite — no phantom
    delete+insert pairs — while real changes around it still report."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(i, "a", 1.0) for i in range(10)]))
    dl.delta_delete_where(spark, t, F.col("k") == 0)      # v1: real delete
    dl.optimize_delta(spark, t)                            # v2: compaction
    dl.delta_append(spark, t, _mk(spark, [(99, "a", 9.0)]))  # v3: insert
    ch = dl.delta_changes(spark, t, 0)
    got = sorted((r._commit_version, r._change_type, r.k) for r in ch.collect())
    assert got == [(1, "delete", 0), (3, "insert", 99)]


# --------------------------------------------- B207: iceberg lifecycle


def test_iceberg_expire_and_vacuum(spark, tmp_path):
    """expireSnapshots shrinks the snapshot list (travel to expired ids
    fails loud); the orphan sweep then deletes exactly the files only
    expired snapshots referenced, and retained reads stay exact."""
    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "k long, g long"
    )
    s1 = im.iceberg_append(spark, t, df.filter("k < 10"))
    s2 = im.iceberg_append(spark, t, df.filter("k >= 10 AND k < 20"))
    s3 = im.iceberg_append(spark, t, df.filter("k >= 20"))
    # file-level delete makes s1's file unreferenced by the final state
    im.iceberg_delete_files(t, lambda f: f["path"].endswith(".parquet") and "/s00001/" in f["path"])
    expired = im.expire_iceberg_snapshots(t, retain=1)
    assert set(expired) == {s1, s2, s3}
    with pytest.raises(ValueError, match="expired|unknown"):
        im.read_iceberg(spark, t, snapshot_id=s1)
    keep_rows = sorted(
        r.k for r in im.read_iceberg(spark, t).collect()
    )
    listed = im.vacuum_iceberg(t, dry_run=True)
    assert listed and all(os.path.exists(p) for p in listed)
    victims = im.vacuum_iceberg(t)
    assert victims == listed
    assert not any(os.path.exists(p) for p in victims)
    # s1's data files are gone, retained read unchanged
    assert any("/s00001/" in p for p in victims)
    assert sorted(r.k for r in im.read_iceberg(spark, t).collect()) == keep_rows
    # guard rails
    with pytest.raises(ValueError, match="retain"):
        im.expire_iceberg_snapshots(t, retain=0)


# ----------------------------------- B209/B210: ts travel + evolution


def test_delta_timestamp_travel(spark, tmp_path):
    """TIMESTAMP AS OF: inCommitTimestamp honored first, file mtime as
    the fallback; pre-history timestamps fail loud."""
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0)]))
    dl.delta_append(spark, t, _mk(spark, [(2, "a", 2.0)]))
    dl.delta_append(spark, t, _mk(spark, [(3, "a", 3.0)]))
    log = os.path.join(t, "_delta_log")
    # deterministic mtimes: v0 @1000s, v1 @2000s, v2 @3000s
    for v, ts in ((0, 1000), (1, 2000), (2, 3000)):
        os.utime(os.path.join(log, f"{v:020d}.json"), (ts, ts))
    assert dl.delta_version_asof_timestamp(t, 2500) == 1
    assert _keys(dl.read_delta(spark, t, timestamp=2500)) == [1, 2]
    assert _keys(dl.read_delta(spark, t, timestamp=99999)) == [1, 2, 3]
    with pytest.raises(ValueError, match="predates"):
        dl.delta_version_asof_timestamp(t, 10)
    with pytest.raises(ValueError, match="not both"):
        dl.read_delta(spark, t, version=1, timestamp=2500)
    # inCommitTimestamp wins over mtime: stamp v2's commit as 1500s
    p2 = os.path.join(log, f"{2:020d}.json")
    with open(p2) as f:
        lines = f.read()
    with open(p2, "w") as f:
        f.write(
            json.dumps({"commitInfo": {"inCommitTimestamp": 1500_000}})
            + "\n"
            + lines
        )
    os.utime(p2, (3000, 3000))
    assert dl.delta_version_asof_timestamp(t, 1600) == 2


def test_delta_schema_evolution_merge_schema(spark, tmp_path):
    """B210: merge_schema appends widen the schema via a new metaData
    action; pre-evolution files read back with typed NULLs; type
    changes and un-flagged adds refuse loudly."""
    t = str(tmp_path / "t")
    dl.delta_append(spark, t, _mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    wide = spark.createDataFrame(
        [(3, "c", 3.0, 30)], "k long, g string, v double, extra long"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        dl.delta_append(spark, t, wide)
    dl.delta_append(spark, t, wide, merge_schema=True)
    got = {(r.k, r.extra) for r in dl.read_delta(spark, t).collect()}
    assert got == {(1, None), (2, None), (3, 30)}
    # time travel below the evolution sees the OLD schema
    assert "extra" not in dl.read_delta(spark, t, version=0).columns
    # type change refuses regardless of the flag
    bad = spark.createDataFrame([(9, "z", 9.0)], "k int, g string, v double")
    with pytest.raises(ValueError, match="changes column types"):
        dl.delta_append(spark, t, bad, merge_schema=True)


# ------------------------------------------- B211: iceberg evolution


def test_iceberg_schema_evolution(spark, tmp_path):
    """merge_schema append registers a NEW schema version with fresh
    field ids and makes it current; pre-evolution files read back with
    typed NULLs (explicit read schema — footer inference dropped the
    added column on mixed file sets); type changes refuse."""
    from kinesis2elastic_spark.sources import iceberg_meta as im

    t = str(tmp_path / "t")
    im.iceberg_append(
        spark, t, spark.createDataFrame([(1, "a"), (2, "b")], "k long, g string")
    )
    wide = spark.createDataFrame([(3, "c", 30)], "k long, g string, extra long")
    with pytest.raises(ValueError, match="merge_schema=True"):
        im.iceberg_append(spark, t, wide)
    im.iceberg_append(spark, t, wide, merge_schema=True)
    got = {(r.k, r.extra) for r in im.read_iceberg(spark, t).collect()}
    assert got == {(1, None), (2, None), (3, 30)}
    meta = im.load_metadata(t)
    assert len(meta["schemas"]) == 2
    cur = {s["schema-id"]: s for s in meta["schemas"]}[
        meta["current-schema-id"]
    ]
    ids = [f["id"] for f in cur["fields"]]
    assert ids == sorted(set(ids))  # fresh, never-reused field ids
    assert meta["last-column-id"] == max(ids)
    with pytest.raises(ValueError, match="changes column types"):
        im.iceberg_append(
            spark,
            t,
            spark.createDataFrame([(9, 5)], "k long, g long"),
            merge_schema=True,
        )


# -------------------------------------------------- B215: txn sink


def test_delta_txn_idempotent_append(spark, tmp_path):
    """setTransaction: a replayed (appId, version) append is skipped;
    higher versions commit; the watermark survives a checkpoint."""
    t = str(tmp_path / "t")
    assert dl.delta_append_txn(spark, t, _mk(spark, [(1, "a", 1.0)]), "app1", 0) == 0
    # replay of batch 0: skipped
    assert dl.delta_append_txn(spark, t, _mk(spark, [(1, "a", 1.0)]), "app1", 0) is None
    assert dl.delta_append_txn(spark, t, _mk(spark, [(2, "a", 2.0)]), "app1", 1) == 1
    # a different app is independent
    assert dl.delta_append_txn(spark, t, _mk(spark, [(3, "a", 3.0)]), "app2", 0) == 2
    assert _keys(dl.read_delta(spark, t)) == [1, 2, 3]
    assert dl.delta_snapshot(t)["txns"] == {"app1": 1, "app2": 0}
    # checkpoint + expire: the txn watermark must survive compaction
    cv = dl.delta_checkpoint(t)
    dl.expire_delta_log(t, before_version=cv)
    assert dl.delta_snapshot(t)["txns"] == {"app1": 1, "app2": 0}
    assert dl.delta_append_txn(spark, t, _mk(spark, [(9, "a", 9.0)]), "app1", 1) is None
    assert _keys(dl.read_delta(spark, t)) == [1, 2, 3]


def test_delta_stream_sink_exactly_once(spark, tmp_path):
    """foreachBatch sink: two availableNow drains across a restart
    write each source batch exactly once into the Delta table."""
    src, t, ck = (str(tmp_path / d) for d in ("src", "t", "ck"))
    os.makedirs(src)
    _mk(spark, [(i, "a", float(i)) for i in range(5)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema("k long, g string, v double")
            .parquet(src)
            .writeStream.foreachBatch(dl.delta_stream_sink(t, "sink-test"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    assert _keys(dl.read_delta(spark, t)) == list(range(5))
    _mk(spark, [(9, "b", 9.0)]).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert _keys(dl.read_delta(spark, t)) == list(range(5)) + [9]
    # txn versions recorded per batch id
    assert dl.delta_snapshot(t)["txns"]["sink-test"] >= 1


# ---------------------------------------------------- B216: MERGE INTO


def test_delta_merge_update_and_delete(spark, tmp_path):
    """MOR MERGE: matched rows DV-delete + re-land from source, new
    keys insert, delete-mode removes without writing, dup source keys
    refuse, already-dead rows don't match."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(10)]),
        partition_by=["g"],
    )
    # upsert: update k in {2,3} (v *= 100), insert k=50
    src = _mk(spark, [(2, "b", 200.0), (3, "a", 300.0), (50, "b", 50.0)])
    res = dl.delta_merge(spark, t, src, ["k"])
    assert res["n_matched"] == 2 and res["n_written"] >= 1
    got = {(r.k, r.v) for r in dl.read_delta(spark, t).collect()}
    expect = {(i, float(i)) for i in range(10) if i not in (2, 3)} | {
        (2, 200.0),
        (3, 300.0),
        (50, 50.0),
    }
    assert got == expect
    # time travel below the merge: original state
    assert _keys(dl.read_delta(spark, t, version=0)) == list(range(10))
    # dup source keys refuse
    with pytest.raises(ValueError, match="duplicate merge keys"):
        dl.delta_merge(spark, t, _mk(spark, [(7, "a", 1.0), (7, "a", 2.0)]), ["k"])
    # delete-mode: matched rows vanish, nothing written
    res2 = dl.delta_merge(
        spark,
        t,
        spark.createDataFrame([(2,), (50,)], "k long"),
        ["k"],
        when_matched="delete",
    )
    assert res2["n_matched"] == 2 and res2["n_written"] == 0
    assert _keys(dl.read_delta(spark, t)) == [0, 1, 3, 4, 5, 6, 7, 8, 9]
    # a second merge against the SAME already-deleted key matches nothing
    with pytest.raises(ValueError, match="matched no rows"):
        dl.delta_merge(
            spark,
            t,
            spark.createDataFrame([(2,)], "k long"),
            ["k"],
            when_matched="delete",
        )
