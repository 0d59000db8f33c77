"""Delta-as-streaming-source (B205): version-offset resume, per-file
partition planning, append-only enforcement, DV-aware added files."""

import os

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.sources import delta_log as dl
from kinesis2elastic_spark.sources.delta_stream import DeltaStreamDataSource


def _mk(spark, rows, schema="k long, g string, v double"):
    return spark.createDataFrame(rows, schema)


def _register(spark):
    try:
        spark.dataSource.register(DeltaStreamDataSource)
    except Exception:
        pass  # per-session registry; repeat registration is fine


def _drain(spark, table, out, ck):
    q = (
        spark.readStream.format("delta_interop")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_resume_exactly_once(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    dl.delta_append(
        spark,
        t,
        _mk(spark, [(i, "a" if i % 2 else "b", float(i)) for i in range(8)]),
        partition_by=["g"],
    )
    _drain(spark, t, out, ck)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == list(
        range(8)
    )
    # second commit across a checkpoint restart: only the delta arrives
    dl.delta_append(spark, t, _mk(spark, [(100, "a", 1.0)]), partition_by=["g"])
    _drain(spark, t, out, ck)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(8)) + [100]
    # typed partition injection: g came back as a string column
    assert dict(spark.read.parquet(out).dtypes)["g"] == "string"


def test_stream_refuses_delete_versions(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    dl.delta_append(spark, t, _mk(spark, [(i, "a", 1.0) for i in range(6)]))
    _drain(spark, t, out, ck)
    dl.delta_delete_where(spark, t, F.col("k") < 2)
    with pytest.raises(Exception, match="append-only"):
        _drain(spark, t, out, ck)


def test_stream_ignore_deletes_skips(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    dl.delta_append(spark, t, _mk(spark, [(i, "a", 1.0) for i in range(4)]))
    q = (
        spark.readStream.format("delta_interop")
        .option("path", t)
        .option("ignoreDeletes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dl.delta_delete_where(spark, t, F.col("k") == 0)
    dl.delta_append(spark, t, _mk(spark, [(9, "a", 9.0)]))
    q = (
        spark.readStream.format("delta_interop")
        .option("path", t)
        .option("ignoreDeletes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    # the delete version is skipped (no re-emit, no removal); the append lands
    assert got == [0, 1, 2, 3, 9]


def test_stream_added_file_with_dv_emits_live_rows_only(spark, tmp_path):
    """A commit whose ADD already carries a deletion vector (a writer
    publishing pre-compacted state) streams only the file's live rows."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis2elastic_spark.sources import dvectors as dv

    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    # v0: a normal append so metaData/protocol exist
    dl.delta_append(spark, t, _mk(spark, [(0, "a", 0.0)]))
    # v1: hand-built commit adding a NEW file with rows 1..6 and an
    # inline DV marking positions 0 and 2 (k=1, k=3) dead on arrival
    os.makedirs(os.path.join(t, "part-c00001"), exist_ok=True)
    fpath = os.path.join(t, "part-c00001", "pre.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(1, 7), pa.int64()),
                "g": pa.array(["a"] * 6),
                "v": pa.array([float(i) for i in range(1, 7)]),
            }
        ),
        fpath,
    )
    desc = dv.make_descriptor(t, [0, 2], inline_max_bytes=1 << 16)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                        "writerFeatures": ["deletionVectors"],
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-c00001/pre.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(fpath),
                        "modificationTime": 0,
                        "dataChange": True,
                        "deletionVector": desc,
                    }
                }
            )
            + "\n"
        )
    _drain(spark, t, out, ck)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 2, 4, 5, 6]  # k=1 and k=3 dead on arrival
