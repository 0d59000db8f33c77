"""Iceberg-as-streaming-source (B217)."""

import os

import pytest

from kinesis2elastic_spark.sources import iceberg_meta as im
from kinesis2elastic_spark.sources.iceberg_stream import IcebergStreamDataSource


def _register(spark):
    try:
        spark.dataSource.register(IcebergStreamDataSource)
    except Exception:
        pass


def _drain(spark, table, out, ck, **opts):
    r = spark.readStream.format("iceberg_interop").option("path", table)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_iceberg_stream_resume_exactly_once(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    df = spark.createDataFrame([(i, i % 3) for i in range(12)], "k long, g long")
    im.iceberg_append(spark, t, df.filter("k < 6"))
    im.iceberg_append(spark, t, df.filter("k >= 6"))
    _drain(spark, t, out, ck)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == list(range(12))
    im.iceberg_append(spark, t, spark.createDataFrame([(100, 1)], "k long, g long"))
    _drain(spark, t, out, ck)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == list(range(12)) + [100]


def test_iceberg_stream_refuses_delete_snapshots(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    df = spark.createDataFrame([(i, i % 2) for i in range(8)], "k long, g long")
    im.iceberg_append(spark, t, df)
    _drain(spark, t, out, ck)
    im.iceberg_equality_delete(spark, t, df.filter("g = 0").select("g"), ["g"])
    with pytest.raises(Exception, match="append-only"):
        _drain(spark, t, out, ck)
    # ignoreDeletes skips the delete snapshot; a later append lands.
    # Python stream sources run ONE batch per availableNow drain, and
    # the first drain replays the previously-planned (failed) batch —
    # so the new append needs a second drain.
    im.iceberg_append(spark, t, spark.createDataFrame([(50, 1)], "k long, g long"))
    _drain(spark, t, out, ck, ignoreDeletes="true")
    _drain(spark, t, out, ck, ignoreDeletes="true")
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(8)) + [50]


def test_iceberg_stream_expired_checkpoint_fails_loud(spark, tmp_path):
    t, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    _register(spark)
    df = spark.createDataFrame([(i, 0) for i in range(6)], "k long, g long")
    im.iceberg_append(spark, t, df.filter("k < 3"))
    _drain(spark, t, out, ck)
    im.iceberg_append(spark, t, df.filter("k >= 3"))
    im.iceberg_append(spark, t, spark.createDataFrame([(9, 0)], "k long, g long"))
    # expire everything but the newest snapshot: the checkpoint (at
    # seq 1) now points into pruned history
    im.expire_iceberg_snapshots(t, retain=1)
    with pytest.raises(Exception, match="expired"):
        _drain(spark, t, out, ck)


# --------------------------------------------------- B219: epoch sink


def test_iceberg_epoch_sink_exactly_once(spark, tmp_path):
    """Epoch-stamped snapshots: replayed (app, epoch) appends skip;
    two availableNow drains across a restart write each batch once."""
    from kinesis2elastic_spark.sources import iceberg_meta as im2

    src, t, ck = (str(tmp_path / d) for d in ("src", "t", "ck"))
    os.makedirs(src)
    df = spark.createDataFrame([(i, 0) for i in range(5)], "k long, g long")
    df.coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema("k long, g long")
            .parquet(src)
            .writeStream.foreachBatch(im2.iceberg_stream_sink(t, "isink"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    assert sorted(
        r.k for r in im2.read_iceberg(spark, t).collect()
    ) == list(range(5))
    # manual replay of a committed epoch: skipped
    assert im2.iceberg_append_epoch(spark, t, df, "isink", 0) is None
    spark.createDataFrame([(9, 1)], "k long, g long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    assert sorted(
        r.k for r in im2.read_iceberg(spark, t).collect()
    ) == list(range(5)) + [9]
    assert im2.iceberg_last_epoch(t, "isink") >= 1
    assert im2.iceberg_last_epoch(t, "other") == -1
