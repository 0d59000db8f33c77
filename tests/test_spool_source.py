"""Custom Python DataSource (A1 surface): batch + incremental stream
reads over the Firehose spool directory via format("firehose_spool")."""

import json
import time
import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def registered(spark):
    from kinesis2elastic_spark.sources.spool_source import FirehoseSpoolDataSource

    spark.dataSource.register(FirehoseSpoolDataSource)
    return spark


def _write_envelopes(path, n, start=0):
    path.mkdir(parents=True, exist_ok=True)
    for i in range(start, start + n):
        env = {
            "requestId": f"req-{i}",
            "timestamp": 1700000000000 + i,
            "records": [{"data": f"payload-{i}"}],
        }
        (path / f"{i:06d}.json").write_text(json.dumps(env) + "\n")


def test_batch_read_parses_envelopes(registered, tmp_path):
    spool = tmp_path / "spool"
    _write_envelopes(spool, 5)
    # a malformed file degrades to a null-field row, never an exception
    (spool / "zz-bad.json").write_text("not json at all\n")

    df = registered.read.format("firehose_spool").option("path", str(spool)).load()
    assert [f.name for f in df.schema.fields] == ["requestId", "timestamp", "records"]
    rows = df.collect()
    assert len(rows) == 6
    good = sorted(r.requestId for r in rows if r.requestId is not None)
    assert good == [f"req-{i}" for i in range(5)]
    assert sum(1 for r in rows if r.requestId is None) == 1
    by_req = {r.requestId: r for r in rows if r.requestId}
    assert by_req["req-3"].records[0].data == "payload-3"
    assert by_req["req-3"].timestamp == 1700000000003


def test_batch_read_parallel_partitions(registered, tmp_path):
    spool = tmp_path / "spoolp"
    _write_envelopes(spool, 8)
    df = registered.read.format("firehose_spool").option("path", str(spool)).load()
    # one input partition per spool file
    assert df.rdd.getNumPartitions() == 8


def test_stream_read_is_incremental(registered, tmp_path):
    spool = tmp_path / "spools"
    _write_envelopes(spool, 3)
    name = f"spool_{uuid.uuid4().hex[:8]}"
    st = (
        registered.readStream.format("firehose_spool")
        .option("path", str(spool))
        .load()
        .select("requestId", F.col("timestamp").alias("ts"))
    )
    q = st.writeStream.format("memory").queryName(name).trigger(
        processingTime="300 milliseconds"
    ).start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and registered.table(name).count() < 3:
            time.sleep(0.3)
        assert registered.table(name).count() == 3
        # late arrivals picked up by the filename high-water mark
        _write_envelopes(spool, 2, start=3)
        deadline = time.time() + 30
        while time.time() < deadline and registered.table(name).count() < 5:
            time.sleep(0.3)
        got = {r.requestId for r in registered.table(name).collect()}
    finally:
        q.stop()
    assert got == {f"req-{i}" for i in range(5)}
