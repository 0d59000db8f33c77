"""Regression tests for catalog.load timestamp normalization.

Round-2 postmortem: the driver testdata switched events.ts from INT64
TIMESTAMP(NANOS) to plain timestamp[us] with no TZ annotation, which Spark
reads as TIMESTAMP_NTZ; every F.unix_micros/F.unix_millis call then fails at
analysis time.  catalog.load must normalize any NTZ column to TIMESTAMP
regardless of how the parquet encodes it.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.catalog import load


def _write_events_fixture(path: str, ts_type) -> None:
    ts = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 1, 1, 0, 0, 1, 500000),
        datetime.datetime(2024, 1, 2, 12, 30, 0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts, ts_type),
            "user_id": pa.array([10, 10, 11], pa.int64()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("us"), pa.timestamp("us", tz="UTC"), pa.timestamp("ns")],
    ids=["ntz-us", "utc-us", "ntz-ns"],
)
def test_load_normalizes_any_timestamp_encoding(spark, tmp_path, ts_type):
    sf_dir = str(tmp_path / str(ts_type).replace("[", "_").replace("]", "_"))
    os.makedirs(sf_dir, exist_ok=True)
    _write_events_fixture(os.path.join(sf_dir, "events.parquet"), ts_type)

    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"

    # unix_micros (the call that crashed round 2 on NTZ) must resolve AND
    # return the true UTC epoch values — the normalization may not shift
    # wall-clock time.
    got = [
        r["us"]
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == [1704067200000000, 1704067201500000, 1704198600000000]


def test_real_testdata_events_ts_is_timestamp(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # The analysis-time crash from round 2 must not reproduce.
    df.select(F.unix_micros("ts")).limit(1).collect()


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("ns", tz="UTC")],
    ids=["ns-ntz", "ns-utc"],
)
def test_load_detects_ns_columns_in_any_table(spark, tmp_path, ts_type):
    """The ns-column set comes from the parquet footer, not a hardcoded
    per-table list: an orders table switching o_orderdate to timestamp[ns]
    (the encoding drift that red-gated round 2 for events) must load as a
    proper TIMESTAMP with exact values."""
    sf_dir = str(tmp_path / "nsdrift")
    os.makedirs(sf_dir, exist_ok=True)
    dt = [
        datetime.datetime(2024, 3, 1, 0, 0, 0),
        datetime.datetime(2024, 3, 2, 6, 30, 15, 250000),
    ]
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(dt, ts_type),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "orders.parquet"))

    df = load(spark, sf_dir, "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    got = [
        r["us"]
        for r in df.select(F.unix_micros("o_orderdate").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == [1709251200000000, 1709361015250000]


def test_load_ns_detection_on_multifile_dataset(spark, tmp_path):
    """Directory-shaped parquet datasets (multiple part files) get footer
    detection from a part file."""
    sf_dir = str(tmp_path / "multipart")
    ds_dir = os.path.join(sf_dir, "events.parquet")
    os.makedirs(ds_dir, exist_ok=True)
    for i in range(2):
        table = pa.table(
            {
                "event_id": pa.array([i], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2024, 1, 1, i, 0, 0)], pa.timestamp("ns")
                ),
            }
        )
        pq.write_table(table, os.path.join(ds_dir, f"part-{i}.parquet"))
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == 2
