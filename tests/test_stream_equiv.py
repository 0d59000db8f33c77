"""The stream-equivalence reductions' shared machinery.

The q_stream_*_equiv queries themselves run under the oracle harness
(tools/check_oracle.py / the driver); these tests pin the two pieces a
hash row can't see failing:

- ``frames_equal_flag`` must actually go False on a divergence (extra
  row, missing row, changed value, duplicate-multiplicity change) — if
  the flag were vacuously true, every equivalence query would silently
  stop testing anything;
- ``_time_split_batches`` must partition without loss or overlap, in
  time order (the property the windowed/stateful drains rely on to not
  manufacture late data).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators.stream_equiv import (
    _time_split_batches,
    frames_equal_flag,
)


def _flag(df):
    return df.first()[0]


def test_frames_equal_flag_true_on_identical(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x"), (2, "y")], "k int, v string")
    assert _flag(frames_equal_flag(a, b, "ok")) is True


def test_frames_equal_flag_false_on_divergence(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    for rows in (
        [(1, "x")],                      # missing row
        [(1, "x"), (2, "y"), (3, "z")],  # extra row
        [(1, "x"), (2, "Y")],            # changed value
        [(1, "x"), (2, "y"), (2, "y")],  # duplicate-multiplicity change
    ):
        b = spark.createDataFrame(rows, "k int, v string")
        assert _flag(frames_equal_flag(a, b, "ok")) is False, rows


def test_time_split_batches_partitions_in_time_order(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 28:02d} 12:00:00") for i in range(40)],
        "id int, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "src")
    b1, b2, t_mid = _time_split_batches(df, "ts", src)
    n1, n2 = b1.count(), b2.count()
    assert n1 + n2 == 40 and n1 > 0 and n2 > 0
    assert b1.agg(F.max("ts")).first()[0] < t_mid
    assert b2.agg(F.min("ts")).first()[0] >= t_mid
    # b1 is already on disk for the first drain; b2 is the caller's to write
    assert os.path.isdir(src + "/b1") and not os.path.isdir(src + "/b2")
    assert spark.read.parquet(src + "/b1").count() == n1


def test_stream_stream_join_constructed(spark, tmp_path):
    """Constructed funnel-join case driven through the REAL streaming
    pipeline shape (same join expression as q_stream_stream_join_equiv,
    evaluated batch-side — the equivalence query itself proves
    stream==batch; this pins the SEMANTICS): a click matches a purchase
    by the same user within the window, in-window boundary inclusive,
    out-of-window and cross-user pairs excluded, purchase-before-click
    excluded."""
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.operators.stream_equiv import (
        STREAM_JOIN_WINDOW_MIN,
    )

    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:30:00", 1, "purchase", 1.0),   # in window
        (3, "2024-01-01 12:00:00", 1, "purchase", 1.0),   # exactly at bound
        (4, "2024-01-01 12:00:01", 1, "purchase", 1.0),   # 1s past bound
        (5, "2024-01-01 09:59:59", 1, "purchase", 1.0),   # before the click
        (6, "2024-01-01 10:15:00", 2, "purchase", 1.0),   # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    c = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    got = sorted(
        r.purchase_id
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts")
                + F.expr(f"INTERVAL {STREAM_JOIN_WINDOW_MIN} MINUTES")
            ),
        ).collect()
    )
    assert got == [2, 3]


def test_stream_replay_fault_and_recovery(spark, sf_dir):
    """B118 end-to-end at sf0.001: the injected sink crash must really
    kill the first drain, the recovery drain must re-attempt the SAME
    batch id, and the recovered complete-mode aggregate must cover every
    event exactly once (totals equal the batch aggregate)."""
    from kinesis2elastic_spark.catalog import load
    from kinesis2elastic_spark.operators.stream_equiv import q_stream_replay_equiv

    out = q_stream_replay_equiv(spark, sf_dir).collect()
    assert out and all(r.fault_injected_ok and r.batch_replayed_ok for r in out)
    ev = load(spark, sf_dir, "events")
    want = {
        r.event_type: (r.n, r.mn, r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("mn"),
            F.max("event_id").alias("mx"),
        )
        .collect()
    }
    got = {r.event_type: (r.n_events, r.min_id, r.max_id) for r in out}
    assert got == want
