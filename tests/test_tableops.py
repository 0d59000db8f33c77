"""Table-maintenance operator tests: profiler accounting, CDC tombstone
semantics, and the one-shuffle island-compression plan shape."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import tableops
from kinesis2elastic_spark.plans.explain import assert_plan, formatted_plan


def test_profile_accounts_for_all_rows(spark, sf_dir):
    rows = {r.col_name: r for r in tableops.q_profile_columns(spark, sf_dir).collect()}
    assert set(rows) == set(tableops.PROFILE_COLS)
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert r.n_distinct <= n - r.n_nulls
        assert abs(r.null_frac - r.n_nulls / n) < 1e-6


def test_cdc_latest_drops_tombstoned_keys(spark, sf_dir):
    out = tableops.q_cdc_latest(spark, sf_dir)
    assert out.filter(F.col("last_event_type") == "error").count() == 0
    # every surviving key's last_ts is the max ts for that key
    from kinesis2elastic_spark.catalog import load

    e = load(spark, sf_dir, "events")
    mx = e.groupBy("user_id").agg(F.max("ts").alias("mx"))
    bad = out.join(mx, "user_id").filter(F.col("last_ts") != F.col("mx")).count()
    assert bad == 0


def test_run_compress_single_shuffle(spark, sf_dir):
    # difference-of-row_numbers over one sort order: Catalyst must plan
    # exactly one Exchange (the window shuffle); the island aggregate rides
    # the same partitioning.
    plan = formatted_plan(tableops.q_run_compress(spark, sf_dir))
    n_exchanges = sum(
        1 for line in plan.splitlines() if line.strip().startswith("(") and ") Exchange" in line
    )
    assert n_exchanges == 1, plan


def test_run_compress_rebuilds_history_lengths(spark, sf_dir):
    out = tableops.q_run_compress(spark, sf_dir)
    from kinesis2elastic_spark.catalog import load

    e = load(spark, sf_dir, "events")
    assert out.agg(F.sum("run_len")).first()[0] == e.count()
    assert out.filter(F.col("run_start") > F.col("run_end")).count() == 0
