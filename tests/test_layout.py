"""Data-layout maintenance: compaction file-count contract, clustered
write pruning + row-group stats layout."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.operators import layout


def test_compact_collapses_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    e = load(spark, sf_dir, "events")
    e.repartition(64).write.parquet(src)  # simulate micro-batch spray
    assert len(layout.parquet_files(src)) == 64
    n = layout.compact_parquet(spark, src, dst, target_mb=128)
    assert len(layout.parquet_files(dst)) == n == 1  # sf data << 128 MB
    assert spark.read.parquet(dst).count() == e.count()


def test_partitioned_sorted_layout(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "clustered")
    e = (
        load(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts").cast("string"))
    )
    layout.write_partitioned_sorted(e, dst, "d", "user_id")
    # hive layout: one dir per day, one data file per partition
    files = layout.parquet_files(dst)
    days = {f.split("d=")[1].split("/")[0] for f in files}
    assert days == {r.d for r in e.select("d").distinct().collect()}
    per_dir = {}
    for f in files:
        per_dir.setdefault(f.rsplit("/", 1)[0], []).append(f)
    assert all(len(v) == 1 for v in per_dir.values())
    # partition pruning: a day filter scans one partition only
    one_day = sorted(days)[0]
    pruned = spark.read.parquet(dst).filter(F.col("d") == one_day)
    from kinesis2elastic_spark.plans.explain import formatted_plan

    assert "PartitionFilters: [isnotnull(d" in formatted_plan(pruned)
    # within a file, user_id is sorted (row-group stats are tight)
    import pyarrow.parquet as pq

    col = pq.read_table(per_dir[sorted(per_dir)[0]][0], columns=["user_id"])[
        "user_id"
    ].to_pylist()
    assert col == sorted(col)
    assert spark.read.parquet(dst).count() == e.count()
