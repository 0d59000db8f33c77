"""B194: catalog statistics drive the pre-AQE broadcast decision.

The contract scenario (r12 verdict item 8): a dim table UNDER the
broadcast threshold by stats but OVER it by the file-size proxy must
broadcast in a cold session — here the dim's fat text column dominates
its files, so the file-size estimate (scaled by schema-default column
widths) stays above the threshold for a key-only projection, while the
registered rowCount prices the projection at rows x width and flips
the join to broadcast before any AQE shuffle evidence exists."""

import os

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.plans import cbo


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pre_aqe(spark):
    """Cold-planner regime: AQE off so only pre-shuffle estimates decide."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.conf.set("spark.sql.cbo.enabled", old_cbo)
    for t in ("dim_stats", "fact_stats", "snapdim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stats_flip_broadcast_decision(pre_aqe, tmp_path):
    spark = pre_aqe
    d = str(tmp_path)
    # dim: 50k rows whose incompressible pad (~2.5 KB/row of distinct
    # hex — repeated text would just compress away under zstd) pushes
    # file bytes way past the 10 MB threshold; the join projects only `k`
    pad = "concat(" + ",".join(
        f"sha2(concat(cast(id as string), '-{i}'), 512)" for i in range(20)
    ) + ")"
    spark.range(50000).selectExpr(
        "id as k", f"{pad} as pad"
    ).write.mode("overwrite").parquet(d + "/dim")
    # fact must itself be over the threshold (else the planner just
    # broadcasts the fact side and proves nothing about dim stats)
    spark.range(500000).selectExpr(
        "id % 50000 as k",
        "concat(sha2(cast(id as string), 512), sha2(concat(cast(id as string), 'x'), 512)) as v",
    ).write.mode("overwrite").parquet(d + "/fact")
    dim_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dirs, fs in os.walk(d + "/dim")
        for f in fs
        if f.endswith(".parquet")
    )
    assert dim_bytes > 10 * 1024 * 1024  # file-size proxy: too big

    fact = spark.read.parquet(d + "/fact")

    def probe():
        dim = spark.table("dim_stats").select("k")
        return _executed(fact.join(dim, "k").agg(F.count("*")))

    # registered but WITHOUT cbo: file-size proxy keeps sort-merge
    got = cbo.register_table_stats(spark, "dim_stats", d + "/dim")
    assert got["n_rows"] == 50000 and got["size_bytes"] == dim_bytes
    spark.conf.set("spark.sql.cbo.enabled", "false")
    assert "BroadcastHashJoin" not in probe()
    # cbo on: rowCount x projected width ~ 0.6 MB < threshold -> broadcast
    cbo.enable_cbo(spark)
    assert "BroadcastHashJoin" in probe()


def test_snapshot_stats_registration_guards(pre_aqe, tmp_path):
    spark = pre_aqe
    from kinesis2elastic_spark.operators import timetravel as tt

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], "k long, g long")
    tt.commit_snapshot(spark, table, df, 0)
    tt.commit_snapshot(
        spark, table, spark.createDataFrame([(9999, 0)], "k long, g long"), 1
    )
    # carry-forward snapshot spans two commit dirs: refuse
    with pytest.raises(ValueError, match="OPTIMIZE"):
        cbo.register_snapshot_stats(spark, "snapdim", table)
    # optimize -> single-dir layout -> registration works and cross-checks
    tt.optimize_snapshot(spark, table, 2)
    got = cbo.register_snapshot_stats(spark, "snapdim", table)
    assert got["n_rows"] == 1001
    assert spark.table("snapdim").count() == 1001
