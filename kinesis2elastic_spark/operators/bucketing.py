"""Bucketed-table helpers (SURVEY §4 / guide: "bucketing so later joins on
key co-locate without a shuffle").

At 100 TB, repeated joins/aggregations on the same key (orderkey joins of
lineitem⋈orders, user_id sessionization) should read from bucketed tables:
both sides hash-partitioned into the same bucket count at WRITE time, so
the join needs no Exchange at all — the single biggest repeated-query win
available to a warehouse layout.  ``tests/test_bucketing.py`` asserts the
Exchange-free plan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    """Persist as a bucketed+sorted managed table (idempotent: drops the
    table AND scrubs an orphaned warehouse location — a crashed prior write
    can leave the directory behind without catalog metadata)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans SortMergeJoin with NO Exchange on either side."""
    l = spark.table(left_table).hint("merge")
    r = spark.table(right_table)
    return l.join(r, l[key_l] == r[key_r])
