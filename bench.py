"""Benchmark harness (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": <float>}

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect overhead in the timing).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from kinesis2elastic_spark.session import get_spark

# Headline set: covers scan/agg, star join, windows, sessionization, grok,
# full decode chain (pandas UDF), dedup (exact + LSH), similarity search,
# pivot, time bucketing, pipeline e2e, text analysis.
HEADLINE = [
    "q_pricing_agg",
    "q_join_star",
    "q_window_running",
    "q_topk_per_group",
    "q_sessionize",
    "q_tumble_batch",
    "q_pivot",
    "q_grok",
    "q_pipeline_axway",
    "q_firehose_flatten",
    "q_dedup_exact",
    "q_minhash_near_dup",
    "q_dedup_clusters",
    "q_cosine_topk",
    "q_text_stats",
    "q_sql_q3",
    "q_asof_join",
    "q_skew_salted_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("k2e-bench", cpus=cpus)
    queries = entrymod.queries()

    # Warm the JVM/session so the first measured query reflects steady
    # state (a long-lived cluster), not one-time init: codegen, the parquet
    # reader path, and the Python-UDF worker pool.
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.functions.gzip_udf import gunzip_text, gzip_bytes

    spark.range(8).select(
        gunzip_text(gzip_bytes(F.lit("warmup"))).alias("w")
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "sec total over headline query set (noop-write materialization)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
