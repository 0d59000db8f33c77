"""r13 tier measurements (r12 VERDICT #9 + new-operator slopes).

Times (a) every q_stream_*_equiv leg and (b) the r13 operators at
sf0.01 and sf0.1 — Spark side only, noop-write materialization, min of
2 runs, sequential (two concurrent stream drains contend on the memory
sink / checkpoint churn).  Prints a markdown table for SCALING.md plus
one JSON line.

Usage: python tools/r13_tier.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kinesis2elastic_spark.session import get_spark

STREAM_LEGS = [
    "q_stream_tumble_equiv",
    "q_stream_sliding_equiv",
    "q_stream_session_equiv",
    "q_stream_stateful_equiv",
    "q_stream_dedup_w_equiv",
    "q_stream_static_join_equiv",
    "q_stream_stream_join_equiv",
    "q_stream_outer_join_equiv",
    "q_stream_cms_equiv",
    "q_stream_quantile_equiv",
    "q_stream_rollup_equiv",
    "q_stream_update_equiv",
    "q_stream_timeout_equiv",
    "q_stream_rocksdb_equiv",
    "q_stream_backpressure_equiv",
    "q_stream_shard_equiv",
    "q_stream_matview_equiv",
    "q_stream_cdc_equiv",
    "q_stream_cdf_view_equiv",
    # excluded: q_stream_dedup_equiv (quadratic DuckDB twin is the sf0.1
    # hazard, but its SPARK side is also index-rebuild dominated),
    # q_stream_replay_equiv (fixture-bound by construction, SCALING L354)
]
R13_OPS = ["q_delta_read", "q_iceberg_read", "q_iceberg_mor", "q_ann_ivfpq", "q_langid"]


def time_query(spark, fn, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("k2e-r13-tier", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    queries = entrymod.queries()
    names = (STREAM_LEGS[:4] + R13_OPS[:2]) if quick else (STREAM_LEGS + R13_OPS)
    rows = []
    for name in names:
        fn = queries[name]
        t_small = time_query(spark, fn, "/root/testdata/sf0.01")
        t_big = time_query(spark, fn, "/root/testdata/sf0.1")
        slope = round(t_big / t_small, 2) if t_small > 0 else None
        rows.append((name, t_small, t_big, slope))
        print(f"| {name} | {t_small} s | {t_big} s | {slope}x |", flush=True)
    print(
        json.dumps(
            {
                "tier": "r13 sf0.01->sf0.1 (warm, min of 2)",
                "rows": {n: {"sf001": a, "sf01": b, "slope": c} for n, a, b, c in rows},
            }
        )
    )


if __name__ == "__main__":
    main()
