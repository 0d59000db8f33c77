"""Interleaved A/B: does AQE add per-round scheduler jobs in the graph
fixpoint kernels?  Runs a graph query alternately with
spark.sql.adaptive.enabled true/false on ONE warm session (the r11
interleaved-pair discipline — ambient drift hits both arms equally),
reporting per-arm wall and Spark job count (statusTracker delta).

Usage: python tools/r14_aqe_loop_ab.py [--sf DIR] [--pairs N] [q ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kinesis2elastic_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    pairs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--pairs":
            pairs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        names = ["q_connected_components"]

    spark = get_spark("r14-aqe-ab")
    sc = spark.sparkContext
    queries = entrymod.queries()

    seq = [0]

    def run(name: str, aqe: str) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        seq[0] += 1
        group = f"ab-{name}-{aqe}-{seq[0]}"
        sc.setJobGroup(group, group)
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("idle", "idle")
        return wall, n_jobs

    for name in names:
        # warm both arms once (catalog/schema caches, JIT)
        run(name, "true")
        run(name, "false")
        for p in range(pairs):
            w_on, j_on = run(name, "true")
            w_off, j_off = run(name, "false")
            print(
                f"{name} pair {p}: AQE-on {w_on:.2f}s/{j_on}jobs  "
                f"AQE-off {w_off:.2f}s/{j_off}jobs",
                flush=True,
            )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
