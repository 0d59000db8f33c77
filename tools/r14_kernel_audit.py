"""Audited exchange counts per pinned plan for every iterative graph
kernel, on the planted graphs the exchange-budget suite uses (r14
continuation).  The pinned-plan audit is the only way to see the LOOP
INTERIOR's shuffle structure — the final query plans hide it behind the
checkpointed leaves.

Run in two trees (before/after a kernel or pin() change) and diff:

    python tools/r14_kernel_audit.py > plans/r14/kernel_exchanges_<tag>.txt

Optionally pass kernel names to restrict; pass --dump-max to also print
the highest-exchange pinned plan per kernel (the mid-loop round shape).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis2elastic_spark.plans import pinning
from kinesis2elastic_spark.session import get_spark


def _shuffles(plan: str) -> int:
    all_ids = set(re.findall(r"(?<!Reused)Exchange \((\d+)\)", plan))
    bcast = set(re.findall(r"BroadcastExchange \((\d+)\)", plan))
    return len(all_ids - bcast)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dump-max"]
    dump_max = "--dump-max" in sys.argv[1:]

    from kinesis2elastic_spark.operators import graph, llmops

    spark = get_spark("r14-kernel-audit", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")

    PATH = [(f"a{i}", f"a{i+1}") for i in range(6)]
    SYM = PATH + [(b, a) for a, b in PATH]
    TRI = [("x", "y"), ("y", "z"), ("z", "x")]

    def edges(rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def seeds(ns):
        return spark.createDataFrame([(n,) for n in ns], "node string")

    CASES = [
        ("bfs", lambda: graph.bfs_reachability(edges(SYM), seeds(["a0"]), 8)),
        ("lpa", lambda: graph.label_propagation(edges(SYM))),
        ("cc", lambda: graph.connected_components_exact(edges(SYM))),
        ("logstar", lambda: graph.connected_components_logstar(edges(SYM))),
        ("kcore", lambda: graph.kcore_membership(
            edges(SYM + TRI + [(b, a) for a, b in TRI]))[0]),
        ("pagerank", lambda: graph.pagerank(edges(PATH))),
        ("ppr", lambda: graph.personalized_pagerank(edges(PATH), seeds(["a0"]))),
        ("sssp", lambda: graph.sssp_weighted(
            spark.createDataFrame([(a, b, 2) for a, b in SYM],
                                  "src string, dst string, w long"),
            seeds(["a0"]))),
        ("scc", lambda: graph.scc_decomposition(edges(PATH + [("a3", "a0")]))),
        ("llm_cc", lambda: llmops.connected_components(
            spark.createDataFrame([(i, i + 1) for i in range(6)],
                                  "doc_a long, doc_b long"))),
    ]

    for name, run in CASES:
        if args and name not in args:
            continue
        with pinning.plan_audit() as plans:
            run().count()
        per = [_shuffles(p) for p in plans]
        print(f"{name:9s} per-pin shuffles={per} sum={sum(per)} max={max(per)}")
        if dump_max:
            big = max(plans, key=_shuffles)
            print(f"----- {name}: highest-exchange pinned plan -----")
            print(big)


if __name__ == "__main__":
    main()
