"""Round-9 10x clone tiers for the two new operators (SCALING.md r9
addendum): label propagation (B133) and the streaming matview maintainer
(B126 streaming leg).

- LPA: the sf0.1 trade graph cloned 10x with DISJOINT node namespaces
  (suffix per clone), so the community structure must replicate exactly —
  community count x10 and an identical per-clone size multiset is an
  at-scale CORRECTNESS invariant on top of the wall clock.
- Matview: orders cloned 10x with shifted order keys but the SAME
  (status, month) group domain — the MV state size must stay CONSTANT
  while the delta scans grow 10x (the property that makes the maintainer
  affordable at 100 TB).

Usage: python tools/r9_tier.py   (prints a markdown-ready table)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.operators.graph import _trade_edges, label_propagation
from kinesis2elastic_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def _clone_edges(edges, n):
    # the '!' separator sorts BELOW every digit, so suffixing preserves
    # the within-clone lexicographic order of node ids even for prefix
    # pairs ('c1' < 'c12' must stay 'c1!k' < 'c12!k') — min-label ties
    # otherwise resolve differently per clone and the size histogram
    # stops replicating
    return edges.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k")
    ).select(
        F.concat("src", F.lit("!"), F.col("_k")).alias("src"),
        F.concat("dst", F.lit("!"), F.col("_k")).alias("dst"),
    )


def _communities(labels):
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("n_communities"))
        .collect()
    )


def lpa_tier(spark):
    base = _trade_edges(spark, SF_DIR).localCheckpoint(eager=True)
    out = []
    size_hist = {}
    for tier, edges in (("1x", base), ("10x", _clone_edges(base, 10))):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            labels = label_propagation(edges)
            hist = {r.n: r.n_communities for r in _communities(labels)}
            best = min(best, time.time() - t0)
        size_hist[tier] = hist
        out.append((tier, best, sum(hist.values())))
    ok = all(
        size_hist["10x"].get(n) == 10 * c for n, c in size_hist["1x"].items()
    ) and len(size_hist["10x"]) == len(size_hist["1x"])
    for tier, wall, ncomm in out:
        print(f"lpa {tier}: wall={wall:.2f}s communities={ncomm}")
    print(f"lpa size-histogram scales exactly x10: {ok}")
    return ok


def matview_tier(spark):
    from kinesis2elastic_spark.streaming.matview_stream import (
        matview_writer,
        read_matview,
    )

    o = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    ok = True
    for tier, n in (("1x", 1), ("10x", 10)):
        df = (
            o.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k")
            )
            .select(
                (F.col("o_orderkey") + F.col("_k") * 10_000_000_000).alias(
                    "o_orderkey"
                ),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
            )
            .localCheckpoint(eager=True)
        )
        b1 = df.filter(F.col("o_orderkey") % 2 == 0)
        b2 = df.filter(F.col("o_orderkey") % 2 == 1)
        wall = float("inf")
        for _ in range(2):
            state = tempfile.mkdtemp(prefix=f"k2e_r9mv_{tier}_")
            try:
                fb = matview_writer(spark, state)
                t0 = time.time()
                fb(b1, 0)
                fb(b2, 1)
                wall = min(wall, time.time() - t0)
                mv_rows = read_matview(spark, state).count()
            finally:
                shutil.rmtree(state, ignore_errors=True)
        print(f"matview {tier}: wall(2 batches)={wall:.2f}s state_rows={mv_rows}")
        if tier == "1x":
            base_rows = mv_rows
        else:
            ok = ok and mv_rows == base_rows
    print(f"matview state size constant across tiers: {ok}")
    return ok


def docs_tier(spark):
    """10x documents tier (scale_rehearsal's clone builder) for the two
    r9 document-side operators: collocation mining and compaction
    planning.  Wall clocks only — correctness is the oracle's job."""
    from kinesis2elastic_spark.operators.corpus import q_collocations
    from kinesis2elastic_spark.operators.tableops import q_compaction_plan

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_rehearsal import build_docs_tier

    tier_dir = tempfile.mkdtemp(prefix="k2e_r9docs_")
    try:
        build_docs_tier(spark, n_clones=9, out_dir=tier_dir)
        for name, fn in (
            ("collocations", q_collocations),
            ("compaction_plan", q_compaction_plan),
        ):
            for tier, d in (("1x", SF_DIR), ("10x", tier_dir)):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    n = fn(spark, d).count()
                    best = min(best, time.time() - t0)
                print(f"{name} {tier}: wall={best:.2f}s rows={n}")
    finally:
        shutil.rmtree(tier_dir, ignore_errors=True)


def qhist_tier(spark):
    """10x events tier for B136: two add-merge batches through the state
    path; the state must stay bounded by |types| x occupied bins while
    the batch scans grow 10x."""
    from kinesis2elastic_spark.streaming.quantile_stream import (
        merge_qhist,
        qhist_partials,
        read_qhist,
    )

    ev = load(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    base_rows = None
    ok = True
    for tier, n in (("1x", 1), ("10x", 10)):
        df = (
            ev.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k")
            )
            .select(
                (F.col("event_id") + F.col("_k") * 10_000_000_000).alias(
                    "event_id"
                ),
                "event_type",
                "value",
            )
            .localCheckpoint(eager=True)
        )
        b1 = df.filter(F.col("event_id") % 2 == 0).select("event_type", "value")
        b2 = df.filter(F.col("event_id") % 2 == 1).select("event_type", "value")
        wall = float("inf")
        for _ in range(2):
            state = tempfile.mkdtemp(prefix=f"k2e_r9qh_{tier}_")
            try:
                t0 = time.time()
                merge_qhist(spark, state, qhist_partials(b1), 0)
                merge_qhist(spark, state, qhist_partials(b2), 1)
                wall = min(wall, time.time() - t0)
                rows = read_qhist(spark, state).count()
            finally:
                shutil.rmtree(state, ignore_errors=True)
        print(f"qhist {tier}: wall(2 merges)={wall:.2f}s state_rows={rows}")
        if base_rows is None:
            base_rows = rows
        else:
            ok = ok and rows == base_rows
    print(f"qhist state bounded across tiers: {ok}")
    return ok


def main():
    spark = get_spark("r9-tier", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "lpa_mv"):
        ok1 = lpa_tier(spark)
        ok2 = matview_tier(spark)
        print(f"ALL_OK={ok1 and ok2}")
    if only in (None, "docs"):
        docs_tier(spark)
    if only in (None, "qhist"):
        qhist_tier(spark)


if __name__ == "__main__":
    main()
