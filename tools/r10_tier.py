"""Round-10 10x clone tiers (SCALING.md r10 addendum):

- Connected components (B137): the sf0.1 sparse trade subgraph cloned
  10x with DISJOINT node namespaces, so the component structure must
  replicate exactly — component count x10 and an identical per-clone
  size multiset is an at-scale CORRECTNESS invariant on top of the wall
  clock (the r9 LPA-tier doctrine).
- Collocation V-sweep (r9 verdict #7): q_collocations' vocabulary
  broadcast at V=64 (contract constant) vs V=1024 at sf0.1 — the
  "never all-pairs over vocab" claim carried as a measured slope in V.

Usage: python tools/r10_tier.py [cc|colloc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators.graph import (
    _trade_edges_sparse,
    connected_components_exact,
)
from kinesis2elastic_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def _clone_edges(edges, n):
    # '!' sorts below every digit: suffixing preserves within-clone
    # lexicographic order of node ids, so the min-id component canon
    # replicates exactly per clone (the r9_tier LPA separator rule)
    return edges.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k")
    ).select(
        F.concat("src", F.lit("!"), F.col("_k")).alias("src"),
        F.concat("dst", F.lit("!"), F.col("_k")).alias("dst"),
    )


def cc_tier(spark):
    base = _trade_edges_sparse(spark, SF_DIR).localCheckpoint(eager=True)
    size_hist = {}
    for tier, edges in (("1x", base), ("10x", _clone_edges(base, 10))):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            comp = connected_components_exact(edges)
            hist = {
                r.n: r.n_components
                for r in comp.groupBy("component")
                .agg(F.count("*").alias("n"))
                .groupBy("n")
                .agg(F.count("*").alias("n_components"))
                .collect()
            }
            best = min(best, time.time() - t0)
        size_hist[tier] = hist
        print(
            f"cc {tier}: wall={best:.2f}s components={sum(hist.values())}"
        )
    ok = all(
        size_hist["10x"].get(n) == 10 * c for n, c in size_hist["1x"].items()
    ) and len(size_hist["10x"]) == len(size_hist["1x"])
    print(f"cc size-histogram scales exactly x10: {ok}")
    return ok


def colloc_vsweep(spark):
    """The documents fixture only has 31 distinct tokens, so a bare
    top_v sweep is vacuous; inflate the vocabulary by salting every
    token with doc_id % k (all tokens in a doc get the SAME salt, so
    per-doc pair fan-out is unchanged while the global vocabulary and
    the broadcast grow ~31k-fold) — isolating exactly the claim under
    test: vocab-fit aggregate + broadcast scale with V, the pair stage
    does not."""
    from kinesis2elastic_spark.catalog import load
    from kinesis2elastic_spark.operators import corpus

    base = load(spark, SF_DIR, "documents")
    for v, k in ((64, 1), (256, 8), (1024, 33), (4096, 132)):
        docs = base.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("doc_id") % k),
                ),
                " ",
            ).alias("text"),
        )
        best = float("inf")
        n = 0
        for _ in range(2):
            t0 = time.time()
            n = corpus.collocations_detail(
                spark, SF_DIR, top_v=v, min_support=1, docs=docs
            ).count()
            best = min(best, time.time() - t0)
        print(f"colloc V={v} (vocab ~{31 * k}): wall={best:.2f}s pairs={n}")


def tri_tier(spark):
    """10x disjoint-clone tier for B141: per-triangle-count histogram
    must replicate exactly x10 (every clone contributes an identical
    triangle structure)."""
    from kinesis2elastic_spark.operators.graph import (
        _copurchase_edges,
        triangle_counts,
    )

    base = _copurchase_edges(spark, SF_DIR).localCheckpoint(eager=True)
    hists = {}
    for tier, edges in (
        ("1x", base),
        (
            "10x",
            base.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_k")
            ).select(
                F.concat("a", F.lit("!"), F.col("_k")).alias("a"),
                F.concat("b", F.lit("!"), F.col("_k")).alias("b"),
            ),
        ),
    ):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            hist = {
                r.n_tri: r.n_nodes
                for r in triangle_counts(edges)
                .groupBy("n_tri")
                .agg(F.count("*").alias("n_nodes"))
                .collect()
            }
            best = min(best, time.time() - t0)
        hists[tier] = hist
        print(
            f"tri {tier}: wall={best:.2f}s nodes_in_triangles={sum(hist.values())}"
        )
    ok = all(
        hists["10x"].get(k) == 10 * v for k, v in hists["1x"].items()
    ) and len(hists["10x"]) == len(hists["1x"])
    print(f"tri histogram scales exactly x10: {ok}")
    return ok


def main():
    spark = get_spark(
        "r10-tier", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "cc"):
        cc_tier(spark)
    if only in (None, "colloc"):
        colloc_vsweep(spark)
    if only in (None, "tri"):
        tri_tier(spark)


if __name__ == "__main__":
    main()
