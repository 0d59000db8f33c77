"""PageRank invariants (rows-only query: iterative, no SQL oracle)."""

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import graph


def test_pagerank_known_graph(spark):
    """3-node chain a→b→c with back-edge c→a: b and c get fed, a only by
    c; ranks must sum to 3 and c (fed by b which is fed by a) must beat
    a nothing-special baseline.  Against networkx-style reference values
    computed by hand for d=0.85: symmetric cycle → all ranks equal 1."""
    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    ranks = {r.node: r.rank for r in graph.pagerank(cycle).collect()}
    assert ranks.keys() == {"a", "b", "c"}
    for v in ranks.values():
        assert v == pytest.approx(1.0, abs=1e-4)


def test_pagerank_dangling_mass_conserved(spark):
    """a→b, b is dangling: total rank mass must stay = n_nodes, and the
    fed node must outrank the unfed one."""
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    ranks = {r.node: r.rank for r in graph.pagerank(edges).collect()}
    assert sum(ranks.values()) == pytest.approx(2.0, abs=1e-3)
    assert ranks["b"] > ranks["a"]


def test_pagerank_topk_invariants(spark, sf_dir):
    """Detailed ranking: top-k rows, every rank >= (1-d), deterministic
    ordering."""
    df = graph.pagerank_topk(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 25
    assert all(r.rank >= (1 - graph.PR_DAMPING) - 1e-9 for r in rows)
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_q_pagerank_self_check_flags(spark, sf_dir):
    """Contract query: one row, exact node count, every invariant flag
    TRUE (mass conservation, teleport floor, hub dominance)."""
    row = graph.q_pagerank(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_nodes > 0
    assert r.mass_conserved_ok and r.teleport_floor_ok and r.hub_outranks_ok
