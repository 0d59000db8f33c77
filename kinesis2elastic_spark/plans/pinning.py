"""Loop-state pinning that ACTUALLY truncates the plan — the iterative-
DataFrame discipline ``localCheckpoint`` alone does not deliver.

The r10 finding (measured, tools/r10_tier.py + SCALING.md addendum):
``DataFrame.localCheckpoint(eager=True)`` truncates the RDD lineage, but
the resulting ``LogicalRDD`` leaf keeps a LAZY reference to the original
plan for statistics estimation (``originStats``).  In an iterative loop
each round's checkpoint origin embeds the previous rounds' origins, and
because query compilation copies plan trees, the first stats walk over a
round-k leaf expands an exponentially large origin TREE.  Every
stats-driven optimizer step pays it — join-strategy selection,
``InjectRuntimeFilter``'s ``canBroadcastBySize``, AQE sizing — so a
min-label fixpoint on the sf0.1 sparse trade graph went 0.3 s/round for
~16 rounds and then 1.3 s → 7.5 s → 55 s (×~7 every 2 rounds, driver
pegged inside ``SizeInBytesOnlyStatsPlanVisitor``; jstack-confirmed).
The repo never saw this before r10 because every earlier loop runs ≤ 8
rounds (BFS 4, LPA 3, PageRank 8) — the blow-up bites from ~15 rounds.

``pin`` closes the hole: localCheckpoint (materialize + truncate RDD
lineage), then rebuild the DataFrame directly over the checkpointed
``RDD[InternalRow]`` via ``internalCreateDataFrame`` — the new plan is a
bare LogicalRDD with NO origin, so stats fall back to the leaf default
and plan-compile cost stays O(current plan), flat across rounds (same
fixpoint: 27 rounds, 11.7 s total after the fix).  Falls back to the
plain checkpoint if the internal classic-session API is unavailable
(e.g. Spark Connect), where short loops remain correct and long loops
degrade loudly in wall clock, not in results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate BOTH the RDD lineage and the
    optimizer's origin-stats chain.  Use for loop-carried state in
    iterative kernels (every round or every other round per the
    replaced/accumulated-state cadence rule); plain one-shot
    materializations can keep ``localCheckpoint``."""
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        rdd = jdf.queryExecution().toRdd()
        jdf2 = df.sparkSession._jsparkSession.internalCreateDataFrame(
            rdd, jdf.schema(), False
        )
        return DataFrame(jdf2, df.sparkSession)
    except Exception:  # noqa: BLE001 - non-classic session: degrade gracefully
        return ck
