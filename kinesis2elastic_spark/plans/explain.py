"""Physical-plan inspection helpers — the engine's own guardrails for the
properties that matter at 100 TB (SURVEY §4): pushdown reaching the scan,
column pruning, broadcast joins where a side is small, top-K instead of
global sort.  Used by tests so plan regressions fail CI, not production."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    return [l.strip() for l in formatted_plan(df).splitlines() if "PushedFilters" in l]


def read_schema(df: DataFrame) -> list[str]:
    return [l.strip() for l in formatted_plan(df).splitlines() if "ReadSchema" in l]


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def assert_plan(df: DataFrame, *, contains: tuple[str, ...] = (), absent: tuple[str, ...] = ()) -> None:
    plan = formatted_plan(df)
    for s in contains:
        assert s in plan, f"expected {s!r} in physical plan:\n{plan[:4000]}"
    for s in absent:
        assert s not in plan, f"expected NO {s!r} in physical plan:\n{plan[:4000]}"


# Logical nodes whose OUTPUT row count is bounded regardless of input size:
# an Aggregate's output is its group-key cardinality (the repo's doctrine
# restricts unpartitioned windows to bounded-cardinality keys — quantized
# scores, source names, bucket ids); a limit is bounded by construction;
# a LocalRelation is driver-literal data.
_BOUNDED_NODES = {"Aggregate", "GlobalLimit", "LocalLimit", "LocalRelation"}


def _subtree_bounded(node) -> bool:
    """True if every path from ``node`` to a leaf relation passes through a
    row-count-bounding operator (see ``_BOUNDED_NODES``)."""
    if node.nodeName() in _BOUNDED_NODES:
        return True
    n = node.children().length()
    if n == 0:
        return False  # a raw relation: corpus-sized
    return all(
        _subtree_bounded(node.children().apply(i)) for i in range(n)
    )


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Scale-killer detector (r11 VERDICT #2): Window nodes with an EMPTY
    partition spec whose input is NOT provably bounded — i.e. a global
    sort of corpus-sized data into one task.  Returns the offending
    nodes' one-line descriptions (empty list = plan is clean).

    Unpartitioned windows over bounded frames (cumulating a groupBy
    histogram, ranking a |sources|-row aggregate) are the repo's
    documented discipline and pass; a ``Window [..] ORDER BY`` directly
    over a scan fails."""
    out: list[str] = []

    def walk(node) -> None:
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            child = node.children().apply(0)
            if not _subtree_bounded(child):
                out.append(node.simpleString(120))
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out
