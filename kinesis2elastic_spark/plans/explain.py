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
