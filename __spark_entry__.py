"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped pricing aggregate at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each (omitted for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis2elastic_spark.session import tune_session


def _collect_modules():
    """Import every operator module that defines QUERIES/ORACLE dicts."""
    # Ordered so a driver that caps its run still sees every *module*:
    # reference-semantics (decode/pipeline), LLM-ops, temporal/skew/multimodal
    # first; the long relational/relational_ext tails (already driver-green in
    # round 1) come last.
    mods = []
    from kinesis2elastic_spark.operators import relational

    for name in (
        "decode",
        "pipeline",
        "llmops",
        "corpus",
        "tableops",
        "temporal",
        "skew",
        "multimodal",
    ):
        try:
            mod = __import__(
                f"kinesis2elastic_spark.operators.{name}", fromlist=[name]
            )
            mods.append(mod)
        except ImportError:
            pass
    mods.append(relational)
    for name in ("relational_ext",):
        try:
            mod = __import__(
                f"kinesis2elastic_spark.operators.{name}", fromlist=[name]
            )
            mods.append(mod)
        except ImportError:
            pass
    return mods


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    from kinesis2elastic_spark.operators.relational import q_pricing_agg

    return q_pricing_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _collect_modules():
        for name, fn in mod.QUERIES.items():
            def wrapped(spark, sf_dir, _fn=fn):
                tune_session(spark)
                return _fn(spark, sf_dir)

            out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omit → rows-only check)."""
    out: dict[str, str] = {}
    for mod in _collect_modules():
        rows_only = getattr(mod, "ROWS_ONLY", set())
        for name, sql in mod.ORACLE.items():
            if name not in rows_only:
                out[name] = sql
    return out
