"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped pricing aggregate at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each (omitted for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import glob
import json
import os
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
        "timetravel",
        "partitioning",
        "lakefmt",
        "geo",
        "governance",
        "temporal",
        "sequence",
        "skew",
        "graph",
        "multimodal",
        "stream_equiv",
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


def _driver_history(
    base: str | None = None,
) -> tuple[frozenset, frozenset, dict]:
    """(hash_green, ever_checked, last_green_round) from every
    CORRECTNESS_r*.json the driver has written so far.  Reading the files
    (instead of a frozen literal) means each round's ordering automatically
    deprioritizes what the previous rounds already proved — the round-2
    postmortem found a stale hand-maintained set starved 48 queries of any
    correctness row.  ``last_green_round[name]`` is the highest round number
    whose file recorded a hash green for ``name`` (drives the tier-3
    stale-green rotation)."""
    green: set[str] = set()
    checked: set[str] = set()
    last_green: dict[str, int] = {}
    if base is None:
        base = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(base, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path)
        try:
            rnd = int(stem.replace("CORRECTNESS_r", "").replace(".json", ""))
        except ValueError:
            rnd = 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            checked.add(name)
            if row.get("hash_match") is True:
                green.add(name)
                last_green[name] = max(last_green.get(name, 0), rnd)
    return frozenset(green), frozenset(checked), last_green


def _ordered_names(mods) -> list[tuple]:
    """(name, fn) pairs ordered so a driver that caps its run at N entries
    spends its budget on queries with no hard-signal row yet:

      tier 0 — oracle-backed, checked but never hash-green: re-checks of
               fixed regressions (small and bounded, so they go first —
               leaving one red unchecked would hide a claimed fix)
      tier 1 — oracle-backed, never driver-checked (ROUND-ROBINED across
               modules: evidence breadth beats finishing one module's tail)
      tier 2 — rows-only, never driver-checked
      tier 3 — everything with a green (or rows-recorded) driver row,
               STALEST GREEN FIRST: sorted ascending by the round of the
               most recent hash green (ties broken by name for a stable
               order), so a 50-slot driver run refreshes the 50 rows that
               have gone longest unverified and the whole registry
               re-verifies every ~4 rounds instead of re-checking the
               same module-order prefix forever (r6 VERDICT #4)
    """
    green, checked, last_green = _driver_history()
    # Round-new queries yield to queries that have waited longer (a capped
    # driver run should clear the oldest evidence debt first).  EMPTY in
    # round 5: the only red row (q_time_weighted_avg) sits alone in tier 0
    # and leads; the 11 r5 registrations (twa diagnostics, spool fixture,
    # 8 streaming equivalences) are the only never-checked queries, so
    # they follow immediately — well inside a 50-slot run.
    newest: set = set()
    tier0_by_mod: list[list[tuple]] = []
    tiers: list[list[tuple]] = [[], [], []]
    for mod in mods:
        rows_only = getattr(mod, "ROWS_ONLY", set())
        mod_tier0: list[tuple] = []
        for name, fn in mod.QUERIES.items():
            has_oracle = name not in rows_only and name in getattr(mod, "ORACLE", {})
            if name in green:
                tiers[2].append((name, fn))
            elif has_oracle and name not in checked:
                mod_tier0.append((name, fn))
            elif has_oracle:
                tiers[0].append((name, fn))
            elif name not in checked:
                tiers[1].append((name, fn))
            else:
                tiers[2].append((name, fn))
        if mod_tier0:
            tier0_by_mod.append(mod_tier0)

    def _interleave(by_mod: list[list[tuple]]) -> list[tuple]:
        out: list[tuple] = []
        i = 0
        while any(by_mod):
            for mod_list in by_mod:
                if i < len(mod_list):
                    out.append(mod_list[i])
            by_mod = [m for m in by_mod if len(m) > i + 1]
            i += 1
        return out

    # Two interleave passes: every module's OLD unchecked entries first
    # (globally), then this round's additions — so a capped run clears the
    # oldest evidence debt before spending slots on brand-new queries.
    old_by_mod = [[t for t in m_ if t[0] not in newest] for m_ in tier0_by_mod]
    new_by_mod = [[t for t in m_ if t[0] in newest] for m_ in tier0_by_mod]
    interleaved = _interleave([m_ for m_ in old_by_mod if m_]) + _interleave(
        [m_ for m_ in new_by_mod if m_]
    )
    stale_first = sorted(
        tiers[2], key=lambda t: (last_green.get(t[0], 0), t[0])
    )
    return tiers[0] + interleaved + tiers[1] + stale_first


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
