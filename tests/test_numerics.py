"""Cross-engine determinism of the shared rounding path (numerics.py).

The round-3 driver found the one hash-red row of the round was caused by
``round(double, 4)`` on a decimal-tie quotient — Spark rounds the shortest
decimal repr HALF_UP, DuckDB rounds the binary value.  ``stable_round``
(Spark) and ``sql_stable_round`` (DuckDB oracle) replace the engine tie
MODE with a shared IEEE expression.  These tests push adversarial
tie-adjacent values through BOTH engines' actual evaluation paths and
require bit-equality, and pin the Python reference semantics under
hypothesis so the recipe itself can't regress.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis2elastic_spark.functions.numerics import sql_stable_round, stable_round


def _py_stable_round(x: float, n: int) -> float:
    """The reference semantics: the identical IEEE op chain in Python."""
    p = float(10**n)
    return math.floor(x * p + 0.5) / p


def _adversarial_values() -> list[float]:
    """Doubles engineered to sit on/next to decimal rounding ties:
    - shortest-repr ends in 5 at position n+1 (the Spark/DuckDB round()
      divergence class): x.xxxx5 literals;
    - int/int quotients that print as ...5 (the twa failure class);
    - dyadic exact ties (true .5 cases);
    - values one ulp below/above a tie.
    """
    vals: list[float] = []
    for base in (0.00005, 1.23455, 7.66665, 0.12345, 99.99995, 3.00015):
        vals += [base, -base, math.nextafter(base, 0.0), math.nextafter(base, 2 * base)]
    # quotient class: p/q whose repr ends in 5 at the 5th decimal
    for p, q in ((1, 128), (3, 256), (7, 64), (1, 20000), (12345, 16), (1, 3), (2, 7)):
        vals += [p / q, -p / q]
    # dyadic exact ties at 4dp: k/2^4 has exact .xxx25/.xxx75 endings
    vals += [k / 16 for k in range(1, 40, 3)]
    return vals


def test_stable_round_spark_vs_duckdb_tie_adjacent(spark):
    """The full cross-engine path: Spark stable_round vs DuckDB
    sql_stable_round on the same adversarial doubles must agree exactly
    (bit-equal as Python floats) at every scale used in the repo."""
    from pyspark.sql import functions as F

    vals = _adversarial_values()
    con = duckdb.connect()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    for n in (2, 3, 4, 6):
        got_spark = {
            r["i"]: r["y"]
            for r in sdf.select("i", stable_round(F.col("x"), n).alias("y")).collect()
        }
        expr = sql_stable_round("x", n)
        got_duck = {
            i: y
            for i, y in con.execute(
                f"SELECT i, {expr} AS y FROM (SELECT unnest(range({len(vals)})) AS i, "
                f"unnest(?) AS x)",
                [vals],
            ).fetchall()
        }
        for i, v in enumerate(vals):
            assert got_spark[i] == got_duck[i] == _py_stable_round(v, n), (
                n,
                v,
                got_spark[i],
                got_duck[i],
            )


def test_round_divergence_class_exists():
    """Documents the hazard stable_round removes: for repr-tie doubles,
    Python's repr-based round (Spark-like) and binary-value rounding
    (DuckDB-like) genuinely disagree — i.e. the adversarial set is not
    vacuous."""
    diverged = False
    for v in _adversarial_values():
        repr_rounded = float(
            __import__("decimal").Decimal(repr(v)).quantize(
                __import__("decimal").Decimal("0.0001"),
                rounding="ROUND_HALF_UP",
            )
        )
        binary_rounded = float(
            __import__("decimal").Decimal(v).quantize(
                __import__("decimal").Decimal("0.0001"),
                rounding="ROUND_HALF_UP",
            )
        )
        if repr_rounded != binary_rounded:
            diverged = True
            break
    assert diverged


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        st.tuples(
            st.integers(min_value=-10**6, max_value=10**6),
            st.integers(min_value=1, max_value=10**6),
        ).map(lambda t: t[0] / t[1]),
    ),
    st.sampled_from([2, 3, 4, 6]),
)
def test_py_reference_matches_duckdb(x, n):
    """Hypothesis: the Python reference chain equals DuckDB's evaluation
    of sql_stable_round for arbitrary doubles and int/int quotients."""
    con = duckdb.connect()
    (got,) = con.execute(f"SELECT {sql_stable_round('?::DOUBLE', n)}", [x]).fetchone()
    assert got == _py_stable_round(x, n)


def test_micro_unit_snap_spark_vs_duckdb_vs_python(spark):
    """Round-5 regression guard for the q_time_weighted_avg channel: the
    round-4 driver proved ``CAST(double AS DECIMAL(18,6))`` diverges across
    DuckDB *versions* (≥1.1 rounds exact binary, 1.0 rounds shortest repr —
    Spark always shortest repr).  The replacement is pure IEEE arithmetic —
    ``CAST(floor(x*1e6 + 0.5) AS BIGINT)`` — which must be bit-identical on
    every engine and version.  This pushes the same adversarial tie-adjacent
    doubles through both engines' actual evaluation paths."""
    from pyspark.sql import functions as F

    vals = _adversarial_values()
    con = duckdb.connect()
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, x double"
    )
    got_spark = {
        r["i"]: r["y"]
        for r in sdf.select(
            "i",
            F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("bigint").alias("y"),
        ).collect()
    }
    got_duck = dict(
        con.execute(
            "SELECT i, CAST(floor(x * 1000000 + 0.5) AS BIGINT) FROM "
            f"(SELECT unnest(range({len(vals)})) AS i, unnest(?) AS x)",
            [vals],
        ).fetchall()
    )
    for i, v in enumerate(vals):
        expect = int(math.floor(v * 1000000.0 + 0.5))
        assert got_spark[i] == got_duck[i] == expect, (v, got_spark[i], got_duck[i])


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),
            st.integers(min_value=1, max_value=10**6),
        ).map(lambda t: t[0] / t[1]),
    )
)
def test_micro_unit_snap_duckdb_matches_python(x):
    """Hypothesis sweep of the integer micro-unit snap: DuckDB's
    evaluation of floor(x*1e6+0.5)::BIGINT equals the identical IEEE
    chain in Python for arbitrary doubles and int/int quotients — the
    version-proof replacement for the double→DECIMAL cast."""
    con = duckdb.connect()
    (got,) = con.execute(
        "SELECT CAST(floor(?::DOUBLE * 1000000 + 0.5) AS BIGINT)", [x]
    ).fetchone()
    assert got == int(math.floor(x * 1000000.0 + 0.5))


def test_stable_round_null_passthrough(spark):
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(None,)], "x double")
    assert sdf.select(stable_round(F.col("x"), 4).alias("y")).first()["y"] is None
