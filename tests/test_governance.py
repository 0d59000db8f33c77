"""B183 governance read policies — mask semantics, incl. the r12-ADVICE
short-string cases the fixture column never exercised."""

import duckdb
import pytest

from kinesis2elastic_spark.operators.governance import apply_read_policy


def _mask_partial4(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    out = apply_read_policy(df, {"mask": {"s": "partial4"}})
    return [r.s for r in out.collect()]


def test_partial4_long_values(spark):
    assert _mask_partial4(spark, ["BUILDING", "12345"]) == [
        "****DING",
        "*2345",
    ]


def test_partial4_short_values_never_shown_in_full(spark):
    """length <= 4: at least one char starred (r12 ADVICE — the old form
    displayed these in full); length preserved; empty/null stable."""
    vals = ["a", "ab", "abc", "abcd", "", None]
    got = _mask_partial4(spark, vals)
    assert got == ["*", "*b", "*bc", "*bcd", "", None]
    for v, g in zip(vals, got):
        if v:  # non-empty: masked form must differ from the value
            assert g != v
            assert len(g) == len(v)


def test_partial4_spark_duckdb_agree_on_short_strings(spark):
    """The oracle SQL and the Spark expression must agree below length 4
    (they diverged before the fix: negative substr start in DuckDB)."""
    vals = ["a", "ab", "abc", "abcd", "abcde", "BUILDING", ""]
    got = _mask_partial4(spark, vals)
    con = duckdb.connect()
    expr = (
        "repeat('*', length(s) - greatest(least(4, length(s) - 1), 0)) || "
        "substr(s, length(s) - greatest(least(4, length(s) - 1), 0) + 1, "
        "greatest(least(4, length(s) - 1), 0))"
    )
    rows = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?::VARCHAR[]) AS s)", [vals]
    ).fetchall()
    assert [r[0] for r in rows] == got


def test_hash_and_null_masks(spark):
    df = spark.createDataFrame([("x", 1), ("x", 2)], "s string, n int")
    out = apply_read_policy(df, {"mask": {"s": "hash", "n": "null"}}).collect()
    assert out[0].s == out[1].s and len(out[0].s) == 32
    assert out[0].n is None and out[1].n is None


def test_unknown_mask_and_missing_column_fail_loud(spark):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="unknown mask kind"):
        apply_read_policy(df, {"mask": {"s": "rot13"}})
    with pytest.raises(ValueError, match="absent columns"):
        apply_read_policy(df, {"mask": {"zz": "hash"}})
