"""Cross-engine md5-prefix integer keys — ONE definition of the pattern
used everywhere a hashed schema needs a portable integer derived from a
value's md5 (sampling keys, set checksums, reconciliation fingerprints).

Two halves that must stay in lockstep:

- ``md5_prefix_long(col, n_hex)`` (Spark): the first ``n_hex`` hex chars
  of ``md5(CAST(col AS STRING))`` read as a base-16 BIGINT —
  ``conv(substring(md5(...), 1, n), 16, 10)``.
- ``md5_hex_sql(expr, n_hex)`` (DuckDB twin): the same integer via strpos
  positional arithmetic on the hex digits (DuckDB has no conv()); pass
  the SQL expression whose md5 should be read, e.g.
  ``md5(CAST(doc_id AS VARCHAR))``'s inner ``CAST(...)``.

Width is a knob (the table-diff docstring's "widen the prefix when
auditing against an adversary"): n_hex=8 → 32-bit key (the default
everywhere), n_hex≤15 stays inside signed-BIGINT.  With the pattern
previously hand-expanded at five call sites, a transcription slip in any
one flipped a cross-engine hash — hence this module (r8 review finding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_long(col: Column, n_hex: int = 8) -> Column:
    """First ``n_hex`` md5 hex chars of the value's string form, as a
    BIGINT — identical in both engines for identical string renderings."""
    assert 1 <= n_hex <= 15, "n_hex=16 can exceed signed BIGINT"
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, n_hex), 16, 10
    ).cast("long")


def md5_hex_sql(inner_sql: str, n_hex: int = 8) -> str:
    """DuckDB twin of :func:`md5_prefix_long`: SQL reading the first
    ``n_hex`` hex digits of ``md5(<inner_sql>)`` as a BIGINT."""
    assert 1 <= n_hex <= 15
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({inner_sql}), {i + 1}, 1)) - 1)"
            f" * {16 ** (n_hex - 1 - i)}"
            for i in range(n_hex)
        )
        + ")"
    )
