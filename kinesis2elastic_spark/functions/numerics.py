"""Cross-engine-deterministic decimal rounding for hashed double columns.

The driver's correctness gate hashes query output values Spark-vs-DuckDB.
``round(double, n)`` is NOT hash-safe across engines: Spark rounds the
shortest decimal repr of the double HALF_UP (BigDecimal path), DuckDB
rounds the raw binary value — they disagree exactly when the repr ends in
a 5 at position n+1 while the binary value sits just below the tie (e.g.
the double printed as ``x.66665`` whose true value is ``x.66664999…``).
Quotients of small integers and averages of fixed-decimal data land on
such ties routinely (round-3 driver data disproved a "cannot tie" claim
on the time-weighted-average quotient).

``stable_round`` replaces the tie MODE with a tie EXPRESSION:
``floor(x * 10^n + 0.5) / 10^n`` is a fixed chain of IEEE-754 ops
(multiply, add, floor, divide — each individually correctly rounded), so
any engine evaluating it on the bit-identical input double produces the
bit-identical output.  Semantics differ from round() only at exact ties
for negative values (half-toward-+inf instead of half-away-from-zero),
which is irrelevant for cross-engine equality.

The SQL twin emits the identical expression for the DuckDB oracle.
``1e{n}`` literals, not ``10000.0``: decimal-form literals type as
DECIMAL in some engines and change the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, n: int) -> Column:
    """floor(col * 10^n + 0.5) / 10^n — engine-independent rounding of a
    double column (see module docstring).  Returns double; null-safe."""
    p = F.lit(float(10**n))
    return F.floor(col * p + F.lit(0.5)) / p


def sql_stable_round(expr: str, n: int) -> str:
    """The identical expression as SQL text for a DuckDB oracle."""
    return f"floor(({expr}) * 1e{n} + 0.5) / 1e{n}"
