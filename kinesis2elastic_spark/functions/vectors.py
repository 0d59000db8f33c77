"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with/aggregate), no Python in the hot path.

All arithmetic is done in double: float32 accumulation loses precision and
(worse for the oracle) differs between engines.  Summation is sequential
left-to-right in both Spark's ``aggregate`` and DuckDB's list functions, so
rounded results are comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to array<double> first by callers."""
    return dot(a, b) / (norm(a) * norm(b))
