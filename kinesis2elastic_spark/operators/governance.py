"""Column masking + row-filter read policies (B183).

The governance layer a shared 100 TB table needs: analysts query
through a POLICY that (a) filters rows they may see and (b) masks
columns they may see only in protected form — applied AT READ TIME as
plain Catalyst expressions (zero UDFs, zero data rewrite, composes
with every pruning layer since filters/masks sit above the scan).

Mask kinds (the Databricks/Snowflake masking-policy triad):
- ``hash``   — deterministic md5 token: hides the value but PRESERVES
  joinability/groupability (same input → same token everywhere, the
  B43-redaction sibling for keys rather than free text);
- ``partial4`` — all but the last 4 chars starred (the call-center
  phone/card display form; the fixture applies it to the segment
  column since the testdata customer table carries no phone), length
  preserved;
- ``null``   — full suppression, type preserved.

PII columns stay maskable AND the plan stays prunable: the row filter
is a normal predicate (pushes down), masks are projections.  Cite:
reference repo has no governance layer (Go relay); this extends the
engine the way shared lakehouse deployments are actually queried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


def apply_read_policy(df: DataFrame, policy: dict) -> DataFrame:
    """Apply ``{"where": <sql-bool>, "mask": {col: kind}}`` to a frame.
    Unknown mask kinds and masked columns absent from the frame fail
    loud — a silently-skipped mask is a leak, not a convenience."""
    where = policy.get("where")
    if where:
        df = df.filter(F.expr(where))
    cols = []
    masks = dict(policy.get("mask", {}))
    missing = set(masks) - set(df.columns)
    if missing:
        raise ValueError(f"mask policy names absent columns: {sorted(missing)}")
    for c in df.columns:
        kind = masks.get(c)
        if kind is None:
            cols.append(F.col(c))
        elif kind == "hash":
            cols.append(F.md5(F.col(c).cast("string").cast("binary")).alias(c))
        elif kind == "partial4":
            # visible suffix = min(4, length-1): a value of length <= 4
            # must NOT be displayed in full (r12 ADVICE — the old
            # greatest(length-4, 0) stars contributed nothing and the
            # last-4 substring was the whole value).  At least one char
            # is always starred; the suffix substring uses a POSITIVE
            # start so Spark and DuckDB agree on short strings.
            vis = f"greatest(least(4, length(`{c}`) - 1), 0)"
            cols.append(
                F.when(F.col(c).isNull(), F.lit(None).cast("string"))
                .otherwise(
                    F.concat(
                        F.expr(f"repeat('*', length(`{c}`) - {vis})"),
                        F.expr(
                            f"substring(`{c}`, length(`{c}`) - {vis} + 1, {vis})"
                        ),
                    )
                )
                .alias(c)
            )
        elif kind == "null":
            cols.append(F.lit(None).cast(dict(df.dtypes)[c]).alias(c))
        else:
            raise ValueError(f"unknown mask kind {kind!r} for column {c!r}")
    return df.select(*cols)


POLICY_ANALYST = {
    # analysts see only in-good-standing accounts, names tokenized,
    # segments display-masked, nation suppressed
    "where": "c_acctbal >= 0",
    "mask": {"c_name": "hash", "c_mktsegment": "partial4", "c_nationkey": "null"},
}


def q_masked_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B183 contract query: customers through POLICY_ANALYST.  Hashed
    columns prove every mask kind byte-for-byte cross-engine: the md5
    token (joinability-preserving), the starred phone (length
    preserved, last 4 visible), the suppressed comment (NULL of the
    original type), and the row filter (negative balances absent) —
    DuckDB restates all four declaratively."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    out = apply_read_policy(c, POLICY_ANALYST)
    return out.select(
        "c_custkey",
        F.col("c_name").alias("name_token"),
        F.col("c_mktsegment").alias("segment_masked"),
        F.col("c_nationkey").cast("long").alias("nation_masked"),
    )


QUERIES = {"q_masked_read": q_masked_read}

ORACLE = {
    "q_masked_read": """
        SELECT c_custkey,
               md5(CAST(c_name AS VARCHAR)) AS name_token,
               repeat('*', length(c_mktsegment)
                           - greatest(least(4, length(c_mktsegment) - 1), 0))
                 || substr(c_mktsegment,
                           length(c_mktsegment)
                             - greatest(least(4, length(c_mktsegment) - 1), 0)
                             + 1,
                           greatest(least(4, length(c_mktsegment) - 1), 0))
                 AS segment_masked,
               CAST(NULL AS BIGINT) AS nation_masked
        FROM customer
        WHERE c_acctbal >= 0
    """,
}

ROWS_ONLY: set[str] = set()
