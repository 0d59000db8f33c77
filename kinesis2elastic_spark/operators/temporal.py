"""Temporal join operators (driver-contract extension): as-of join — the
canonical time-series operator Spark lacks natively.

Spark-first formulation (no applyInPandas): union both sides tagged, one
window sort per key, ``last(..., ignorenulls)`` carries the most recent
right-side row forward onto each left row.  One shuffle on the join key,
state bounded by the window sort — the same shape a native ASOF physical
operator would produce.  The DuckDB oracle uses its native ``ASOF LEFT
JOIN``, making this an independent semantic check.

Determinism: the right side is pre-aggregated to one row per (key, time)
so "latest at equal times" cannot tie (ASOF tie order is otherwise
engine-unspecified).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, attach the right-side values
    with the greatest ``right_time`` <= ``left_time`` for the same key.
    ``right`` must be unique per (key, right_time)."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal _t → inclusive (<=) semantics
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_is_left",
        "_lrow",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(c) for c in value_cols],
    )
    return out


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order-day
    state (latest order key + that day's total) at event time."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    orders_daily = o.groupBy(
        F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("odate")
    ).agg(
        F.max("o_orderkey").alias("last_orderkey"),
        F.round(F.sum("o_totalprice"), 2).alias("day_total"),
    )
    out = asof_join(
        e.select("event_id", "ts", F.col("user_id").alias("cust")),
        orders_daily,
        key="cust",
        left_time="ts",
        right_time="odate",
        value_cols=["last_orderkey", "day_total"],
    )
    return out.select("event_id", "cust", "last_orderkey", "day_total")


def q_cosine_near_dup(spark: SparkSession, sf_dir: str, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (rows-only): LSH-bucket
    candidate generation (multi-table hyperplane signatures) then exact
    cosine verification at ``threshold`` — the embedding-space counterpart
    of MinHash text dedup.  A real corpus would use ~0.95; the synthetic
    embeddings' max pairwise cosine is 0.51, so the default returns the
    genuine tail of the similarity distribution instead of zero rows."""
    from ..functions.vectors import cosine
    from .llmops import q_ann_lsh  # noqa: F401  (same bucketing approach)

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "vec", F.col("embedding").cast("array<double>")
    )

    def plane_component(seed: int):
        return lambda d: (F.xxhash64(d, F.lit(seed)) % 2) * 2 - 1

    def bucket_sig(vec, table: int, n_planes: int = 6):
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1), plane_component(table * 1000 + p)
                    ),
                    lambda x, s: x * s.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    n_tables = 6
    sig = emb.select(
        "vec_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("table"), bucket_sig(F.col("vec"), t).alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "vec", "tb.table", "tb.bucket")
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        pairs.withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


def q_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: the UDF registration surface — a pandas UDF registered by name
    and invoked from SQL (the oracle recomputes the same quantity
    relationally, checking the UDF end to end)."""
    from ..catalog import register_views

    @F.pandas_udf("long")
    def ws_token_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").map(len)

    spark.udf.register("ws_token_count", ws_token_count)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, ws_token_count(text) AS n_tokens FROM documents"
    )


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_cosine_near_dup": q_cosine_near_dup,
    "q_registered_udf": q_registered_udf,
}

ORACLE = {
    "q_asof_join": """
        WITH orders_daily AS (
          SELECT o_custkey AS cust, o_orderdate AS odate,
                 max(o_orderkey) AS last_orderkey,
                 round(sum(o_totalprice), 2) AS day_total
          FROM orders GROUP BY o_custkey, o_orderdate)
        SELECT e.event_id, e.user_id AS cust, d.last_orderkey, d.day_total
        FROM events e
        ASOF LEFT JOIN orders_daily d
          ON e.user_id = d.cust AND e.ts >= d.odate
    """,
    "q_registered_udf": """
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    """,
}

ROWS_ONLY = {"q_cosine_near_dup"}
