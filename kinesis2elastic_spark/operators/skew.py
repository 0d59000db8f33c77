"""Skew-mitigation operators (SURVEY §4 scale posture: "salted keys if
skewed logGroup").

At 100 TB a handful of hot keys (one chatty logGroup, one bot user_id) can
pin a whole stage on one task.  AQE's skew-join splitting handles the join
case at runtime; these helpers are the *declarative* forms for when the
skew is known — and they are exact: results are identical to the unsalted
plan, which is precisely what the DuckDB oracle checks.

- :func:`salted_agg` — two-stage aggregation: stage 1 groups by
  (key, salt) so a hot key's rows spread over ``n_salts`` tasks and
  map-side partials stay small; stage 2 combines the partials per key.
  Works for any algebraic aggregate (sum/count/min/max decompose).
- :func:`salted_broadcast_join` — the build side is replicated per salt
  value and the probe side joins on (key, salt): each hot-key partition
  lands on a different task.  (With a broadcast build side Spark already
  avoids probe-side shuffling; the salted form is the pattern needed when
  the build side must shuffle — shown here in joinable form.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Exact two-stage salted aggregation.

    ``sum_cols`` maps input column -> output alias; ``count_alias`` adds a
    row count.  The salt is derived from a high-cardinality column (or
    ``monotonically_increasing_id`` when none is given) so a hot key's rows
    spread uniformly."""
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    stage1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(
            *[F.sum(src).alias(f"_s_{alias}") for src, alias in sum_cols.items()],
            F.count("*").alias("_s_n"),
        )
    )
    aggs = [F.sum(f"_s_{alias}").alias(alias) for alias in sum_cols.values()]
    if count_alias:
        aggs.append(F.sum("_s_n").alias(count_alias))
    return stage1.groupBy(*keys).agg(*aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Exact salted equi-join: the dim side is exploded once per salt value
    and the fact side computes a uniform salt, so the shuffle key
    (key, salt) splits every hot key ``n_salts`` ways."""
    salted_dim = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_fact = fact.withColumn("_salt", salt_col)
    return salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key]) & (salted_fact["_salt"] == salted_dim["_salt"]),
    ).drop("_salt")


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over the 5 hot event_type keys; results must be
    byte-identical to a plain groupBy (the oracle runs the plain form)."""
    e = load(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        sum_cols={"value": "sum_value"},
        count_alias="n",
        salt_source="event_id",
    )
    return out.select(
        "event_type", F.round("sum_value", 2).alias("sum_value"), F.col("n")
    )


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of lineitem against the 25-row nation dim through the
    supplier key path (suppkey % 25 is the synthetic hot key); aggregated
    output must equal the plain-join oracle."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "hot_key", (F.col("l_suppkey") % 5).cast("int")
    )
    dim = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("dim_key"), "r_name"
    )
    joined = salted_broadcast_join(li, dim, "hot_key", "dim_key", salt_source="l_orderkey")
    return joined.groupBy("r_name").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
    )


QUERIES = {
    "q_skew_salted_agg": q_skew_salted_agg,
    "q_skew_salted_join": q_skew_salted_join,
}

ORACLE = {
    "q_skew_salted_agg": """
        SELECT event_type, round(sum(value), 2) AS sum_value, count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q_skew_salted_join": """
        SELECT r_name, count(*) AS n, round(sum(l_extendedprice), 2) AS price_sum
        FROM lineitem JOIN region ON (l_suppkey % 5) = r_regionkey
        GROUP BY r_name
    """,
}

ROWS_ONLY: set[str] = set()
