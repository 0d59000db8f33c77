"""Extended relational surface (SURVEY §2 Part B, second tier): analytic
window frames, statistical and percentile aggregates, grouping sets,
unpivot, map/array lateral ops, correlated subqueries, and the SQL entry
path (TPC-H Q3 shape via ``spark.sql`` over registered views).

Same engine-comparability conventions as ``relational.py`` (identical
aliases, rounded floats, BIGINT casts for computed integers, unique-key
tie-breaks).  Scale notes inline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load, register_views
from ..functions.numerics import stable_round


RANK_RANGE_BUCKETS = 4096


def distributed_order_stats(
    df: DataFrame,
    value_col: str,
    tiebreak: str,
    n_buckets: int = RANK_RANGE_BUCKETS,
) -> DataFrame:
    """Exact global rank over ``ORDER BY value_col, tiebreak`` with NO
    unpartitioned corpus-sized window (r11 VERDICT #2 — the WindowExec
    single-task-sort class).  Returns the input plus ``__rk`` (1-based
    global rank, BIGINT) and ``__n_total``.

    Plan (the B98 ``distributed_ntile`` bounded-histogram doctrine applied
    to a continuous sort key):
    1. min/max of ``value_col`` — one map-combinable scan, 1-row result,
       broadcast back.
    2. Each row gets a range bucket ``floor((v-lo)/width)`` over
       ``n_buckets`` cells.  IEEE division/floor are monotone in ``v``, so
       bucket order == value order; ties inside a bucket are resolved
       exactly by the (value, tiebreak) window below — unlike quantization,
       no precision is lost.
    3. groupBy(bucket) histogram — bounded (≤ n_buckets rows at ANY corpus
       size); cumulative counts ride ONE window over that bounded frame.
    4. row_number per bucket (hash-partitioned window, ~n/n_buckets rows
       per task) + broadcast-joined cumulative offset = exact global rank.
    The only unpartitioned window in the plan cumulates the ≤4096-row
    histogram — whitelisted by ``plans.explain.unbounded_global_windows``.
    """
    internal = {"__bkt", "__rn", "__rk", "__cumb", "__n_total", "__lo", "__hi"}
    clash = internal & set(df.columns)
    if clash:
        raise ValueError(f"distributed_order_stats column clash: {clash}")
    v = F.col(value_col)
    bounds = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    rows = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__bkt",
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (v - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / n_buckets)
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("__lo", "__hi")
    )
    hist = rows.groupBy("__bkt").agg(F.count("*").alias("__cnt"))
    wh = W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    wt = W.orderBy("__bkt").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(wh), F.lit(0))
        .cast("long")
        .alias("__cumb"),
        F.sum("__cnt").over(wt).cast("long").alias("__n_total"),
    )
    wq = W.partitionBy("__bkt").orderBy(value_col, tiebreak)
    return (
        rows.withColumn("__rn", F.row_number().over(wq).cast("long"))
        .join(F.broadcast(cum), "__bkt")
        .withColumn("__rk", F.col("__cumb") + F.col("__rn"))
        .drop("__bkt", "__rn", "__cumb")
    )


def q_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a unique global ordering —
    computed via the distributed exact-rank kernel, not a global window
    (r11 VERDICT #2: the former ``W.orderBy(value, event_id)`` moved the
    whole events table into one WindowExec task).

    Because the ordering (value, event_id) is UNIQUE per row, rank ==
    row_number and every peer group has size 1, so the SQL window
    functions reduce to pure BIGINT rank arithmetic:
    ``percent_rank = (rk-1)/(n-1)``, ``cume_dist = rk/n``, and ntile's
    first ``n%k`` tiles get ``n div k + 1`` rows.  The oracle states the
    same contract declaratively (``ntile(4)/percent_rank()/cume_dist()
    OVER (ORDER BY value, event_id)``), so the driver hash check proves
    the rank-arithmetic plan IS those window functions."""
    e = load(spark, sf_dir, "events")
    ranked = distributed_order_stats(
        e.select("event_id", "value"), "value", "event_id"
    )
    k = 4
    rk, n = F.col("__rk"), F.col("__n_total")
    # standard SQL ntile split in pure BIGINT arithmetic (the B98 rule:
    # first n%k tiles get one extra row; doubles lose exactness > 2^53)
    tile = F.expr(
        f"CASE WHEN __n_total div {k} = 0 THEN __rk "
        f"WHEN __rk <= (__n_total % {k}) * (__n_total div {k} + 1) "
        f"THEN (__rk - 1) div (__n_total div {k} + 1) + 1 "
        f"ELSE (__n_total % {k}) "
        f"   + (__rk - (__n_total % {k}) * (__n_total div {k} + 1) - 1) "
        f"     div (__n_total div {k}) + 1 END"
    )
    return ranked.select(
        "event_id",
        tile.cast("long").alias("quartile"),
        # int/int quotients ((rank-1)/(n-1), n_le/n) — repr-tie hazard
        stable_round((rk - 1) / (n - 1), 6).alias("pct_rank"),
        stable_round(rk / n, 6).alias("cume"),
    )


def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame
    (last_value without it silently means 'current row' — classic trap)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
    )


def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a calendar interval (7 trailing days) — value-based
    frames include peers, so no tie-break is needed for determinism."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2) AS trailing_7d
        FROM orders
        """
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group.  At 100 TB the
    exact form needs a sort per group — approx_percentile is the scale
    variant (B5's sketch argument); both are exposed, oracle checks exact."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.count("*").alias("n"),
    )


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — the 100 TB path for q_percentiles:
    fixed-size mergeable sketch per partition instead of a per-group sort.

    Sketch estimates legitimately differ between engines, so the raw
    estimates are not emitted; the query computes the exact percentiles
    alongside and emits ``est_ok`` = both estimates within 5% (with a
    small absolute floor for near-zero values) — oracle-checkable: DuckDB
    recomputes the exact percentiles and expects TRUE."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("_amed"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("_ap90"),
        F.percentile("value", F.lit(0.5)).alias("_emed"),
        F.percentile("value", F.lit(0.9)).alias("_ep90"),
        F.count("*").alias("n"),
    )

    def ok(approx, exact):
        tol = F.greatest(F.abs(F.col(exact)) * 0.05, F.lit(0.01))
        return F.abs(F.col(approx) - F.col(exact)) <= tol

    return agg.select(
        "event_type",
        F.round("_emed", 4).alias("exact_med"),
        F.round("_ep90", 4).alias("exact_p90"),
        "n",
        (ok("_amed", "_emed") & ok("_ap90", "_ep90")).alias("est_ok"),
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance (sample), correlation,
    covariance — all single-pass partial-aggregable."""
    e = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr("value", uid), 6).alias("corr_uid"),
        F.round(F.covar_samp("value", uid), 6).alias("covar_uid"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping flags (B6 beyond rollup)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 completion: full CUBE over two dims with grouping flags — all
    four grouping-set combinations from one pass (Catalyst expands to a
    single Expand + partial-aggregable hash agg, not four scans)."""
    o = load(spark, sf_dir, "orders")
    # grouping() is only resolvable INSIDE the cube aggregate (Catalyst
    # rewrites it against the Expand's spark_grouping_id), so the flags
    # must be agg expressions, not a downstream projection
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "total"
        )
    )


def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12-B14 completion: nth_value over the full partition frame and
    the previous-NON-NULL value (last(..., ignorenulls) over a
    preceding-exclusive frame — Spark's lag() has no IGNORE NULLS, so
    this frame form IS the portable idiom; DuckDB writes the same with
    last_value(...) IGNORE NULLS)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wprev = w.rowsBetween(W.unboundedPreceding, -1)
    non_error = F.nullif("event_type", F.lit("error"))
    return e.select(
        "user_id",
        "event_id",
        F.nth_value("event_type", 2).over(wfull).alias("second_type"),
        F.last(non_error, ignorenulls=True).over(wprev).alias("prev_nonerror_type"),
    )


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation (LISTAGG equivalent, expressed
    deterministically as sort(collect_set) → join)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.count("*").alias("n"),
    )


def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation, emitted as deterministic scalar strings: per-user
    sorted event types / rounded values joined with '|'.  Scalars (not raw
    array columns) so any downstream canonicalizer can hash-sort the rows;
    values go through DECIMAL(18,2) so both engines print a fixed scale."""
    e = load(spark, sf_dir, "events")
    val_str = F.round("value", 2).cast("decimal(18,2)").cast("string")
    return e.groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("event_type"))).alias("types"),
        F.concat_ws("|", F.array_sort(F.collect_list(val_str))).alias("values_sorted"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide measures → (metric, val) rows."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.selectExpr(
        "l_orderkey",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount) AS (metric, val)",
    ).select("l_orderkey", "metric", F.round("val", 2).alias("val"))


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view with element position (0-based)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse props into map<string,long>, explode
    to (key, value) rows (map_keys/map_values are the same plumbing)."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select("event_id", F.explode(m).alias("key", "value"))


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (planned as a left outer aggregate join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT round(max(o_totalprice), 2) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        """
    )


def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) through the SQL surface — scan pruning,
    selective dim filter, two shuffled joins, agg, top-10."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


SQL_Q5 = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                                AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
"""

SQL_Q18 = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
"""


def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) through the SQL surface: a 6-table
    join where the region/nation dims broadcast and the c_nationkey =
    s_nationkey condition rides the supplier join — the canonical
    star-plus-constraint plan.  Identical SQL runs on the DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_Q5)


def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): IN-subquery over an aggregate
    (plans as a semi join against the grouped lineitem), then a 3-table
    join + re-aggregation and a deterministic top-100."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_Q18)


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: post-aggregation predicate (planned as Filter over the
    aggregate — no second scan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12 AND sum(o_totalprice) > 100000
        """
    )


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (planned as semi/anti joins)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') AS has_f_order
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """
    )


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS correlated subqueries (planned as left-semi and
    left-anti joins — no subquery re-execution per row)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        """
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per customer by price —
    the lateral form of top-K-per-group (Spark plans the correlated
    limit-sort as a lateral join, not a per-row re-scan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o.o_orderkey, o.top_price
        FROM customer c, LATERAL (
            SELECT o_orderkey, round(o_totalprice, 2) AS top_price
            FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2) o
        """
    )


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: NULLIF/COALESCE/IS DISTINCT FROM — the
    three-valued-logic cases that differ from plain equality."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id,
               nullif(event_type, 'error')                         AS type_or_null,
               coalesce(nullif(event_type, 'error'), 'masked')     AS type_masked,
               event_type IS DISTINCT FROM 'error'                 AS not_error_nullsafe,
               CASE WHEN nullif(event_type, 'error') IS NULL THEN 0 ELSE 1 END AS has_type
        FROM events
        """
    )


def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: day/month offsets, month end, least/greatest."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 10).alias("plus_10d"),
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.least(d, F.lit("1995-01-01").cast("date")).alias("clamped_lo"),
        F.greatest(d, F.lit("1997-01-01").cast("date")).alias("clamped_hi"),
    )


def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B103: the Arrow grouped-aggregate pandas UDAF surface
    (``@pandas_udf`` returning a scalar per group — the third custom-
    function shape after scalar pandas UDFs (B36) and UDTFs): an EXACT
    per-group order statistic Spark's built-ins don't offer
    (``percentile_approx`` is approximate; ``median`` needs 3.4+ and
    interpolates).  Lower median of the value column in integer
    micro-units — all-BIGINT, hash-safe by construction.

    The whole group's values land in one Arrow batch per group — correct
    for bounded per-key cardinality (events-per-user here); unbounded
    keys would use the two-pass quantile assignment (distributed_ntile's
    histogram trick) instead.  One shuffle on user_id; the UDAF runs
    vectorized on Arrow buffers, not Python rows.

    Oracle: DuckDB's ``quantile_disc(x, 0.5)`` is exactly the lower
    median (element at 0-index (n-1)//2 — verified on even/odd/single/
    duplicate-heavy groups)."""

    @F.pandas_udf("long")
    def lower_median(s: pd.Series) -> int:
        # Arrow hands the buffer over zero-copy and read-only: np.sort
        # (copying) rather than in-place .sort()
        import numpy as np

        a = np.sort(s.to_numpy())
        return int(a[(len(a) - 1) // 2])

    # Spark refuses to mix a group-agg pandas UDF with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # companion count is a UDAF too
    @F.pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return len(s)

    e = load(spark, sf_dir, "events")
    v_micro = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    return (
        e.select("user_id", v_micro.alias("v"))
        .groupBy("user_id")
        .agg(
            lower_median(F.col("v")).alias("median_v_micro"),
            n_rows(F.col("v")).alias("n_obs"),
        )
    )


QSEL_BUCKETS = 4096
QSEL_PCTS = (25, 50, 75, 90, 99)


def q_quantile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B107: GLOBAL exact quantile selection with NO global sort — the
    100-TB form of an exact order statistic over the whole table (the
    per-group exact percentiles of q_percentiles sort within bounded
    groups; a global ``orderBy`` would single-task the corpus).

    Classic two-pass distributed selection:
      pass 1 — snap values to integer micro-units, range-bucket them into
      ≤``QSEL_BUCKETS`` coarse bins (width from the global min/max — a
      3-scalar agg), and build the bin histogram: a map-combinable
      groupBy whose output is ≤4096 rows AT ANY CORPUS SIZE, collected to
      the driver (bounded, documented).  Walking its cumulative counts
      locates, for each target rank, the one bin that contains it and the
      rank's offset within that bin.
      pass 2 — a broadcast semi-join keeps ONLY the rows of the needed
      bins (≤ |pcts|/4096 of the data), ranks each bin with a window
      partitioned by bin (never the table), and picks the offsets.

    Target ranks use pure integer arithmetic mirrored verbatim in the
    oracle — rank_p = 1 + (p·(n−1)) div 100, the lower (discrete)
    quantile — so the hashed (pct, rank, v_micro, n) rows are
    cross-engine exact.  All-BIGINT output."""
    e = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    return global_quantile_select(e.select(v.alias("v")), QSEL_PCTS)


def global_quantile_select(t: DataFrame, pcts) -> DataFrame:
    """Two-pass exact global order statistics over a one-column ('v',
    BIGINT) frame → (pct, rank, v_micro, n) rows, rank_p = 1 +
    (p·(n−1)) div 100 (lower discrete quantile).  Shared kernel of
    q_quantile_select (B107) and q_winsorize (B116) — see the former's
    docstring for the algorithm and its bounded-collect/eager-scan
    contract (pass 1 runs two driver actions at call time)."""
    spark = t.sparkSession
    lo, hi, n = t.agg(F.min("v"), F.max("v"), F.count("*")).first()
    lo, hi, n = int(lo), int(hi), int(n)
    width = max(1, -(-(hi - lo + 1) // QSEL_BUCKETS))
    tb = t.withColumn("b", F.expr(f"(v - {lo}) div {width}"))
    hist = sorted(
        (r["b"], r["cnt"])
        for r in tb.groupBy("b").agg(F.count("*").alias("cnt")).collect()
    )  # ≤ QSEL_BUCKETS rows — bounded driver collect by construction
    targets = {p: 1 + (p * (n - 1)) // 100 for p in pcts}
    picks = []
    cum = 0
    for b, cnt in hist:
        for p, r in targets.items():
            if cum < r <= cum + cnt:
                picks.append((int(b), int(r - cum), int(p), int(r)))
        cum += cnt
    wanted = spark.createDataFrame(
        picks, "wb long, off long, pct long, rank long"
    )
    wb = W.partitionBy("b").orderBy("v")
    return (
        tb.join(
            F.broadcast(wanted.select(F.col("wb").alias("b")).distinct()),
            "b",
            "left_semi",
        )
        .withColumn("rn", F.row_number().over(wb).cast("long"))
        .join(
            F.broadcast(wanted),
            (F.col("b") == F.col("wb")) & (F.col("rn") == F.col("off")),
        )
        .select(
            "pct",
            "rank",
            F.col("v").alias("v_micro"),
            F.lit(n).cast("long").alias("n"),
        )
    )


def q_hof_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B130: the higher-order-function array surface — ``transform`` /
    ``filter`` / ``aggregate`` / ``exists`` lambdas running INSIDE
    whole-stage codegen, the UDF-free way to compute over array columns
    (the r8 perf postmortem showed a Python UDF here costs 10-100×, and
    that even JVM lambdas must bind the array to a column FIRST — no CSE
    inside transform(), so inlining split() per element is O(words²)).

    Per document: long-word count (filter+size), total word chars
    (aggregate with a 0L seed — the fold), and a containment probe
    (exists) — reduced per lang to exact integer sums that must
    hash-equal DuckDB's list-lambda twins (list_filter /
    list_transform+list_sum / len(list_filter) > 0)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    t = d.select("lang", words.alias("ws"))  # bind once: no CSE in lambdas
    n_long = F.size(F.filter(F.col("ws"), lambda w: F.length(w) > 4))
    total_chars = F.aggregate(
        F.col("ws"), F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    has_spark = F.exists(F.col("ws"), lambda w: w == "spark")
    return (
        t.select(
            "lang",
            n_long.cast("long").alias("n_long"),
            total_chars.alias("chars"),
            has_spark.cast("long").alias("has"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_long").cast("long").alias("sum_long_words"),
            F.sum("chars").cast("long").alias("sum_word_chars"),
            F.sum("has").cast("long").alias("n_has_spark"),
        )
    )


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B127: EXACT distinct counting via bitmap rollup — the dense-id
    trick OLAP engines use where B65's HLL is approximate and a raw
    ``count(distinct)`` can't be re-aggregated: pack ids into 64-bit
    words (word = id div 64, bit = id mod 64), OR the words per group,
    popcount-sum the result.  Unlike count(distinct) — whose partials
    are id SETS that must be reshuffled wholesale to reaggregate across
    a new grouping or time range — OR'd bitmap words are tiny, exact,
    AND mergeable: a day×type bitmap table rolls up to month×type by
    re-OR'ing 8-byte words, never touching raw events again (the exact
    analogue of the HLL-sketch rollup, valid whenever the id space is
    dense enough to afford 1 bit per id).

    Shape: two map-combinable groupBys — (type, word)→bit_or, then
    type→sum(popcount) — both partial-aggregated executor-side; the
    shuffle carries one BIGINT per occupied id block.  Words pack 63
    ids, not 64: bit 63 is the sign bit, and ``1 << 63`` is an overflow
    ERROR in DuckDB (vs a silent negative wrap in Spark) — 63 useful
    bits keeps both engines in signed-BIGINT range with identical
    values."""
    e = load(spark, sf_dir, "events")
    # integer div, NOT `/`: float division round-trips through DOUBLE and
    # mis-words ids above 2^53 (real 64-bit ids reach ~1.5e18)
    word = F.expr("user_id div 63")
    bit = F.col("user_id") % 63
    bitmap = (
        e.select("event_type", word.alias("w"), bit.alias("b"))
        .groupBy("event_type", "w")
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(b as int))")).alias("bits"))
    )
    return bitmap.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_distinct_users"),
        F.count("*").cast("long").alias("n_words"),
    )


WINSOR_PCTS = (1, 99)


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B116: exact global winsorization — clamp a value column at its
    exact global p01/p99 order statistics, the robust-scaling step a
    quality-score or reward-model feature pipeline runs before
    normalization (outliers saturate instead of dominating the moments).

    Composition of two scale-safe kernels: the cut values come from
    ``global_quantile_select`` (two-pass bucketed selection, NO global
    sort — a global ``orderBy`` of the corpus is the thing this operator
    exists to avoid), collected as exactly 2 bounded rows; the clamp is
    then a map-only ``least(greatest(v, lo), hi)`` with literal cuts
    folded into codegen, followed by one map-combinable groupBy.  At 100
    TB: pass 1 = one 3-scalar agg + one ≤4096-row histogram, pass 2 = a
    semi-join touching ≤2/4096 of the rows, pass 3 = the clamp scan —
    three total scans, each embarrassingly parallel.

    All-BIGINT by doctrine: values are exact price cents, the clamped
    sum and clamp counters are exact integer sums; per-returnflag rows
    carry the cut values so a shifted quantile flips every row."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    t = li.select("l_returnflag", cents.alias("v"))
    cuts = {
        int(r["pct"]): int(r["v_micro"])
        for r in global_quantile_select(t.select("v"), WINSOR_PCTS).collect()
    }  # exactly len(WINSOR_PCTS) rows — bounded by construction
    lo_cut, hi_cut = cuts[WINSOR_PCTS[0]], cuts[WINSOR_PCTS[1]]
    clamped = F.least(F.greatest(F.col("v"), F.lit(lo_cut)), F.lit(hi_cut))
    return t.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("v") < lo_cut).cast("long")).alias("n_clamped_lo"),
        F.sum((F.col("v") > hi_cut).cast("long")).alias("n_clamped_hi"),
        F.sum(clamped).cast("long").alias("sum_wins_cents"),
        F.lit(lo_cut).cast("long").alias("lo_cut"),
        F.lit(hi_cut).cast("long").alias("hi_cut"),
    )


def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B112: grouped ordinary-least-squares regression via EXACT integer
    sufficient statistics — the distributed form of per-key trend fitting
    (here: price-vs-quantity slope per supplier).  ``regr_slope`` /
    ``corr``-style built-ins accumulate floats in shuffle order; at 100 TB
    the per-partition partial sums arrive in nondeterministic order and
    the quotient wobbles in the last ulp.  The scale-safe (and hash-safe)
    shape is the textbook decomposition: OLS needs only the five sufficient
    statistics (n, Σx, Σy, Σx², Σxy) — all exact BIGINT sums over
    integerized units (x = quantity, y = price cents) — collected in ONE
    map-combinable groupBy (partial agg on every executor, one ≤|suppliers|-row
    shuffle), with the slope's numerator/denominator

        slope_num = n·Σxy − Σx·Σy,   slope_den = n·Σx² − (Σx)²

    derived as exact int64 products (finalizing slope = num/den is a
    driver/consumer-side epilogue, deliberately NOT hashed — it is the one
    libm-free quotient the doctrine keeps out of hashed schemas).

    Overflow envelope (documented, loud under ANSI mode rather than
    silently wrong): n·Σxy stays < 2⁶³ while per-supplier row count × max
    |x·y| × mean|x·y| < 9.2e18 — with x ≤ 50 and y ≤ 1.05e7 cents that
    holds through ~10⁵ rows per supplier (sf ≈ 1000 at TPC-H density);
    beyond that, promote the two product columns to decimal(38,0) — the
    five hashed sums themselves are safe far past that."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    agg = li.select(
        "l_suppkey", x.alias("x"), y.alias("y")
    ).groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
    )
    num = F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    den = F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    return agg.select(
        "l_suppkey",
        "n",
        "sum_x",
        "sum_y",
        "sum_xx",
        "sum_xy",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        (num > 0).alias("slope_positive"),
    )


UDTF_CHUNK_WORDS = 40   # window size (words)
UDTF_CHUNK_STRIDE = 30  # stride (words) → 10-word overlap


def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B160: sliding word-window chunking via a correlated multi-arg
    Python UDTF — the token-window sibling of B52's char chunking (40
    words / stride 30), one input row → ceil(n_words/stride) rows.
    The UDTF *API* surface itself is already owned by ``q_udtf_ngrams``
    (temporal.py); what this adds is (a) the chunking operator and
    (b) the MULTI-ARGUMENT correlated lateral leg — key columns
    (doc_id) threaded THROUGH the table function so the expansion rows
    stay self-identifying without a re-join (the ngrams UDTF takes one
    column and loses the key).

    Execution
    shape: a UDTF is a per-partition Python generator — no shuffle, no
    state, parallel per input split like any flat map; the cost is the
    Python-worker row path, so the HOT-path chunker stays the B52
    codegen sequence+explode and this query is the SURFACE contract
    (when the expansion logic genuinely needs Python — a tokenizer, a
    parser — the UDTF is the idiomatic container; Arrow-optimized
    UDTFs, `useArrow=True`, batch the transfer when rows are wide).

    Hashed columns avoid shipping text: per chunk the word count and
    first/last word, exact cross-engine (DuckDB recomputes the windows
    with generate_series + list_slice)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id long, chunk_idx long, n_chunk_words long, "
        "first_word string, last_word string"
    ))
    class WordChunks:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            if not text:
                return
            words = text.split(" ")
            n = len(words)
            for idx, start in enumerate(
                range(0, n, UDTF_CHUNK_STRIDE)
            ):
                chunk = words[start : start + UDTF_CHUNK_WORDS]
                yield doc_id, idx, len(chunk), chunk[0], chunk[-1]

    spark.udtf.register("k2e_word_chunks", WordChunks)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    view = "k2e_udtf_docs"
    d.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT t.doc_id, t.chunk_idx, t.n_chunk_words, "
        f"       t.first_word, t.last_word "
        f"FROM {view} d, LATERAL k2e_word_chunks(d.doc_id, d.text) t"
    )




def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered per-user stream — the
    window shape neither Spark nor most engines support natively
    (``count(DISTINCT x) OVER (...)`` is rejected), expressed exactly
    with two hash-partitioned windows and zero unbounded state:
    (1) a row is NEW iff it is the first (ts, event_id) occurrence of
    its (user, event_type) — row_number over that finer partition;
    (2) the running distinct count is the running SUM of the new-flags
    over the per-user order.  Both windows partition on user keys
    (never the corpus — the B12-B14 discipline), and the trick is
    exact, not a sketch: new-flags sum to the distinct count by
    construction.  DuckDB restates the identical two-step — the hash
    check proves the decomposition IS the distinct-count window."""
    e = load(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    is_new = (F.row_number().over(w_first) == 1).cast("long")
    return e.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(w_run).cast("long").alias("n_distinct_types"),
    )



KEYSET_CURSOR_TS = "1998-06-15 00:00:00"  # (date, key) cursor of the "previous page"
KEYSET_PAGE = 100


def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the only pagination that survives
    100 TB: ``OFFSET n`` re-sorts and discards n rows per page (page
    1000 costs 1000 pages of work, and concurrent inserts shift rows
    between pages), while the keyset page is a PREDICATE on the unique
    ordering key — (date, key) > cursor — so the scan prunes straight
    to the page and a stable cursor never double-serves or skips a row.
    Plan shape: the composite-cursor disjunction pushes to the scan
    (the date leg prunes row groups) and ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — per-partition top-k then one k-row merge,
    NEVER a global sort (the B16 discipline).  DuckDB restates the same
    predicate + LIMIT; the unique (date, key) order makes the page
    boundary engine-stable."""
    o = load(spark, sf_dir, "orders")
    cur = F.to_timestamp(F.lit(KEYSET_CURSOR_TS))
    after = (F.col("o_orderdate") > cur) | (
        (F.col("o_orderdate") == cur) & (F.col("o_orderkey") > 0)
    )
    return (
        o.filter(after)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(KEYSET_PAGE)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
    )


def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B200: the VARIANT semi-structured type (Spark 4.0's open binary
    JSON encoding — also the format Delta/Iceberg shredding targets):
    parse ONCE per document into the variant binary, then extract many
    typed paths — the 100 TB-relevant contrast to
    ``get_json_object``-style extraction (q_json_scalar), which
    re-tokenizes the JSON text for EVERY path it pulls.

    Fixture: a nested per-order document built from orders x lineitem
    (object, nested object, array of objects — all three access shapes)
    via ``to_json``; then the variant surface end-to-end:

    - ``parse_json`` -> VariantType column (binary, parsed once);
    - ``variant_get`` typed extraction: nested scalar (``$.o.status``),
      int (``$.o.key``), double (``$.price``), array element
      (``$.lines[0].qty``);
    - array cardinality via ``variant_get($.lines, array<variant>)`` +
      ``size``;
    - ``try_variant_get`` with an impossible cast (string->bigint) and
      ``variant_get`` on a missing path — both must yield SQL NULL, and
      their zero counts are hashed so a semantics change flips the row.

    Everything stays JVM-side whole-stage codegen (no UDF); the DuckDB
    oracle restates the result RELATIONALLY from the base tables (the
    doc is built from table columns, so the JSON layer must be the
    identity — any parse/extract/cast defect breaks the hash).  Doubles
    survive because ``to_json`` prints shortest round-trip reprs."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("n"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_returnflag").alias("ret"),
                )
            )
        ).alias("lines")
    )
    docs = o.join(lines, o.o_orderkey == lines.l_orderkey).select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("o_orderkey").alias("key"),
                    F.col("o_orderstatus").alias("status"),
                ).alias("o"),
                F.col("lines"),
                F.col("o_totalprice").alias("price"),
            )
        ).alias("doc")
    )
    v = F.parse_json(F.col("doc"))
    sel = docs.select(
        F.variant_get(v, "$.o.status", "string").alias("status"),
        F.variant_get(v, "$.o.key", "bigint").alias("okey"),
        F.variant_get(v, "$.price", "double").alias("price"),
        F.variant_get(v, "$.lines[0].qty", "double").alias("qty1"),
        F.size(F.variant_get(v, "$.lines", "array<variant>")).alias(
            "n_lines"
        ),
        F.try_variant_get(v, "$.o.status", "bigint").alias("bad_cast"),
        F.variant_get(v, "$.missing", "string").alias("missing"),
    )
    return sel.groupBy("status").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.sum(F.floor(F.col("qty1")).cast("long"))
        .cast("long")
        .alias("sum_qty1"),
        F.sum("n_lines").cast("long").alias("n_lines_total"),
        F.count("bad_cast").cast("long").alias("n_bad_cast"),
        F.count("missing").cast("long").alias("n_missing"),
        F.min("okey").cast("long").alias("min_key"),
    )


REC_CTE_SQL = """
    WITH RECURSIVE anc(k, depth) AS (
      SELECT CAST(1 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
      UNION ALL
      SELECT CAST(p.p_partkey AS BIGINT) AS k, a.depth + 1 AS depth
      FROM anc a JOIN part p
        ON CAST(floor(p.p_partkey / 2) AS BIGINT) = a.k
      WHERE p.p_partkey > 1
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM anc GROUP BY depth
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B201: native SQL recursion — ``WITH RECURSIVE`` (Spark 4.1's
    ANSI recursive CTE).  The graph family (B114/B137) re-expressed
    recursion as DataFrame fixpoint loops because SQL recursion didn't
    exist on Spark; now the classic hierarchy-explosion shape (BOM /
    org-chart / ancestor chain) runs as ONE SQL text — and that same
    text runs VERBATIM on DuckDB, the strongest oracle form this repo
    has (no restatement at all).

    Fixture: the implicit binary hierarchy over partkeys (parent of k
    is floor(k/2)) — every node has exactly ONE parent, so the
    mandatory ``UNION ALL`` semantics (Spark rejects dedup UNION in
    recursion) produce each part exactly once: no multiplicity, no
    cycle risk, depth = ceil(log2 N) iterations.  Per-depth aggregate
    with exact key checksums pins every level.

    Scale shape: each iteration is one broadcast-able equi-join of the
    previous level (frontier-sized) against part — semi-naive
    evaluation, the same per-round plan the hand-built BFS kernel
    uses; Spark's implementation unions the per-step results, so the
    plan is a K-level join DAG with the frontier always on the small
    side.  The DataFrame kernels stay the right tool for
    data-dependent deep graphs (diameter >> iteration cap, pinning
    discipline); the rCTE is the right tool for schema-shaped
    hierarchies."""
    register_views(spark, sf_dir)
    return spark.sql(REC_CTE_SQL)


def q_pipe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B202: SQL pipe syntax (Spark 4.0's ``|>`` operator chaining —
    the GoogleSQL pipe-flow form): the TPC-H Q1 pricing-summary shape
    written as a linear pipeline FROM -> WHERE -> EXTEND (computed
    columns) -> AGGREGATE ... GROUP BY.  Pipe stages compile to the
    exact same logical plan as the nested-SELECT form (Catalyst sees
    no difference — pinned by the oracle hash matching the plain-SQL
    restatement), so the surface is free at any scale; it exists
    because linear pipelines are how 100-TB ETL reads."""
    register_views(spark, sf_dir)
    return spark.sql("""
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(floor(disc_price * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_disc_cents,
             CAST(COUNT(*) AS BIGINT) AS count_order
           GROUP BY l_returnflag, l_linestatus
    """)


def q_udtf_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B213: Python UDTF with a TABLE argument and PARTITION BY /
    ORDER BY (Spark 4's table-function surface beyond B-scalar UDTFs
    like q_udtf_chunk): the 30-min-gap sessionizer re-expressed as a
    STATEFUL per-partition table function invoked from SQL —
    ``FROM gap_sessions(TABLE(...) PARTITION BY user_id ORDER BY ...)``
    — the SQL-native form of applyInPandas-style grouped processing.

    State is O(1) per partition (current session's counters; rows
    stream through eval in order, terminate flushes the last session),
    so a hot user costs memory proportional to ONE session, never the
    user's history — the property that matters when a bot account has
    10^8 events.  All-integer output (epoch-us bounds, per-event
    floored cents summed — order-independent), so the DuckDB oracle
    (the shared B25 session CTE) hashes exactly.

    Scale note: PARTITION BY shuffles once on user_id and sorts within
    partitions — the same exchange the window-function sessionizer
    (B25) pays; the UDTF trades whole-stage codegen for arbitrary
    Python state, so B25 stays the default and this surface exists for
    logic a lag/cumsum window cannot express."""
    import math

    from pyspark.sql.functions import udtf

    from ..functions.sessions import SESSION_GAP_MIN

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    class GapSessions:
        def __init__(self):
            self._cur = None  # (user, sid, n, start, end, cents)

        def _flush(self):
            u, sid, n, st, en, cents = self._cur
            return (u, sid, n, st, en, cents)

        def eval(self, row):
            ts = int(row.ts_us)
            cents = math.floor(row.value * 100 + 0.5)
            if self._cur is None:
                self._cur = [row.user_id, 1, 1, ts, ts, cents]
                return
            if ts - self._cur[4] > gap_us:
                out = self._flush()
                self._cur = [row.user_id, out[1] + 1, 1, ts, ts, cents]
                yield out
            else:
                self._cur[2] += 1
                self._cur[4] = ts
                self._cur[5] += cents

        def terminate(self):
            if self._cur is not None:
                yield self._flush()

    G = udtf(
        GapSessions,
        returnType=(
            "user_id bigint, session_id bigint, n_events bigint, "
            "start_us bigint, end_us bigint, value_cents bigint"
        ),
    )
    spark.udtf.register("gap_sessions", G)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM gap_sessions(
          TABLE(SELECT user_id, unix_micros(ts) AS ts_us, event_id, value
                FROM events)
          PARTITION BY user_id ORDER BY (ts_us, event_id)
        )
        """
    )


SQL_PARAMS_QMAX = 30
SQL_PARAMS_DMAX = "1998-09-02"
_PARAMS_BODY = """
    SELECT {leg} AS leg, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM lineitem
    WHERE l_quantity <= {qmax} AND l_shipdate <= {dmax}
    GROUP BY l_returnflag
"""


def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B214: SQL parameterization, all four public Spark 4 binding
    paths computing the SAME filtered aggregate — named parameter
    markers (``:qmax``, bound via ``spark.sql(args={...})``),
    positional markers (``?``), SQL session VARIABLES
    (``DECLARE``/``SET VAR``, referenced bare in the query), and
    ``EXECUTE IMMEDIATE ... USING`` (dynamic SQL with bound args) —
    one leg each, unioned.  The oracle restates every leg with
    LITERALS, so a mis-bound, mis-cast, or mis-scoped parameter on any
    path flips that leg's rows.

    Parameter markers matter at 100 TB for plan-cache reuse and
    injection safety (values never enter the SQL text); session
    variables are the scripting surface (thresholds set once, read by
    every statement in a session)."""
    register_views(spark, sf_dir)
    named = spark.sql(
        _PARAMS_BODY.format(leg="'named'", qmax=":qmax", dmax=":dmax"),
        args={"qmax": SQL_PARAMS_QMAX, "dmax": SQL_PARAMS_DMAX},
    )
    positional = spark.sql(
        _PARAMS_BODY.format(leg="'positional'", qmax="?", dmax="?"),
        args=[SQL_PARAMS_QMAX, SQL_PARAMS_DMAX],
    )
    spark.sql("DECLARE OR REPLACE VARIABLE vqmax INT DEFAULT 0")
    spark.sql("DECLARE OR REPLACE VARIABLE vdmax STRING DEFAULT ''")
    spark.sql(f"SET VAR vqmax = {SQL_PARAMS_QMAX}")
    spark.sql(f"SET VAR vdmax = '{SQL_PARAMS_DMAX}'")
    variable = spark.sql(
        _PARAMS_BODY.format(leg="'variable'", qmax="vqmax", dmax="vdmax")
    )
    exec_imm = spark.sql(
        "EXECUTE IMMEDIATE :q USING :a AS qmax, :b AS dmax",
        args={
            "q": _PARAMS_BODY.format(
                leg="'exec_imm'", qmax=":qmax", dmax=":dmax"
            ),
            "a": SQL_PARAMS_QMAX,
            "b": SQL_PARAMS_DMAX,
        },
    )
    return (
        named.unionByName(positional)
        .unionByName(variable)
        .unionByName(exec_imm)
    )


def q_arrow_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B218: the Arrow-native Python execution surface — the two paths
    that SKIP pandas entirely:

    - ``mapInArrow``: the function receives raw ``pyarrow.RecordBatch``
      objects and answers with batches — zero pandas conversion, zero
      per-row Python; the per-doc statistics here are computed with
      ``pyarrow.compute`` kernels (C++ vectorized) on the Arrow
      buffers as shipped;
    - ``useArrow=True`` scalar UDFs: row-at-a-time Python semantics
      with Arrow-batched transfer (the migration path for legacy UDFs
      that can't vectorize).

    Outputs are INTEGER per-doc statistics (byte length, char length,
    space count, whitespace-word count) so the DuckDB restatement
    hashes exactly; the real-world payload of this surface is float
    kernels (the ANN legs' envelope checks cover those) — this query
    pins the PLUMBING: batch iteration, schema contract, and the
    arrow-UDF execution mode, not numerics.

    Scale note: mapInArrow is the lowest-overhead Python escape hatch
    Spark has — one (de)serialization per BATCH, C++ kernels inside —
    and still loses to built-in ``F.*`` expressions (whole-stage
    codegen, no IPC at all); the B36 hierarchy stands: built-ins >
    pandas/arrow batches > row Python, and this query is the measured
    middle rung."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from pyspark.sql.functions import udf

    d = (
        load(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "lang", "text")
    )

    def _stats(batches):
        for b in batches:
            texts = b.column("text")
            yield _pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    b.column("lang"),
                    _pc.cast(_pc.binary_length(texts), _pa.int64()),
                    _pc.cast(_pc.utf8_length(texts), _pa.int64()),
                    _pc.cast(
                        _pc.count_substring(texts, " "), _pa.int64()
                    ),
                ],
                names=[
                    "doc_id",
                    "lang",
                    "n_bytes",
                    "n_chars",
                    "n_spaces",
                ],
            )

    stats = d.mapInArrow(
        _stats,
        "doc_id long, lang string, n_bytes long, n_chars long, n_spaces long",
    )
    n_words = udf(
        lambda s: len(s.split(" ")) if s is not None else None,
        "long",
        useArrow=True,
    )
    joined = stats.join(
        d.select("doc_id", n_words("text").alias("n_words")), "doc_id"
    )
    return joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("bytes_sum"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
        F.sum("n_spaces").cast("long").alias("spaces_sum"),
        F.sum("n_words").cast("long").alias("words_sum"),
        F.min("doc_id").cast("long").alias("min_doc"),
    )


QUERIES = {
    "q_variant": q_variant,
    "q_recursive_cte": q_recursive_cte,
    "q_pipe_sql": q_pipe_sql,
    "q_udtf_sessions": q_udtf_sessions,
    "q_sql_params": q_sql_params,
    "q_arrow_native": q_arrow_native,
    "q_udtf_chunk": q_udtf_chunk,
    "q_ntile_dist": q_ntile_dist,
    "q_running_distinct": q_running_distinct,
    "q_keyset_page": q_keyset_page,
    "q_grouped_ols": q_grouped_ols,
    "q_quantile_select": q_quantile_select,
    "q_winsorize": q_winsorize,
    "q_bitmap_distinct": q_bitmap_distinct,
    "q_hof_arrays": q_hof_arrays,
    "q_udaf_median": q_udaf_median,
    "q_window_firstlast": q_window_firstlast,
    "q_window_range_interval": q_window_range_interval,
    "q_percentiles": q_percentiles,
    "q_approx_quantile": q_approx_quantile,
    "q_stats_agg": q_stats_agg,
    "q_grouping_sets": q_grouping_sets,
    "q_cube": q_cube,
    "q_window_nth": q_window_nth,
    "q_string_agg": q_string_agg,
    "q_collect_sorted": q_collect_sorted,
    "q_unpivot": q_unpivot,
    "q_posexplode": q_posexplode,
    "q_map_explode": q_map_explode,
    "q_scalar_subquery": q_scalar_subquery,
    "q_sql_q3": q_sql_q3,
    "q_sql_q5": q_sql_q5,
    "q_sql_q18": q_sql_q18,
    "q_having": q_having,
    "q_in_subquery": q_in_subquery,
    "q_exists_subquery": q_exists_subquery,
    "q_lateral_topn": q_lateral_topn,
    "q_null_semantics": q_null_semantics,
    "q_date_arith": q_date_arith,
}

from ..functions.sessions import session_cte_sql as _session_cte_sql

ORACLE = {
    "q_arrow_native": """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
                 AS bytes_sum,
               CAST(SUM(length(text)) AS BIGINT) AS chars_sum,
               CAST(SUM(length(text) - length(replace(text, ' ', '')))
                    AS BIGINT) AS spaces_sum,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                 AS words_sum,
               MIN(doc_id) AS min_doc
        FROM documents GROUP BY lang
    """,
    "q_sql_params": f"""
        WITH one AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_cents
            FROM lineitem
            WHERE l_quantity <= {SQL_PARAMS_QMAX}
              AND l_shipdate <= DATE '{SQL_PARAMS_DMAX}'
            GROUP BY l_returnflag
        )
        SELECT legs.leg, one.* FROM one
        CROSS JOIN (
            SELECT 'named' AS leg UNION ALL SELECT 'positional'
            UNION ALL SELECT 'variable' UNION ALL SELECT 'exec_imm'
        ) legs
    """,
    "q_udtf_sessions": f"""
        WITH {_session_cte_sql("user_id, ts, event_id, value")}
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM sessioned GROUP BY user_id, session_id
    """,
    "q_recursive_cte": REC_CTE_SQL,
    "q_pipe_sql": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                 AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_disc_cents,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_variant": """
        WITH lm AS (
            SELECT l_orderkey, COUNT(*) AS n_lines,
                   MIN(l_linenumber) AS n0
            FROM lineitem GROUP BY l_orderkey
        ), la AS (
            -- first element of the (n, qty, ret)-sorted array: the
            -- min-linenumber line, min-qty tiebreak (struct sort order)
            SELECT l.l_orderkey, ANY_VALUE(lm.n_lines) AS n_lines,
                   MIN(l.l_quantity) AS qty1
            FROM lineitem l
            JOIN lm ON lm.l_orderkey = l.l_orderkey
                   AND l.l_linenumber = lm.n0
            GROUP BY l.l_orderkey
        )
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(SUM(CAST(floor(qty1) AS BIGINT)) AS BIGINT) AS sum_qty1,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines_total,
               CAST(0 AS BIGINT) AS n_bad_cast,
               CAST(0 AS BIGINT) AS n_missing,
               MIN(o_orderkey) AS min_key
        FROM orders JOIN la ON la.l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "q_udtf_chunk": f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE text IS NOT NULL AND text <> ''),
        ex AS (
          SELECT doc_id, ws, gs.i AS chunk_idx
          FROM w, LATERAL (
            SELECT unnest(generate_series(
              0, CAST((len(ws) - 1) // {UDTF_CHUNK_STRIDE} AS BIGINT))) AS i
          ) gs)
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(least(len(ws) - chunk_idx * {UDTF_CHUNK_STRIDE},
                          {UDTF_CHUNK_WORDS}) AS BIGINT) AS n_chunk_words,
               ws[chunk_idx * {UDTF_CHUNK_STRIDE} + 1] AS first_word,
               ws[least(chunk_idx * {UDTF_CHUNK_STRIDE} + {UDTF_CHUNK_WORDS},
                        len(ws))] AS last_word
        FROM ex
    """,
    "q_grouped_ols": """
        WITH t AS (
          SELECT l_suppkey,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem),
        s AS (
          SELECT l_suppkey,
                 count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sum_x,
                 CAST(sum(y) AS BIGINT) AS sum_y,
                 CAST(sum(x * x) AS BIGINT) AS sum_xx,
                 CAST(sum(x * y) AS BIGINT) AS sum_xy
          FROM t GROUP BY l_suppkey)
        SELECT l_suppkey, n, sum_x, sum_y, sum_xx, sum_xy,
               CAST(n * sum_xy - sum_x * sum_y AS BIGINT) AS slope_num,
               CAST(n * sum_xx - sum_x * sum_x AS BIGINT) AS slope_den,
               (n * sum_xy - sum_x * sum_y) > 0 AS slope_positive
        FROM s
    """,
    "q_quantile_select": """
        WITH t AS (
          SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events),
        nn AS (SELECT count(*) AS n FROM t),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM t),
        p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
        SELECT CAST(p.pct AS BIGINT) AS pct,
               CAST(1 + (p.pct * (nn.n - 1)) // 100 AS BIGINT) AS rank,
               r.v AS v_micro,
               nn.n AS n
        FROM p CROSS JOIN nn
        JOIN r ON r.rn = 1 + (p.pct * (nn.n - 1)) // 100
    """,
    # list-lambda twins of the Spark HOFs; split on single spaces matches
    # Spark's split(text, ' ') exactly (no regex, no empty-trim surprises
    # — the fixture text is single-space separated)
    "q_hof_arrays": """
        WITH t AS (SELECT lang, string_split(text, ' ') AS ws FROM documents)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(list_filter(ws, w -> length(w) > 4))) AS BIGINT)
                 AS sum_long_words,
               CAST(sum(list_sum(list_transform(ws, w -> length(w)))) AS BIGINT)
                 AS sum_word_chars,
               CAST(sum(CASE WHEN len(list_filter(ws, w -> w = 'spark')) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_has_spark
        FROM t GROUP BY lang
    """,
    # same bitmap construction: per-(type, id div 63) word OR, popcount sum
    # (63-bit words — the sign bit is a DuckDB shift overflow error).
    # n_distinct_users must equal a plain count(distinct); n_words pins the
    # block packing (count of occupied 63-id blocks)
    "q_bitmap_distinct": """
        WITH bm AS (
          SELECT event_type, user_id // 63 AS w,
                 bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
                   AS bits
          FROM events GROUP BY event_type, w)
        SELECT event_type,
               CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_users,
               CAST(count(*) AS BIGINT) AS n_words
        FROM bm GROUP BY event_type
    """,
    "q_winsorize": """
        WITH t AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
          FROM lineitem),
        nn AS (SELECT count(*) AS n FROM t),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM t),
        cuts AS (
          SELECT (SELECT v FROM r, nn WHERE rn = 1 + (1  * (nn.n - 1)) // 100) AS lo,
                 (SELECT v FROM r, nn WHERE rn = 1 + (99 * (nn.n - 1)) // 100) AS hi)
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (v < lo) AS BIGINT) AS n_clamped_lo,
               CAST(count(*) FILTER (v > hi) AS BIGINT) AS n_clamped_hi,
               CAST(sum(LEAST(GREATEST(v, lo), hi)) AS BIGINT) AS sum_wins_cents,
               CAST(lo AS BIGINT) AS lo_cut,
               CAST(hi AS BIGINT) AS hi_cut
        FROM t CROSS JOIN cuts
        GROUP BY l_returnflag, lo, hi
    """,
    "q_udaf_median": """
        SELECT user_id,
               quantile_disc(CAST(floor(value * 1000000 + 0.5) AS BIGINT), 0.5)
                 AS median_v_micro,
               count(*) AS n_obs
        FROM events GROUP BY user_id
    """,
    "q_keyset_page": f"""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders
        WHERE o_orderdate > TIMESTAMP '{KEYSET_CURSOR_TS}'
           OR (o_orderdate = TIMESTAMP '{KEYSET_CURSOR_TS}' AND o_orderkey > 0)
        ORDER BY o_orderdate, o_orderkey
        LIMIT {KEYSET_PAGE}
    """,
    "q_running_distinct": """
        WITH flagged AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_new
          FROM events)
        SELECT event_id, user_id,
               CAST(sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS n_distinct_types
        FROM flagged
    """,
    "q_ntile_dist": """
        SELECT event_id,
               ntile(4) OVER w AS quartile,
               floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
               floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6    AS cume
        FROM events WINDOW w AS (ORDER BY value, event_id)
    """,
    "q_window_firstlast": """
        SELECT user_id, event_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_window_range_interval": """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS trailing_7d
        FROM orders
    """,
    "q_percentiles": """
        SELECT event_type,
               round(median(value), 6)            AS med,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.9), 6)  AS p90,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q_stats_agg": """
        SELECT event_type,
               round(stddev_samp(value), 6)                          AS sd,
               round(var_samp(value), 6)                             AS var,
               round(corr(value, CAST(user_id AS DOUBLE)), 6)        AS corr_uid,
               round(covar_samp(value, CAST(user_id AS DOUBLE)), 6)  AS covar_uid
        FROM events GROUP BY event_type
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "q_cube": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q_window_nth": """
        SELECT user_id, event_id,
               nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type,
               last_value(nullif(event_type, 'error') IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nonerror_type
        FROM events
    """,
    "q_string_agg": """
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    "q_collect_sorted": """
        SELECT user_id,
               string_agg(event_type, '|' ORDER BY event_type) AS types,
               string_agg(CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR), '|'
                          ORDER BY CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR)) AS values_sorted
        FROM events GROUP BY user_id
    """,
    "q_approx_quantile": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS exact_med,
               round(quantile_cont(value, 0.9), 4) AS exact_p90,
               count(*) AS n,
               TRUE AS est_ok
        FROM events GROUP BY event_type
    """,
    "q_unpivot": """
        SELECT l_orderkey, 'qty' AS metric, round(l_quantity, 2) AS val
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'price', round(l_extendedprice, 2) FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, 'disc', round(l_discount, 2) FROM lineitem WHERE l_linenumber = 1
    """,
    "q_posexplode": """
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % 10 = 0
    """,
    "q_map_explode": """
        SELECT event_id, 'k' AS key,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS value
        FROM events
    """,
    "q_scalar_subquery": """
        SELECT c_custkey, c_name,
               (SELECT round(max(o_totalprice), 2) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
    """,
    "q_sql_q3": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q_sql_q5": SQL_Q5,
    "q_sql_q18": SQL_Q18,
    "q_having": """
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12 AND sum(o_totalprice) > 100000
    """,
    "q_in_subquery": """
        SELECT c_custkey, c_mktsegment,
               c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') AS has_f_order
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "q_exists_subquery": """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    "q_lateral_topn": """
        SELECT c_custkey, o.o_orderkey, o.top_price
        FROM customer c, LATERAL (
            SELECT o_orderkey, round(o_totalprice, 2) AS top_price
            FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2) o
    """,
    "q_null_semantics": """
        SELECT event_id,
               nullif(event_type, 'error')                         AS type_or_null,
               coalesce(nullif(event_type, 'error'), 'masked')     AS type_masked,
               event_type IS DISTINCT FROM 'error'                 AS not_error_nullsafe,
               CASE WHEN nullif(event_type, 'error') IS NULL THEN 0 ELSE 1 END AS has_type
        FROM events
    """,
    "q_date_arith": """
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 10                          AS plus_10d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
               last_day(CAST(o_orderdate AS DATE))                     AS month_end,
               least(CAST(o_orderdate AS DATE), DATE '1995-01-01')     AS clamped_lo,
               greatest(CAST(o_orderdate AS DATE), DATE '1997-01-01')  AS clamped_hi
        FROM orders
    """,
}

ROWS_ONLY: set[str] = set()
