"""TPC-H-shaped SQL suite (SURVEY §2 B51 widened): all 22 classic decision-
support query shapes expressed through the ``spark.sql`` surface, with the
IDENTICAL SQL string running on the DuckDB oracle.

The driver testdata is TPC-H-ish but has no ``partsupp`` table and trims
some columns (no l_shipmode/l_commitdate/l_receiptdate, no p_container,
no c_phone/comment fields), so queries are adapted to the available
columns — each docstring states the adaptation.  Where the reference uses
``partsupp``, a derived part-supplier CTE built from lineitem stands in
(per-(partkey, suppkey) min unit price as supplycost, total shipped
quantity as availqty).  The *plan shapes* are the point: every classic
TPC-H physical pattern (exists-semi-join, conditional aggregation,
left-join count distribution, scalar-subquery-vs-aggregate,
group-global-max, correlated per-group threshold and per-part min,
double-nested IN semi-joins, EXISTS/NOT-EXISTS self-join pair, anti-join
with scalar floor) appears at least once.

Engine-comparability conventions follow ``relational.py``: every computed
column is aliased identically on both engines, floats are rounded, counts
cast to BIGINT, LIMIT queries carry a unique tie-break key and order by
the ROUNDED measure so a last-ulp float difference between engines cannot
flip rows in or out of the result.

Scale notes (100 TB posture): all queries are pure Catalyst SQL — dims
(region/nation/supplier/part at TPC-H ratios) broadcast under AQE, fact-
fact joins shuffle on their equi-keys, aggregates are partial/map-side
combinable, EXISTS/NOT EXISTS plan as semi/anti joins (never per-row
subquery execution), and the correlated Q17 threshold plans as one
aggregate-then-join over the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views

# Q4 (order priority checking), adapted: the reference predicate
# l_commitdate < l_receiptdate needs columns the testdata lacks; the
# adapted "late line" predicate l_shipdate > o_orderdate + 60 days keeps
# the same shape — EXISTS over the fact table planned as a left-semi join
# (never a per-order scan).
SQL_Q4 = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
"""

# Q6 (forecasting revenue change): the fully-pushed-down scan-agg — the
# whole query is one parquet scan with three pushed predicates and a
# single global sum.  No adaptation needed.
SQL_Q6 = """
    SELECT floor((sum(l_extendedprice * l_discount)) * 1e2 + 0.5) / 1e2 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""

# Q7 (volume shipping): two nation dims joined twice under different
# roles (supplier vs customer side) with a symmetric pair filter.
SQL_Q7 = """
    WITH shipping AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    SELECT supp_nation, cust_nation, l_year,
           floor((sum(volume)) * 1e2 + 0.5) / 1e2 AS revenue
    FROM shipping
    GROUP BY supp_nation, cust_nation, l_year
"""

# Q8 (national market share), adapted: p_type = 'PROMO' stands in for the
# reference's 'ECONOMY ANODIZED STEEL' (the testdata's p_type vocabulary
# is single-word).  The mkt_share division is conditional-sum / total-sum
# inside one aggregate — nullif guards ANSI-mode division.
SQL_Q8 = """
    WITH all_nations AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           floor((sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / nullif(sum(volume), 0)) * 1e4 + 0.5) / 1e4 AS mkt_share
    FROM all_nations
    GROUP BY o_year
"""

# Q10 (returned item reporting), adapted: the report carries the columns
# the testdata has (acctbal, nation, mktsegment; no address/phone).
# ORDER BY the ROUNDED revenue + unique custkey so the top-20 boundary
# cannot flip on a last-ulp cross-engine float difference.
SQL_Q10 = """
    SELECT c_custkey, c_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS revenue,
           floor((c_acctbal) * 1e2 + 0.5) / 1e2 AS acctbal, n_name, c_mktsegment
    FROM customer JOIN orders  ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation  ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

# Q12 (shipping modes and order priority), adapted: l_shipmode does not
# exist, so the grouping key is l_linestatus and the "late" predicate is
# ship-lag > 30 days; the essence — conditional priority counts per
# lineitem category over an orders-lineitem join — is unchanged.
SQL_Q12 = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
"""

# Q13 (customer distribution), adapted: the anti-pattern filter on
# o_comment becomes an o_orderpriority exclusion (same join-with-residual-
# condition shape).  LEFT JOIN keeps no-order customers as c_count = 0.
SQL_Q13 = """
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
"""

# Q14 (promotion effect): conditional revenue share over one month.
SQL_Q14 = """
    SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / nullif(sum(l_extendedprice * (1 - l_discount)), 0)) * 1e4 + 0.5) / 1e4
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
"""

# Q15 (top supplier): group-then-global-max — the revenue CTE is
# aggregated once and reused for both the join and the max (Catalyst
# plans the scalar subquery as a single-row aggregate, not a rescan).
# The max comparison runs on the ROUNDED revenue so both engines compare
# the same 2-decimal value.
SQL_Q15 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

# Q17 (small-quantity-order revenue), adapted: p_brand-only filter (no
# p_container column).  The correlated threshold 0.2 * avg(quantity per
# part) plans as an aggregate over lineitem joined back on partkey — one
# extra shuffle, never a per-row subquery.
SQL_Q17 = """
    SELECT floor((sum(l_extendedprice) / 7.0) * 1e2 + 0.5) / 1e2 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""

# Q22 (global sales opportunity), adapted: the country-code substring of
# c_phone becomes c_nationkey membership (no phone column), and "has no
# orders" becomes "has no orders since 1999" (the synthetic data gives
# every customer at least one order ever, which would make the anti-join
# trivially empty — the dormant-customer variant keeps it selective).
# Shape kept: scalar-subquery floor (avg positive balance) + NOT EXISTS
# anti-join.
SQL_Q22 = """
    WITH eligible AS (
      SELECT c_nationkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01'))
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           floor((sum(c_acctbal)) * 1e2 + 0.5) / 1e2 AS totacctbal
    FROM eligible
    GROUP BY c_nationkey
"""

# Derived part-supplier CTE standing in for the missing partsupp table:
# supplycost = min unit price ever charged for that (part, supplier) pair,
# availqty = total quantity shipped.  Kept as RAW doubles deliberately:
# both engines evaluate the identical IEEE division and min, so equality
# comparisons (Q2) are bit-exact, whereas a round() here diverges on
# .005-boundary doubles.  availqty sums integer-valued doubles — exact and
# order-independent.  One lineitem aggregate, reused verbatim by Q2/Q11.
_PARTSUPP_CTE = """
    partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / nullif(l_quantity, 0)) AS ps_supplycost,
             sum(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY l_partkey, l_suppkey)
"""

# Q2 (minimum-cost supplier), adapted: partsupp is the derived CTE; the
# region is EUROPE, p_size band + p_type equality replace the '%BRASS'
# suffix match.  Shape kept: the correlated per-part MIN over the
# partsupp-supplier-nation-region join (planned as an aggregate + rejoin,
# never per-row), ORDER BY rounded acctbal with unique (p_partkey,
# s_name) tie-break so the LIMIT boundary is engine-stable.
SQL_Q2 = f"""
    WITH {_PARTSUPP_CTE}
    SELECT floor((s_acctbal) * 1e2 + 0.5) / 1e2 AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part JOIN partsupp ON p_partkey = ps_partkey
              JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
                           FROM partsupp ps2
                             JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                             JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
                             JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
                           WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
"""

# Q9 (product type profit), adapted: ps_supplycost becomes a 10%-of-retail
# cost proxy (p_retailprice is the only cost-like column); p_name LIKE
# '%widget%' keeps the mid-string LIKE that defeats prefix pushdown.
# Shape kept: 5-way fact-dim join, profit expression, nation x year agg.
# Determinism: the true per-row amount has ≤4 decimal places (2-dec price
# x 2-dec discount; 1-dec cost factor x 2-dec retail x integer qty), so
# x10^4 integerization is exact — the BIGINT sum is order-independent and
# both engines emit the identical rounded profit (a raw double sum
# straddles cent boundaries differently per engine's partial-sum order).
SQL_Q9 = """
    -- Final cent-rounding happens in INTEGER space: sum_i/100.0 carries
    -- exact .5 halves (x10^-4 sums have legal half-cents), which both
    -- engines round away from zero identically — whereas rounding the
    -- double quotient diverges on those ties (Spark rounds the shortest
    -- decimal repr, DuckDB the raw binary value).  1e2/1e4 (not 100.0):
    -- Spark types decimal-form literals as DECIMAL.
    SELECT nation, o_year,
           CAST(round(sum(amount_i) / 1e2) AS BIGINT) / 1e2 AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(round((l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity) * 10000)
                  AS BIGINT) AS amount_i
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
"""

# Q11 (important stock), adapted: partsupp is the derived CTE; NATION_3
# stands in for GERMANY and the value floor is 0.1% of the national total.
# Shape kept: group-by-part value sum + scalar-subquery threshold over the
# SAME aggregate (Catalyst evaluates the CTE once per reference and plans
# the scalar as a single-row aggregate).
# Determinism: each (part, supplier) value is a deterministic double
# (min x exact integer sum), but the per-part sum over suppliers is
# order-dependent — so the value is integerized to 10^-4 per row and
# summed as BIGINT (order-independent), like Q9.
SQL_Q11 = f"""
    WITH {_PARTSUPP_CTE},
    national AS (
      SELECT ps_partkey,
             CAST(round(ps_supplycost * ps_availqty * 10000) AS BIGINT) AS value_i
      FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3')
    -- integer-space cent rounding: see Q9's determinism note
    SELECT ps_partkey,
           CAST(round(sum(value_i) / 1e2) AS BIGINT) / 1e2 AS value
    FROM national
    GROUP BY ps_partkey
    HAVING sum(value_i) > (SELECT sum(value_i) * 0.001 FROM national)
"""

# Q16 (parts/supplier relationship), adapted: the distinct (part, supplier)
# pairs come from lineitem; the "customer complaints" comment exclusion
# becomes a negative-acctbal exclusion.  Shape kept: NOT IN anti-join
# against a sub-select + count(DISTINCT) over brand/type/size buckets.
SQL_Q16 = """
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps
      JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""

# Q19 (discounted revenue), adapted: the container/shipmode legs of each
# disjunct are dropped (columns absent); brand x size-band x quantity-band
# disjunction kept.  Shape kept: join with a three-way OR residual that
# Catalyst pushes as a partition-prunable disjunction of ranges.
SQL_Q19 = """
    SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""

# Q20 (potential part promotion), adapted: "half of availqty" becomes a
# fixed 50-unit threshold on quantity shipped in 1996 (availqty is itself
# derived from shipments here, so the reference's self-referential 50%
# test would be a tautology); p_name prefix 'red'.  Shape kept: the
# double-nested IN (suppliers ⊇ lineitem groups ⊇ part prefix scan),
# planned as two stacked left-semi joins.
SQL_Q20 = """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50)
"""

# Q21 (suppliers who kept orders waiting), adapted: "late" is the Q4
# ship-lag predicate (l_shipdate > o_orderdate + 60 days; no
# commit/receipt dates in the testdata).  Shape kept in full: finished
# orders, EXISTS another supplier on the order, NOT EXISTS another LATE
# supplier — the classic semi-join + anti-join pair over the same fact
# self-reference; rounded-measure-free ORDER BY with unique s_name
# tie-break keeps the LIMIT boundary engine-stable.
SQL_Q21 = """
    SELECT s_name, count(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders      ON o_orderkey = l1.l_orderkey
                  JOIN nation      ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""

_SQL = {
    "q_sql_q2": SQL_Q2,
    "q_sql_q4": SQL_Q4,
    "q_sql_q6": SQL_Q6,
    "q_sql_q7": SQL_Q7,
    "q_sql_q8": SQL_Q8,
    "q_sql_q9": SQL_Q9,
    "q_sql_q10": SQL_Q10,
    "q_sql_q11": SQL_Q11,
    "q_sql_q12": SQL_Q12,
    "q_sql_q13": SQL_Q13,
    "q_sql_q14": SQL_Q14,
    "q_sql_q15": SQL_Q15,
    "q_sql_q16": SQL_Q16,
    "q_sql_q17": SQL_Q17,
    "q_sql_q19": SQL_Q19,
    "q_sql_q20": SQL_Q20,
    "q_sql_q21": SQL_Q21,
    "q_sql_q22": SQL_Q22,
}


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES = {name: _runner(sql) for name, sql in _SQL.items()}
ORACLE = dict(_SQL)
ROWS_ONLY: set[str] = set()
