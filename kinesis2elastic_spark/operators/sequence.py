"""Event-sequence analytics (driver-contract extension): ordered-behavior
operators over the event stream — conversion funnels, cohort retention,
and first-order transition matrices.  These are the canonical
product-analytics / sequence-modeling-prep queries a log-analytics engine
is expected to answer (and the shape session-ized training data takes
before next-event modeling).

Scale posture:
- the funnel is three conditional-min aggregations, each map-side
  combinable and keyed by user_id — one shuffle per stage boundary,
  carrying (user, timestamp) pairs only, never event history;
- retention is a self-join-free double aggregation: first-seen per user
  (one shuffle), then (cohort, offset) cells (second shuffle of one row
  per active user-day) — the cell count is bounded by cohorts x horizon,
  independent of event volume;
- transitions are one window pass (lag/lead share the sessionize sort)
  plus a map-side-combinable pair count; the matrix is |types|² cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.sessions import session_cte_sql, with_session_ids
from ..functions.numerics import stable_round

FUNNEL_STEPS = ("view", "click", "purchase")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view → click → purchase per user:
    the earliest view, the earliest click AFTER that view, the earliest
    purchase AFTER that click; funnel_depth counts completed stages.

    Each stage is a conditional-min aggregate joined back on user_id
    (the per-user stage timestamps are scalars, so the join sides stay
    narrow); no window over full event history is needed."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(c.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("funnel_depth"),
        )
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    distinct in each later week offset — the activation/decay matrix.

    Two aggregations, no self-join: first-seen per user, then distinct
    users per (cohort_week, week_offset) cell.  The second shuffle
    carries one row per active (user, day), and the output is bounded by
    cohorts x horizon regardless of event volume."""
    e = load(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "cohort_day").cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("cohort_day")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    counts and row-normalized probabilities for (event_type → next),
    the prep table for Markov-style next-event modeling.  One window
    pass (the same (user, ts) sort sessionization uses) then a
    map-side-combinable pair count; |types|² output cells."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wt = W.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        stable_round(F.col("n") / F.sum("n").over(wt), 6).alias("p"),
    )


SEQPAT_WINDOW_DAYS = 7
SEQPAT_START, SEQPAT_END, SEQPAT_NOT = "view", "purchase", "error"


def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B119: sequence-pattern matching WITH NEGATION — the
    MATCH_RECOGNIZE shape (`A ... B within T, no C between`) that plain
    funnels (B62) cannot express: a conversion only counts if no error
    event interrupted it.  Pattern here: first `view` per user, first
    `purchase` strictly after it within SEQPAT_WINDOW_DAYS, matched only
    if NO `error` falls strictly between the two.

    The naive engine shape is per-user ordered-history row matching (a
    window over every event); this stays in the funnel discipline —
    three conditional-min/count aggregations, each map-side combinable
    and keyed by user_id, joined on narrow (user, scalar-ts) frames.
    The negation is an exact intervening-event COUNT (not an anti-join),
    so the output also reports HOW interrupted the cohort is.  At 100 TB
    every shuffle carries one row per user, never event history.

    Hash-safe: timestamps and counts only — no floats anywhere."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # v and p are user-rate two-column frames that feed MULTIPLE joins
    # (v → p, x, final; p → x, final); Spark re-executes the shared
    # subtree per consumer, so the events scan + agg ran 6× per query
    # (14 `Scan parquet` nodes in the r13 plan).  Materializing each
    # once (r14, guide §2.4) cuts that to one events scan per
    # event-type filter; the shuffles already carried one row per user.
    v = (
        e.filter(F.col("event_type") == SEQPAT_START)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=True)
    )
    p = (
        e.filter(F.col("event_type") == SEQPAT_END)
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (
                F.col("ts")
                <= F.col("t_view") + F.expr(f"INTERVAL {SEQPAT_WINDOW_DAYS} DAYS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
        .localCheckpoint(eager=True)
    )
    x = (
        e.filter(F.col("event_type") == SEQPAT_NOT)
        .join(v, "user_id")
        .join(p, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") < F.col("t_purchase")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_x"))
    )
    return (
        v.join(p, "user_id", "left")
        .join(x, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_purchase",
            F.coalesce(F.col("n_x"), F.lit(0)).cast("long").alias("n_excluded"),
            (
                F.col("t_purchase").isNotNull() & (F.coalesce(F.col("n_x"), F.lit(0)) == 0)
            ).alias("matched"),
        )
    )


PATHS_TOP_K = 25


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B124: session path mining — the frequency table of ordered
    within-session event-type journeys ("view>click>purchase"), the
    product-analytics staple behind sankey/flow views and the sequence
    vocabulary for next-event models.  Sessions use B25's exact rule
    (30-min gap, (ts, event_id) order) so the two operators agree on
    session identity.

    Path construction stays in one window pass + one groupBy: the
    session's events collect as (ts, event_id, type) structs under a
    map-combinable ``collect_list``, are ``array_sort``ed (lexicographic
    struct order = the session's event order — deterministic, shuffle-
    order-proof), and join into the path string JVM-side.  Per-session
    state is bounded by session length (minutes of one user's activity),
    never by history.  Output: top-``PATHS_TOP_K`` paths by frequency —
    TakeOrderedAndProject, no global sort."""
    e = load(spark, sf_dir, "events")
    sessions = with_session_ids(e)
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(F.transform("evs", lambda s: s["event_type"]), ">").alias(
                "path"
            ),
            F.size("evs").cast("long").alias("path_len"),
        )
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATHS_TOP_K)
    )


AB_SPLIT_HEX = "8"  # md5(user) first hex < '8' → variant A (50/50)


def q_ab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B128: deterministic experiment assignment + exact metric
    sufficient statistics — the A/B-testing readout.  Assignment hashes
    the UNIT (user), never the event, so every event of a user lands in
    the same variant, assignment is reproducible across engines and
    reruns (the q_hash_sample md5-keyspace discipline), and no
    assignment table needs storing or joining at 100 TB — the variant
    is a pure function computed in the scan.

    Per (variant, event_type): the exact sufficient statistics a
    difference-of-means test needs — n, Σx, Σx² over the CENTI-unit
    metric (micro-units would push Σx² past int64 at sf0.1 already;
    centi keeps the squared sum exact through ~3×10⁹ rows per cell with
    this metric's ≤10⁴ range — grouped-OLS overflow-envelope discipline,
    decimal(38) escape past that), plus distinct units via countDistinct
    (one shuffle keyed (variant, type, user)).  Welch's t itself divides
    and square-roots — libm, engine-local — so by doctrine it stays a
    consumer epilogue of these exact BIGINTs."""
    e = load(spark, sf_dir, "events")
    variant = F.when(
        F.md5(F.col("user_id").cast("string").cast("binary")) < AB_SPLIT_HEX, "A"
    ).otherwise("B")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        e.select(variant.alias("variant"), "event_type", v.alias("v"), "user_id")
        .groupBy("variant", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("sum_v"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("sum_vv"),
            F.countDistinct("user_id").cast("long").alias("n_units"),
        )
    )


QUERIES = {
    "q_event_funnel": q_event_funnel,
    "q_retention_cohorts": q_retention_cohorts,
    "q_event_transitions": q_event_transitions,
    "q_seq_pattern": q_seq_pattern,
    "q_session_paths": q_session_paths,
    "q_ab_stats": q_ab_stats,
}

ORACLE = {
    "q_event_funnel": """
        WITH v AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t_click, any_value(v.t_view) AS t_view
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS funnel_depth
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    "q_retention_cohorts": """
        WITH act AS (
          SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        first AS (
          SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id)
        SELECT CAST(date_trunc('week', f.cohort_day) AS DATE) AS cohort_week,
               CAST(date_diff('day', f.cohort_day, a.d) // 7 AS BIGINT) AS week_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM act a JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    "q_ab_stats": """
        WITH t AS (
          SELECT CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                      THEN 'A' ELSE 'B' END AS variant,
                 event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                 user_id
          FROM events)
        SELECT variant, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sum_v,
               CAST(sum(v * v) AS BIGINT) AS sum_vv,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_units
        FROM t GROUP BY variant, event_type
    """,
    "q_session_paths": f"""
        WITH {session_cte_sql("user_id, ts, event_id, event_type")}, paths AS (
          SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                 CAST(count(*) AS BIGINT) AS path_len
          FROM sessioned GROUP BY user_id, session_id)
        SELECT path, path_len, CAST(count(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path, path_len
        ORDER BY n_sessions DESC, path LIMIT 25
    """,
    "q_seq_pattern": """
        WITH v AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 7 DAY
          GROUP BY e.user_id),
        x AS (
          SELECT e.user_id, count(*) AS n_x
          FROM events e JOIN v USING (user_id) JOIN p USING (user_id)
          WHERE e.event_type = 'error'
            AND e.ts > v.t_view AND e.ts < p.t_purchase
          GROUP BY e.user_id)
        SELECT v.user_id, v.t_view, p.t_purchase,
               CAST(coalesce(x.n_x, 0) AS BIGINT) AS n_excluded,
               (p.t_purchase IS NOT NULL AND coalesce(x.n_x, 0) = 0) AS matched
        FROM v LEFT JOIN p USING (user_id) LEFT JOIN x USING (user_id)
    """,
    "q_event_transitions": """
        WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events),
        pairs AS (
          SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
        SELECT event_type, next_type, n,
               floor(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY event_type) * 1e6 + 0.5) / 1e6 AS p
        FROM pairs
    """,
}

ROWS_ONLY: set[str] = set()
