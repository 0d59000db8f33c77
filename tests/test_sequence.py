"""Event-sequence analytics: funnel strict ordering, retention cohort
accounting, transition-matrix row-stochasticity."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import sequence


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_requires_strict_order(spark, tmp_path):
    """u1 completes view->click->purchase in order (depth 3). u2 clicked
    BEFORE their first view — the click must not count (depth 1). u3
    views and clicks but purchases before the click (depth 2)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 01:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 02:00:00", 1, "purchase", 0.0, "{}"),
        (4, "2024-01-02 01:00:00", 2, "click", 0.0, "{}"),
        (5, "2024-01-02 02:00:00", 2, "view", 0.0, "{}"),
        (6, "2024-01-03 00:00:00", 3, "view", 0.0, "{}"),
        (7, "2024-01-03 00:30:00", 3, "purchase", 0.0, "{}"),
        (8, "2024-01-03 01:00:00", 3, "click", 0.0, "{}"),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.user_id: r for r in sequence.q_event_funnel(spark, str(tmp_path)).collect()}
    assert out[1].funnel_depth == 3
    assert out[2].funnel_depth == 1 and out[2].t_click is None
    assert out[3].funnel_depth == 2 and out[3].t_purchase is None


def test_retention_week0_counts_every_user(spark, sf_dir):
    out = sequence.q_retention_cohorts(spark, sf_dir)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    week0 = out.filter(F.col("week_offset") == 0).agg(F.sum("n_active")).first()[0]
    assert week0 == n_users  # everyone is active in their own first week
    assert out.filter(F.col("week_offset") < 0).count() == 0


def test_transitions_are_row_stochastic(spark, sf_dir):
    out = sequence.q_event_transitions(spark, sf_dir)
    sums = out.groupBy("event_type").agg(F.round(F.sum("p"), 4).alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-3, r
    n_pairs = out.agg(F.sum("n")).first()[0]
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert n_pairs == n_events - n_users  # each user contributes len-1 pairs


def test_seq_pattern_negation_and_window(spark, tmp_path):
    """B119 semantics: u1 clean view->purchase (matched). u2 has an error
    BETWEEN view and purchase (not matched, n_excluded=1). u3 purchases
    outside the 7-day window (no t_purchase). u4's error falls AFTER the
    purchase — negation only covers the open interval (matched). u5's
    error is before the view (matched)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-02 00:00:00", 1, "purchase", 0.0, "{}"),
        (3, "2024-01-01 00:00:00", 2, "view", 0.0, "{}"),
        (4, "2024-01-01 12:00:00", 2, "error", 0.0, "{}"),
        (5, "2024-01-02 00:00:00", 2, "purchase", 0.0, "{}"),
        (6, "2024-01-01 00:00:00", 3, "view", 0.0, "{}"),
        (7, "2024-01-09 00:00:00", 3, "purchase", 0.0, "{}"),
        (8, "2024-01-01 00:00:00", 4, "view", 0.0, "{}"),
        (9, "2024-01-02 00:00:00", 4, "purchase", 0.0, "{}"),
        (10, "2024-01-03 00:00:00", 4, "error", 0.0, "{}"),
        (11, "2023-12-25 00:00:00", 5, "error", 0.0, "{}"),
        (12, "2024-01-01 00:00:00", 5, "view", 0.0, "{}"),
        (13, "2024-01-02 00:00:00", 5, "purchase", 0.0, "{}"),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.user_id: r for r in sequence.q_seq_pattern(spark, str(tmp_path)).collect()}
    assert out[1].matched and out[1].n_excluded == 0
    assert not out[2].matched and out[2].n_excluded == 1
    assert out[3].t_purchase is None and not out[3].matched
    assert out[4].matched and out[4].n_excluded == 0
    assert out[5].matched


def test_session_paths_order_and_gap(spark, tmp_path):
    """B124: events inside a session join in (ts, event_id) order; a
    >30-min gap splits the journey into two paths."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 00:05:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 00:10:00", 1, "purchase", 0.0, "{}"),
        # same user, 2h later: new session with a single view
        (4, "2024-01-01 02:30:00", 1, "view", 0.0, "{}"),
        # tie on ts: event_id breaks order (click id 5 < view id 6)
        (5, "2024-01-02 00:00:00", 2, "click", 0.0, "{}"),
        (6, "2024-01-02 00:00:00", 2, "view", 0.0, "{}"),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.path: r.n_sessions for r in sequence.q_session_paths(spark, str(tmp_path)).collect()}
    assert got == {"view>click>purchase": 1, "view": 1, "click>view": 1}


def test_ab_stats_unit_consistency(spark, sf_dir):
    """B128: assignment is per-UNIT — the same user never appears in
    both variants (across all event types), and per-cell sufficient
    stats match a pure-Python recomputation."""
    import hashlib

    from kinesis2elastic_spark.catalog import load

    out = sequence.q_ab_stats(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value").collect()
    py = {}
    units = {}
    for r in ev:
        var = "A" if hashlib.md5(str(r.user_id).encode()).hexdigest() < "8" else "B"
        v = int(r.value * 100 + 0.5)
        key = (var, r.event_type)
        n, s, ss = py.get(key, (0, 0, 0))
        py[key] = (n + 1, s + v, ss + v * v)
        units.setdefault(key, set()).add(r.user_id)
    got = {(r.variant, r.event_type): (r.n, r.sum_v, r.sum_vv) for r in out}
    assert got == py
    for r in out:
        assert r.n_units == len(units[(r.variant, r.event_type)])
    # unit-consistency: no user in both variants
    a_users = set().union(*(u for k, u in units.items() if k[0] == "A"))
    b_users = set().union(*(u for k, u in units.items() if k[0] == "B"))
    assert not (a_users & b_users)
