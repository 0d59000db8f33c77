"""Table-maintenance operators (driver-contract extension): the jobs a
large-scale pipeline runs *around* its queries — column profiling for data
quality gates, CDC latest-state compaction, and run-compression of
append-only histories.

Scale posture:
- the profiler is one aggregate pass; exact distincts expand to one
  shuffle per profiled column (Spark's count(distinct) expand), which is
  the audit-job trade-off — the approximate twin (q_approx_distinct)
  covers the always-on path;
- CDC latest-state is one window shuffle keyed by the entity id — the
  shuffle carries (key, ts, row), never history joins;
- run compression is the gaps-and-islands pattern: two window functions
  over the SAME (key, ts) sort order, so Catalyst plans ONE shuffle + one
  sort, then a partial-agg per island.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.hashing import md5_prefix_long
from ..functions.numerics import stable_round

PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over ``orders``: one row per profiled column with
    row/null/distinct accounting and the null fraction — the standard
    pre-ingest data-quality gate.  Single wide aggregate; the per-column
    exact distincts are the expensive (expand + shuffle) part and exist
    here because an audit gate needs exactness."""
    o = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in PROFILE_COLS
    )
    n = len(PROFILE_COLS)
    return wide.selectExpr(
        "n_rows", f"stack({n}, {stacked}) AS (col_name, n_non_null, n_distinct)"
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        stable_round((F.col("n_rows") - F.col("n_non_null")) / F.col("n_rows"), 6).alias(
            "null_frac"
        ),
    )


def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: treat ``events`` as a change stream keyed by
    user_id (event_type 'error' = tombstone, anything else = upsert of
    ``value``) and emit the latest surviving state per key plus its
    version count — the merge-on-read "latest wins" materialization.

    One window shuffle on the key; ties on ts break on event_id so the
    result is deterministic under at-least-once replay."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    versions = e.groupBy("user_id").agg(F.count("*").cast("long").alias("n_versions"))
    return (
        latest.filter(F.col("event_type") != "error")
        .join(versions, "user_id")
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
            F.col("ts").alias("last_ts"),
            "n_versions",
        )
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: turn the per-user change stream into
    validity-interval rows — one row per STATE CHANGE with
    [valid_from, valid_to) and a current flag, consecutive identical
    states collapsed (the warehouse-standard slowly-changing-dimension
    materialization, the history-preserving sibling of q_cdc_latest).

    Two window passes over one shuffle key (user_id): lag() detects state
    changes, lead() over the surviving change rows closes each interval.
    Ties on ts break on event_id, so the history is deterministic under
    at-least-once replay.  At scale both windows reuse the same hash
    partitioning — one Exchange total (plan-asserted)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_PIT_SQL = """
    WITH facts AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_id % 7 = 0),
    stream AS (
      SELECT * FROM events WHERE event_id % 7 <> 0),
    lagged AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM stream),
    chg AS (
      SELECT * FROM lagged
      WHERE prev_type IS NULL OR prev_type <> event_type),
    scd2_dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM chg)
    SELECT f.event_id, f.user_id, d.state,
           d.valid_from, d.valid_to
    FROM facts f JOIN scd2_dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from
     AND (f.ts < d.valid_to OR d.valid_to IS NULL)
"""


def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension: a fact slice of the
    event stream (event_id % 7 = 0) is enriched with the state each user
    was in at the fact's timestamp, where the state history is the SCD2
    build (q_scd2_history) over the remaining events.

    The textbook PIT predicate — fact.ts >= valid_from AND (fact.ts <
    valid_to OR valid_to IS NULL) — rides as a residual filter on the
    user_id equi-join, so the shuffle stays keyed and bounded (never a
    cross product).  Each fact matches exactly one interval (intervals
    partition the timeline per user), which the pytest asserts.  DuckDB
    runs the identical SQL, independently planned (IEJoin)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SCD2_PIT_SQL)


def q_run_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run compression: collapse each user's consecutive
    same-type events into one range row (first/last ts, run length) — the
    SCD2-style history compaction for append-only logs.

    The island id is the classic difference of two row_numbers over the
    same sort order, so the whole query is ONE shuffle + one sort + a
    partial aggregate keyed by (user_id, island)."""
    e = load(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return (
        runs.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count("*").cast("long").alias("run_len"),
        )
        .select("user_id", "event_type", "run_start", "run_end", "run_len")
    )


def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: median + MAD (median
    absolute deviation), flagging |value - median| > 3 * MAD — the
    data-cleaning gate that, unlike z-scores, is not dragged by the
    outliers it hunts.

    Two exact-percentile aggregation passes (median, then MAD over the
    residuals) joined back via a small broadcast (one row per event_type)
    — events shuffle once per pass, stats never leave the executors
    except as the k-row dim.  Cross-engine robustness: the cut uses
    ROUNDED median/MAD (6 dp) so boundary rows can't flip on last-ulp
    interpolation differences between engines."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            stable_round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "med", "mad", "n", "n_outliers")
    )


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (record linkage): probe names with a planted
    1-edit typo (``Customer`` → ``Custmer``) matched back against the
    customer table by Levenshtein distance <= 2.

    An unblocked fuzzy join is O(n x m) edit-distance calls — the classic
    scale killer.  Here candidates are generated by an equi-join on a
    blocking key (the 4-char name suffix, untouched by the head typo), so
    the expensive ``levenshtein`` runs only within blocks; the probe side
    broadcasts.  Same pattern as the LSH dedup paths: cheap candidate
    generation, exact verify on candidates only."""
    c = load(spark, sf_dir, "customer")
    probes = (
        c.filter(F.col("c_custkey") % 97 == 0)
        .select(
            F.col("c_custkey").alias("probe_key"),
            F.expr("replace(c_name, 'Customer', 'Custmer')").alias("probe_name"),
            F.expr("right(c_name, 4)").alias("blk"),
        )
    )
    cand = F.broadcast(probes).join(
        c.withColumn("blk", F.expr("right(c_name, 4)")), "blk"
    )
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein("probe_name", "c_name").cast("long")
        )
        .filter(F.col("edit_dist") <= 2)
        .select(
            "probe_key",
            "probe_name",
            F.col("c_custkey").alias("match_key"),
            F.col("c_name").alias("match_name"),
            "edit_dist",
        )
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a transactional table format: apply a
    change batch to a target snapshot with the full matched/not-matched
    action matrix (reference parity: the bulk sink's index-vs-update
    behavior, ``main.go`` bulk actions; warehouse parity: Delta/Iceberg
    MERGE).  Target = latest state per user from even event_ids; source
    = latest change per user from odd event_ids.  WHEN MATCHED AND
    source is an error → DELETE; WHEN MATCHED → UPDATE; WHEN NOT
    MATCHED AND not error → INSERT; target rows without a change KEEP.

    Scale shape: one full-outer shuffle join on the merge key (both
    sides pre-collapsed to one row per key by WindowGroupLimit-able
    row_number), then a pure projection — the same single-shuffle plan a
    table format's MERGE executes; the emitted ``action`` column is the
    audit trail a MERGE would log as its operation metrics."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(pred):
        return (
            e.filter(pred)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value", "ts")
        )

    target = latest(F.col("event_id") % 2 == 0)
    source = latest(F.col("event_id") % 2 == 1)
    j = target.alias("t").join(source.alias("s"), "user_id", "full_outer")
    action = (
        F.when(F.col("s.event_type").isNull(), "keep")
        .when(F.col("s.event_type") == "error", "delete")
        .when(F.col("t.event_type").isNull(), "insert")
        .otherwise("update")
    )
    return (
        j.select(
            "user_id",
            F.coalesce("s.event_type", "t.event_type").alias("state"),
            F.round(F.coalesce("s.value", "t.value"), 2).alias("value"),
            F.coalesce("s.ts", "t.ts").alias("state_ts"),
            action.alias("action"),
        )
        # delete covers both MATCHED-delete and the not-matched error
        # no-op (MERGE skips those); neither survives the merge
        .filter(F.col("action") != "delete")
    )


MATVIEW_CUTOFF = "1997-01-15"  # MID-month: the cutoff month's groups get
# rows on BOTH sides, so the merge's add/fold arithmetic is actually
# exercised (a month-aligned cutoff makes every group one-sided and turns
# the merge into dead code the oracle can't catch breaking)


def q_matview_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B126: incremental materialized-view maintenance — the operation
    that makes a 100-TB aggregate table affordable: when a delta batch
    lands, the MV is updated by aggregating ONLY the delta and merging
    it into the existing MV state (one delta scan + an |MV|-sized merge),
    never by re-aggregating the base.

    Fixture: orders split at a deterministic date cutoff into base and
    delta; the MV (per status × order-month: count, exact cents sum,
    min/max order key) is built from the base, the delta is aggregated
    separately, and the two MERGE through a full-outer combine —
    count/sum add, min/max fold, a group present on one side passes
    through.  The hashed merged MV must equal the oracle's one-shot
    aggregate over ALL orders: any non-commutative merge rule, dropped
    one-sided group, or null-poisoned fold flips it.

    Deliberately restricted to DELTA-MERGEABLE aggregates (count/sum/
    min/max — the algebraic class): avg ships as sum+count, distincts
    need sketch state (B65's mergeable HLL is that path)."""
    o = load(spark, sf_dir, "orders")
    t = mv_project(o)
    base = mv_aggregate(t.filter(F.col("o_orderdate") < MATVIEW_CUTOFF))
    delta = mv_aggregate(t.filter(F.col("o_orderdate") >= MATVIEW_CUTOFF))
    return mv_merge(base, delta)


# MV helpers shared by the batch delta-merge above and the foreachBatch
# continuous maintainer (``streaming/matview_stream.py``, B126's streaming
# leg): ONE definition of the view's projection, aggregate, and merge rule
# so the batch oracle provably pins the streaming state machine too.

MV_STATE_SCHEMA = (
    "o_orderstatus string, month date, n long, sum_cents long, "
    "min_key long, max_key long"
)


def mv_project(o: DataFrame) -> DataFrame:
    """Orders → the MV's input stream (status, month, exact cents, key)."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return o.select(
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        cents.alias("cents"),
        "o_orderkey",
        "o_orderdate",
    )


def mv_aggregate(df: DataFrame) -> DataFrame:
    """Delta-mergeable per-group state: count/sum/min/max only."""
    return df.groupBy("o_orderstatus", "month").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


def mv_merge(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Full-outer combine of two MV states: counts/sums add, min/max
    fold, one-sided groups pass through (null-safe on either side)."""
    b, d = base.alias("b"), delta.alias("d")
    return b.join(d, ["o_orderstatus", "month"], "full_outer").select(
        "o_orderstatus",
        "month",
        (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0)))
        .cast("long")
        .alias("n"),
        (
            F.coalesce(F.col("b.sum_cents"), F.lit(0))
            + F.coalesce(F.col("d.sum_cents"), F.lit(0))
        )
        .cast("long")
        .alias("sum_cents"),
        F.least(
            F.coalesce(F.col("b.min_key"), F.col("d.min_key")),
            F.coalesce(F.col("d.min_key"), F.col("b.min_key")),
        )
        .cast("long")
        .alias("min_key"),
        F.greatest(
            F.coalesce(F.col("b.max_key"), F.col("d.max_key")),
            F.coalesce(F.col("d.max_key"), F.col("b.max_key")),
        )
        .cast("long")
        .alias("max_key"),
    )


def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B123: field-level survivorship merge (the MDM "golden record"):
    B47's CDC latest-state is ROW-level (the newest row wins wholesale);
    real change feeds carry sparse updates, so each FIELD must
    independently survive from the latest row where it was non-null —
    a later row with a null field must NOT erase an earlier value.

    Feed derivation (deterministic, oracle-reproducible): events as
    sparse per-user updates — status fields only on view/click/signup
    rows, monetary value only on purchase rows, error timestamp only on
    error rows.  Per field the survivor is ``max(struct(ts, event_id,
    field))`` over the rows where the field is non-null: ONE map-side
    combinable aggregate for ALL fields in a single shuffle keyed by
    user_id (no per-field window passes, no history self-joins —
    (ts, event_id) is unique so the lexicographic max IS the latest).

    Hash-safe: status strings, micro-unit BIGINT value, timestamps."""
    e = load(spark, sf_dir, "events")
    f_status = F.when(
        F.col("event_type").isin("view", "click", "signup"), F.col("event_type")
    )
    f_value = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long"),
    )
    f_err = F.when(F.col("event_type") == "error", F.col("ts"))

    def survive(field, name):
        picked = F.max(
            F.when(field.isNotNull(), F.struct("ts", "event_id", field.alias("v")))
        )
        return picked.getField("v").alias(name)

    return (
        e.groupBy("user_id")
        .agg(
            survive(f_status, "last_status"),
            survive(f_value, "last_value_micro"),
            survive(f_err, "last_error_ts"),
            F.count("*").cast("long").alias("n_updates"),
        )
    )


TDIFF_BUCKETS = 64


def table_diff(src: DataFrame, dst: DataFrame, key: str, fingerprint) -> DataFrame:
    """B122 kernel: Merkle-style reconciliation of two table versions —
    how a 100-TB replication/backfill is audited WITHOUT shipping either
    table: each side collapses to ``TDIFF_BUCKETS`` (bucket, count,
    checksum) rows (one scan, map-combinable agg, 64-row shuffle); only
    buckets whose summaries disagree are drilled row-by-row (a semi-join
    on the differing bucket ids prunes both scans to ~d/64ths of the
    data for d differing buckets).

    ``fingerprint`` is a Column: an exact BIGINT content hash of the row
    (md5-prefix doctrine).  Detection is probabilistic in the adversarial
    sense only: a bucket whose count matches AND whose fingerprint SUM
    collides (~2⁻³² per mutated bucket for the 32-bit prefix) would be
    missed — widen the prefix to 12–15 hex chars (md5_prefix_long's
    documented n_hex<=15 ceiling: 16 hex digits can exceed signed BIGINT)
    when auditing against a malicious writer rather than bit
    rot/replication loss.  Output: one
    row per differing KEY — present flags per side and content equality;
    identical tables → empty."""
    b = lambda c: md5_prefix_long(c) % TDIFF_BUCKETS  # noqa: E731

    def summarize(df):
        return df.groupBy(b(F.col(key)).alias("bucket")).agg(
            F.count("*").alias("n"), F.sum(fingerprint).alias("chk")
        )

    diff_buckets = (
        summarize(src)
        .withColumnRenamed("n", "n_s")
        .withColumnRenamed("chk", "c_s")
        .join(
            summarize(dst)
            .withColumnRenamed("n", "n_d")
            .withColumnRenamed("chk", "c_d"),
            "bucket",
            "full_outer",
        )
        .filter(
            # eqNullSafe: a bucket present on one side only must DIFFER,
            # not null out of the predicate
            ~(
                F.col("n_s").eqNullSafe(F.col("n_d"))
                & F.col("c_s").eqNullSafe(F.col("c_d"))
            )
        )
        .select("bucket")
    )
    drill = F.broadcast(diff_buckets)  # ≤ TDIFF_BUCKETS rows by construction
    s = (
        src.withColumn("bucket", b(F.col(key)))
        .join(drill, "bucket", "left_semi")
        .select(F.col(key), fingerprint.alias("fp_s"))
    )
    d = (
        dst.withColumn("bucket", b(F.col(key)))
        .join(drill, "bucket", "left_semi")
        .select(F.col(key), fingerprint.alias("fp_d"))
    )
    return (
        s.join(d, key, "full_outer")
        .withColumn("in_src", F.col("fp_s").isNotNull())
        .withColumn("in_dst", F.col("fp_d").isNotNull())
        .withColumn(
            "content_equal",
            F.coalesce(F.col("fp_s") == F.col("fp_d"), F.lit(False)),
        )
        .filter(~F.col("content_equal"))
        .select(key, "in_src", "in_dst", "content_equal")
    )


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B122 contract query: reconcile documents against a replica with
    three planted divergences, each derived deterministically from the
    data so the oracle can reproduce them — the min-doc_id row DROPPED,
    the max-doc_id row's text MUTATED (suffix append), and one row
    INSERTED past the max id.  The diff must surface exactly those three
    keys with the right present/equal flags: a false positive (checksum
    collision handling, bucket misroute) or a false negative (missed
    bucket, lossy drill) flips the hash."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    replica = (
        d.filter(F.col("doc_id") != lo)
        .withColumn(
            "text",
            F.when(F.col("doc_id") == hi, F.concat(F.col("text"), F.lit("X"))).otherwise(
                F.col("text")
            ),
        )
        .unionByName(
            d.sparkSession.createDataFrame(
                [(int(hi) + 1, "inserted", 8)], "doc_id long, text string, n_chars long"
            )
        )
    )
    fp = md5_prefix_long(
        F.concat_ws("|", F.col("doc_id"), F.col("text"), F.col("n_chars"))
    )
    return table_diff(d, replica, "doc_id", fp)


COMPACT_FILE_DOCS = 50          # pseudo-file granularity of the manifest
COMPACT_TARGET_BYTES = 200_000  # compaction bin target (bytes)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B135: compaction planning — the table-maintenance step that keeps
    a 100 TB table readable: small files accumulate from streaming
    commits (every micro-batch of the B91 shard writer or the B126
    maintainer lands files), and the planner groups consecutive files
    per partition into target-sized rewrite bins (Spark's own
    maxPartitionBytes coalescing and every ACID format's OPTIMIZE job
    use exactly this cumulative-size chunking rule).

    Operates on the FILE MANIFEST, never the data: one row per file
    (fixture: pseudo-files of ``COMPACT_FILE_DOCS`` docs per source,
    bytes = exact sum of n_chars), so the per-source sequential window
    is metadata-rate — ~10⁶ manifest rows per source at 100 TB with
    128 MB files, a single trivial task; the data itself moves only in
    the rewrite jobs this plan drives, each bounded by the bin target.

    Deterministic greedy rule: files ordered by id within source,
    ``bin = cumulative_bytes_before div target`` — pure BIGINT, so the
    whole plan (bin id, bin fill, small-file flag) hashes exactly
    cross-engine."""
    d = load(spark, sf_dir, "documents")
    files = d.groupBy(
        "source", F.expr(f"doc_id div {COMPACT_FILE_DOCS}").alias("file_id")
    ).agg(F.sum("n_chars").cast("long").alias("file_bytes"))
    planned = files.withColumn(
        "bin",
        F.expr(
            f"coalesce(sum(file_bytes) over (partition by source order by "
            f"file_id rows between unbounded preceding and 1 preceding), 0) "
            f"div {COMPACT_TARGET_BYTES}"
        ),
    )
    wbin = W.partitionBy("source", "bin").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return planned.select(
        "source",
        "file_id",
        "file_bytes",
        "bin",
        F.sum("file_bytes").over(wbin).cast("long").alias("bin_bytes"),
        F.count("*").over(wbin).cast("long").alias("bin_n_files"),
        (F.col("file_bytes") < COMPACT_TARGET_BYTES).alias("is_small_file"),
    )


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B159: declarative data-quality expectation suite (the dbt-test /
    Great-Expectations contract layer a pipeline gates ingestion on),
    COMPILED to one pass per table: every row-local check over a table
    becomes a conditional aggregate in a SINGLE scan — not the naive
    one-scan-per-check that turns a 20-expectation suite into 20 reads
    of a 100 TB table — and the one relational check (referential
    integrity) is the irreducible extra: an anti-join that shuffles
    only the key columns.

    Suite (the standard five check kinds on the orders/lineitem
    contract): not_null(o_orderkey), unique(o_orderkey) — count minus
    distinct inside the same aggregate — accepted_values(o_orderstatus
    ∈ {{F,O,P}}), range(o_totalprice > 0), and fk(lineitem.l_orderkey ⊆
    orders.o_orderkey) via left-anti.  Output: one row per check with
    its exact violation count and a pass flag — the gating artifact a
    WAP audit (B153) consumes.  The unpivot to rows is a literal
    ``stack`` over the one aggregate row, not a second pass.

    Plan contract (test-asserted): the four row-local checks share ONE
    orders scan; adding a check adds a column to that aggregate, never
    a scan.  Oracle: five scalar subqueries DuckDB computes its own
    way — the hash proves the compiled single-pass aggregate equals
    the declarative per-check counts."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    agg = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_not_null"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_unique"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        )
        .cast("long")
        .alias("v_accepted"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("v_range"),
    )
    rows = agg.selectExpr(
        "stack(4, "
        "'not_null_orderkey', v_not_null, "
        "'unique_orderkey', v_unique, "
        "'accepted_orderstatus', v_accepted, "
        "'positive_totalprice', v_range) AS (check_name, n_violations)"
    )
    fk = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(F.lit("fk_lineitem_orders").alias("check_name"), "n_violations")
    )
    return rows.unionByName(fk).select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


QUERIES = {
    "q_profile_columns": q_profile_columns,
    "q_expectations": q_expectations,
    "q_compaction_plan": q_compaction_plan,
    "q_cdc_latest": q_cdc_latest,
    "q_run_compress": q_run_compress,
    "q_outlier_mad": q_outlier_mad,
    "q_fuzzy_join": q_fuzzy_join,
    "q_scd2_history": q_scd2_history,
    "q_scd2_pointintime": q_scd2_pointintime,
    "q_merge_upsert": q_merge_upsert,
    "q_table_diff": q_table_diff,
    "q_survivorship": q_survivorship,
    "q_matview_delta": q_matview_delta,
}

_PROFILE_UNION = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               floor(CAST(count(*) - count({c}) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS null_frac
        FROM orders"""
    for c in PROFILE_COLS
)

ORACLE = {
    "q_profile_columns": _PROFILE_UNION,
    "q_scd2_pointintime": SCD2_PIT_SQL,
    "q_scd2_history": """
        WITH chg AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events
          QUALIFY prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_cdc_latest": """
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events),
        versions AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions
          FROM events GROUP BY user_id)
        SELECT r.user_id,
               r.event_type AS last_event_type,
               round(r.value, 2) AS last_value,
               r.ts AS last_ts,
               v.n_versions
        FROM ranked r JOIN versions v USING (user_id)
        WHERE r.rn = 1 AND r.event_type <> 'error'
    """,
    "q_run_compress": """
        WITH runs AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS island
          FROM events)
        SELECT user_id, event_type,
               min(ts) AS run_start, max(ts) AS run_end,
               CAST(count(*) AS BIGINT) AS run_len
        FROM runs GROUP BY user_id, event_type, island
    """,
    "q_outlier_mad": """
        WITH med AS (
          SELECT event_type, floor(median(value) * 1e6 + 0.5) / 1e6 AS med
          FROM events GROUP BY event_type),
        mad AS (
          SELECT e.event_type,
                 floor(median(abs(e.value - m.med)) * 1e6 + 0.5) / 1e6 AS mad,
                 any_value(m.med) AS med
          FROM events e JOIN med m USING (event_type)
          GROUP BY e.event_type)
        SELECT e.event_type, m.med, m.mad,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN mad m USING (event_type)
        GROUP BY e.event_type, m.med, m.mad
    """,
    "q_merge_upsert": """
        WITH tgt AS (
          SELECT user_id, event_type, value, ts
          FROM events WHERE event_id % 2 = 0
          QUALIFY row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) = 1),
        src AS (
          SELECT user_id, event_type, value, ts
          FROM events WHERE event_id % 2 = 1
          QUALIFY row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) = 1),
        merged AS (
          SELECT coalesce(t.user_id, s.user_id) AS user_id,
                 coalesce(s.event_type, t.event_type) AS state,
                 round(coalesce(s.value, t.value), 2) AS value,
                 coalesce(s.ts, t.ts) AS state_ts,
                 CASE WHEN s.event_type IS NULL THEN 'keep'
                      WHEN s.event_type = 'error' THEN 'delete'
                      WHEN t.event_type IS NULL THEN 'insert'
                      ELSE 'update' END AS action
          FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id)
        SELECT * FROM merged WHERE action <> 'delete'
    """,
    "q_fuzzy_join": """
        WITH probes AS (
          SELECT c_custkey AS probe_key,
                 replace(c_name, 'Customer', 'Custmer') AS probe_name,
                 right(c_name, 4) AS blk
          FROM customer WHERE c_custkey % 97 = 0)
        SELECT p.probe_key, p.probe_name,
               c.c_custkey AS match_key, c.c_name AS match_name,
               CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS edit_dist
        FROM probes p JOIN customer c ON right(c.c_name, 4) = p.blk
        WHERE levenshtein(p.probe_name, c.c_name) <= 2
    """,
    # the three planted divergences, derived the same way: min doc_id
    # dropped from the replica, max doc_id content-mutated, max+1 inserted
    "q_table_diff": """
        WITH m AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents)
        SELECT lo AS doc_id, TRUE AS in_src, FALSE AS in_dst,
               FALSE AS content_equal FROM m
        UNION ALL
        SELECT hi, TRUE, TRUE, FALSE FROM m
        UNION ALL
        SELECT hi + 1, FALSE, TRUE, FALSE FROM m
    """,
    # per-field latest-non-null survivor via max over a (ts, eid, v)
    # struct restricted to non-null rows — same lexicographic pick as
    # Spark ((ts, event_id) unique, so the max IS the latest)
    "q_survivorship": """
        WITH r AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type IN ('view','click','signup')
                      THEN event_type END AS f_status,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                      END AS f_value,
                 CASE WHEN event_type = 'error' THEN ts END AS f_err
          FROM events)
        SELECT user_id,
               (max(CASE WHEN f_status IS NOT NULL
                    THEN {'ts': ts, 'eid': event_id, 'v': f_status} END)).v
                 AS last_status,
               (max(CASE WHEN f_value IS NOT NULL
                    THEN {'ts': ts, 'eid': event_id, 'v': f_value} END)).v
                 AS last_value_micro,
               (max(CASE WHEN f_err IS NOT NULL
                    THEN {'ts': ts, 'eid': event_id, 'v': f_err} END)).v
                 AS last_error_ts,
               CAST(count(*) AS BIGINT) AS n_updates
        FROM r GROUP BY user_id
    """,
    # one-shot aggregate over ALL orders — the merged base+delta MV must
    # equal this exactly
    "q_matview_delta": """
        SELECT o_orderstatus,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(min(o_orderkey) AS BIGINT) AS min_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM orders GROUP BY o_orderstatus, month
    """,
}

ORACLE["q_expectations"] = """
    WITH checks(check_name, n_violations) AS (
      SELECT 'not_null_orderkey',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderkey IS NULL)
      UNION ALL
      SELECT 'unique_orderkey',
             (SELECT CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                     AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'accepted_orderstatus',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
      UNION ALL
      SELECT 'positive_totalprice',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_totalprice <= 0)
      UNION ALL
      SELECT 'fk_lineitem_orders',
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    )
    SELECT check_name,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM checks
"""

ORACLE["q_compaction_plan"] = f"""
    WITH files AS (
      SELECT source, doc_id // {COMPACT_FILE_DOCS} AS file_id,
             CAST(sum(n_chars) AS BIGINT) AS file_bytes
      FROM documents GROUP BY 1, 2),
    planned AS (
      SELECT source, file_id, file_bytes,
             CAST(coalesce(sum(file_bytes) OVER (
                    PARTITION BY source ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin
      FROM files)
    SELECT source, file_id, file_bytes, bin,
           CAST(sum(file_bytes) OVER (PARTITION BY source, bin) AS BIGINT)
             AS bin_bytes,
           CAST(count(*) OVER (PARTITION BY source, bin) AS BIGINT)
             AS bin_n_files,
           file_bytes < {COMPACT_TARGET_BYTES} AS is_small_file
    FROM planned
"""

ROWS_ONLY: set[str] = set()
