"""Benchmark harness (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": <float>,
     "duckdb": {"q_...": sec, ...}, "ratio_spark_over_duckdb": {...},
     "ratio_median": <float>}

Each Spark query is forced end-to-end with a noop-format write (full
materialization, no driver collect overhead in the timing).  For every
headline query that has an oracle, the DuckDB oracle SQL is also timed on
the same parquet (fetchall materialization) — the per-query
spark/duckdb ratio is the concrete stand-in for the reference baseline
(BASELINE.md publishes no numbers), tracked round over round.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from kinesis2elastic_spark.session import get_spark

# Headline set: covers scan/agg, star join, windows, sessionization, grok,
# full decode chain (pandas UDF), dedup (exact + LSH), similarity search,
# pivot, time bucketing, pipeline e2e, text analysis.
HEADLINE = [
    "q_pricing_agg",
    "q_join_star",
    "q_window_running",
    "q_topk_per_group",
    "q_sessionize",
    "q_tumble_batch",
    "q_pivot",
    "q_grok",
    "q_pipeline_axway",
    "q_firehose_flatten",
    "q_dedup_exact",
    "q_minhash_near_dup",
    "q_dedup_clusters",
    "q_cosine_topk",
    "q_text_stats",
    "q_sql_q3",
    "q_sql_q5",
    "q_asof_join",
    "q_skew_salted_agg",
    "q_pii_redact",
    "q_decontam",
    "q_run_compress",
    "q_tfidf",
    "q_doc_chunk",
    "q_session_overlap",
    "q_hll_merge",
    "q_sql_q8",
    "q_exact_substr_dedup",
    "q_bloom_decontam",
    "q_bm25",
    "q_vocab_oov",
    "q_scd2_history",
    "q_merge_upsert",
    "q_inverted_index",
    "q_heavy_hitters",
    # r3: the heaviest of the newly-completed TPC-H shapes — correlated
    # per-part min over a derived partsupp (Q2), 5-way fact-dim profit
    # join (Q9), EXISTS/NOT-EXISTS self-join pair (Q21).
    "q_sql_q2",
    "q_sql_q9",
    "q_sql_q21",
    # r3: PQ-ADC — the compressed-codes ANN scale path
    "q_ann_pq",
    # r4: composed curation chain (lang gate -> quality -> dedup -> budget)
    "q_curation_pipeline",
    # r4: tokenizer encode (fit + vocab-join apply), filtered vector
    # search, and the training-shard manifest
    "q_bpe_encode",
    "q_ann_filtered",
    "q_shard_manifest",
    # r5: embedding-space benchmark decontamination (one mapInPandas
    # matmul, zero shuffle) and temperature mixture reweighting
    "q_semantic_decontam",
    "q_mixture_weights",
    # r6: the distributed exact-ntile decile assignment (vs DuckDB's
    # declarative global-sort ntile — like-for-like work, different plan)
    "q_quality_buckets",
    # r7: the three r6 execution shapes with no prior perf visibility —
    # Arrow grouped-agg UDAF, second-native-format write+read roundtrip,
    # binaryFile ingest (r6 VERDICT #6)
    "q_udaf_median",
    "q_orc_roundtrip",
    "q_binary_source",
    # r8: DSIR importance reweighting (hashed-ngram model build +
    # broadcast-scored pool — the new r8 shape)
    "q_importance_weights",
    # r8 session 2: the iterative BFS fixpoint (recursive-CTE surface —
    # the one execution shape where the per-round job floor compounds;
    # DuckDB's recursive CTE is the like-for-like twin) and the integer
    # rank-statistic shape (exact AUC: groupBy collapse + domain window)
    "q_graph_reach",
    "q_auc_exact",
    # r9: the two heaviest r8-new shapes now tracked round-over-round
    # (r8 VERDICT #7) — Merkle bucket-summary reconciliation (two full
    # scans + 64-row summary shuffle) and sequence-pattern-with-negation
    # (per-user ordered window + pattern join)
    "q_table_diff",
    "q_seq_pattern",
    # r10 (r9 VERDICT #8): the heaviest r9-new shape — 3-round synchronous
    # LPA over the pinned trade graph vs DuckDB's unrolled-CTE twin
    "q_label_prop",
    # r11 (r10 VERDICT #8): complete the graph family's round-over-round
    # cost tracking — the min-propagation CC fixpoint and the
    # degree-ordered triangle kernel (~1.5 s each at sf0.1)
    "q_connected_components",
    "q_triangle_count",
    # r11: weighted SSSP joins the tracked graph family (Bellman-Ford
    # fixpoint, 3 improving rounds at sf0.1 vs DuckDB's 12-round
    # MATERIALIZED-CTE unroll)
    "q_sssp",
    # r12 (r11 VERDICT #10): the lakehouse READ path measured, not
    # narrated — manifest-stats file skipping (the query's own
    # files_pruned_ok flag asserts pruning actually happened) and the
    # two merge-on-read legs (equality + positional deletes).  Each
    # builds its snapshot table in a tempdir per run, so the timing is
    # commit+read end-to-end at this SF.
    "q_stats_prune",
    "q_equality_delete",
    "q_positional_delete",
    # r12: the point-lookup half of file skipping (per-file bloom index
    # on a hash-scattered key; commit builds the index, read probes it)
    "q_bloom_prune",
    # r13: the external-format interop reads (each builds a REAL
    # Delta/Iceberg fixture table per run — commits, checkpoint/manifests,
    # log cleanup — so the number is write+replay+read end-to-end at this
    # SF, the q_positional_delete convention), the IVFADC ANN leg, and
    # the all-integer language-ID classifier (train + predict)
    "q_delta_read",
    "q_iceberg_read",
    "q_ann_ivfpq",
    "q_langid",
    # r14: the new interop legs (deletion-vector row-level deletes,
    # CDF-from-log-replay, the MOR-carrying Iceberg export — each a
    # fixture-build + read end-to-end, the r13 convention), the native
    # recursive CTE (SAME SQL text runs on DuckDB — the purest twin in
    # the set), and the VARIANT parse-once/extract-many shape
    "q_delta_dv",
    "q_delta_cdf",
    "q_iceberg_export",
    "q_recursive_cte",
    "q_variant",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("k2e-bench", cpus=cpus)
    queries = entrymod.queries()

    # Warm the JVM/session so the first measured query reflects steady
    # state (a long-lived cluster), not one-time init: codegen, the parquet
    # reader path, and the Python-UDF worker pool.
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.functions.gzip_udf import gunzip_text, gzip_bytes

    spark.range(8).select(
        gunzip_text(gzip_bytes(F.lit("warmup"))).alias("w")
    ).count()

    # Compile every headline query's codegen once against the smallest SF:
    # whole-stage codegen compilation is a one-time JVM cost that a
    # long-lived cluster amortizes across thousands of runs — timing it
    # into the first query would measure JIT, not the operator.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass

    # CONTROL floor, measured BEFORE and AFTER the timed window (round-5
    # noise guard): a single-partition 5-row scan through the identical
    # noop-write path.  Everything in it (driver round-trip, stage
    # scheduling, one task launch) is constant overhead that amortizes
    # away at 100x data.  The r4 bench silently absorbed ~1.3-2x
    # concurrent-load inflation; if the floor drifts >20% across the run,
    # the machine was not quiet and the result is flagged noisy=true.
    def _control_floor(n_runs: int = 7) -> float:
        ctl = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).coalesce(1)
        ctl.write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            ctl.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    def _control_floor_shuffle(n_runs: int = 3) -> float:
        """Two-stage control: the same 5-row scan through ONE shuffle
        (groupBy) — isolates the per-shuffle-stage scheduling constant
        that multi-stage queries pay once per Exchange.  Headline queries
        at this SF run 2-5 stages, so their absolute seconds should be
        read against k×(this floor), not the 1-stage floor."""
        ctl = (
            spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
            .groupBy("r_regionkey")
            .count()
        )
        ctl.write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            ctl.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    floor_shuffle = _control_floor_shuffle()

    # min of two timed runs: single-shot timings at this scale are
    # dominated by one-off effects (page-cache first touch, GC timing,
    # shuffle-service init for a new plan shape) — the min is the
    # steady-state cost a long-lived cluster sees, and is stable round
    # over round where a single sample can swing 2-3x.
    # r4: three headline names became invariant REDUCTIONS in the registry
    # (production operator + an exact-ground-truth verification twin).  The
    # headline keeps timing the PRODUCTION detail form — the identical
    # computation earlier rounds timed, so round-over-round numbers stay
    # like-for-like; the twin-carrying reduction is timed separately below
    # (reduction_query_sec) since its cost is what the correctness gate
    # pays, not what a production run pays.
    from kinesis2elastic_spark.operators import corpus as _corpus, llmops as _llmops

    production_override = {
        "q_minhash_near_dup": _llmops.minhash_near_dup_detail,
        "q_dedup_clusters": _llmops.dedup_clusters_detail,
        "q_ann_pq": _llmops.ann_pq_detail,
        # r6 (r5 VERDICT #4): the two decontam headliners decompose too —
        # production = the recurring probe against the PREBUILT (static,
        # amortized) benchmark artifacts; reduction = the registered query,
        # which additionally rebuilds the bench set and (bloom) recomputes
        # the exact-join twin the oracle verifies against
        "q_decontam": _corpus.decontam_probe_detail,
        "q_bloom_decontam": _corpus.bloom_decontam_probe_detail,
    }

    # ONE rep per pass (r13): the old 2-reps-inside-each-pass doubled the
    # pass wall, so the 3-pass protocol floor never fit any sane budget —
    # the merged MIN over >=3 single-rep passes is the same steady-state
    # statistic with better pass isolation.
    def _time_headliners() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in HEADLINE:
            fn = production_override.get(name) or queries[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t[name] = round(time.time() - t0, 3)
        return t

    # Auto-repeat + agreement band (r7 VERDICT #5, r8 redesign): single
    # Spark job walls on this box jitter 15-50% run to run and the ~30 ms
    # scheduling floor's min-of-7 wiggles 8-25% with no direction, so
    # neither can carry a 2% noise band.  The 49-query attempt TOTAL is
    # the stable statistic (sums average the jitter out; measured +-1.5%
    # between quiet passes) -- so: run at least TWO full timing passes,
    # keep going (up to SPARK_GRAFT_BENCH_ATTEMPTS, within a wall-clock
    # budget so the driver's bench window is never blown) until two
    # passes AGREE within 2%, report that closest-pair spread as the
    # drift band, and merge per-query minima (the steady-state cost).
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "4"))
    # r13 (r12 VERDICT #1): the 240 s budget cut the r12 run at TWO passes
    # — below the protocol's own >=3-attempt floor — and published a
    # noisy=true headline.  600 s fits three sf0.1 passes even on a
    # 2x-degraded host (the r11/r12 ambient-drift mode); the protocol now
    # also refuses to settle before three passes unless the budget is
    # genuinely blown.  Three passes protect BOTH statistics: the merged
    # per-query minima (steady-state wall) and the in-run spark/duckdb
    # ratio (a single slow pass inflates the numerator unopposed).
    retry_budget_s = float(
        os.environ.get("SPARK_GRAFT_BENCH_RETRY_BUDGET", "600")
    )
    min_attempts = 3
    bench_t0 = time.time()
    attempt_log: list[dict] = []
    timings: dict[str, float] = {}
    floors: list[float] = []

    def _pair_drift() -> float:
        totals = sorted(a["total_sec"] for a in attempt_log)
        if len(totals) < 2:
            return float("inf")
        return min(
            b / a - 1.0 for a, b in zip(totals, totals[1:]) if a > 0
        )

    for attempt in range(max_attempts):
        # release cross-pass state before measuring: drop Python refs so
        # the ContextCleaner can free checkpointed/cached blocks the
        # previous pass pinned (graph pin() + fixture localCheckpoints) —
        # a long-lived cluster's steady state, not any query's cost.
        # Without this, pass walls GREW monotonically at sf0.1 (134 ->
        # 162 -> 244 s in the r13 rehearsal) from GC pressure.
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        floors.append(_control_floor())
        t_pass = _time_headliners()
        attempt_log.append(
            {"total_sec": round(sum(t_pass.values()), 3)}
        )
        timings = (
            t_pass
            if not timings
            else {n: min(timings[n], t_pass[n]) for n in t_pass}
        )
        if time.time() - bench_t0 > retry_budget_s:
            break  # budget blown: stop regardless (noisy if <3 passes)
        if len(attempt_log) >= min_attempts and _pair_drift() <= 0.02:
            break

    # q_hll_merge decomposition: the headline form carries an exact-distinct
    # self-verification twin (the oracle contract); this times the
    # production sketch-only path so sketch cost and check cost are
    # separate numbers.
    from kinesis2elastic_spark.operators.relational import hll_merge_sketch_only

    hll_merge_sketch_only(spark, sf_dir).write.mode("overwrite").format("noop").save()
    hll_sketch_only = float("inf")
    for _ in range(2):
        t0 = time.time()
        hll_merge_sketch_only(spark, sf_dir).write.mode("overwrite").format("noop").save()
        hll_sketch_only = min(hll_sketch_only, time.time() - t0)

    # The registered twin-carrying reductions, timed once for transparency
    # (this is what tools/check_oracle.py pays per run; the headline above
    # times the production operator).
    reduction_query: dict[str, float] = {}
    for rname in production_override:
        t0 = time.time()
        queries[rname](spark, sf_dir).write.mode("overwrite").format("noop").save()
        reduction_query[rname] = round(time.time() - t0, 3)

    # DuckDB side: same parquet, same SQL the correctness gate trusts.
    import duckdb

    from kinesis2elastic_spark.catalog import TABLES

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck: dict[str, float] = {}
    ratio: dict[str, float] = {}
    # r4: these oracles are brute-force QUADRATIC verification twins of
    # sub-quadratic Spark operators (invariant reductions) — timing DuckDB's
    # O(n²) join against Spark's prefix-filtered/banded path would inflate
    # the ratio in Spark's favor without measuring comparable work, so they
    # are excluded from the DuckDB baseline (Spark timings still recorded).
    duck_skip = {"q_minhash_near_dup", "q_dedup_clusters"}
    for name in HEADLINE:
        sql = oracles.get(name)
        if not sql or name in duck_skip:
            continue
        try:
            con.execute(sql).fetchall()  # warm (catalog/IO) pass
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            duck[name] = round(best, 3)
        except Exception:
            continue
        if duck[name] > 0:
            ratio[name] = round(timings[name] / duck[name], 2)

    # close the noise-guard window: one more floor sample after the
    # in-process DuckDB pass, folded into the overall floor minimum;
    # drift/noisy are the QUIETEST Spark attempt's (the merged minima
    # were taken under at-least-that-quiet conditions)
    floors.append(_control_floor())
    floor = min(floors)
    floor_drift = _pair_drift()
    # fewer than two full passes (SPARK_GRAFT_BENCH_ATTEMPTS=1, or the
    # retry budget expired mid-first-pass): the agreement band never ran,
    # so the result is UNVALIDATED — flag noisy rather than silently
    # reporting drift 0% (r8 ADVICE)
    unvalidated = floor_drift == float("inf")
    if unvalidated:
        floor_drift = 0.0
    # >5% disagreement between the two CLOSEST full passes = loaded
    # machine (r11 VERDICT #1 tightened this from 10%); a single-pass run
    # is noisy by definition (no band).  A noisy total must NOT be read as
    # a round-over-round regression signal — BENCH_DETAIL carries the
    # per-attempt totals so the drift is auditable.
    # r13: the protocol's own floor — fewer than three full passes is a
    # sub-protocol run and must self-flag even if the 2-pass pair agrees
    noisy = unvalidated or floor_drift > 0.05 or len(attempt_log) < 3

    ratios = sorted(ratio.values())
    median = ratios[len(ratios) // 2] if ratios else None
    # the same per-query ratios with the fixed scheduling floor removed
    # from the Spark side — the constant that amortizes away on a real
    # cluster run (many-second queries), leaving the plan cost
    net_ratio = {
        n: round(max(timings[n] - floor, 0.0) / duck[n], 2)
        for n in ratio
        if duck[n] > 0
    }
    net_sorted = sorted(net_ratio.values())
    net_median = net_sorted[len(net_sorted) // 2] if net_sorted else None

    # The driver captures only the LAST ~2000 chars of stdout and parses
    # the final JSON line from it (BENCH_r03 was recorded with
    # parsed=null because the full per-query duckdb/ratio maps pushed the
    # line past the buffer and truncated its head).  So: the stdout line
    # carries the contract fields + scalar summaries and stays compact;
    # the full decomposition goes to BENCH_DETAIL.json at the repo root.
    detail = {
        "sf": sf,
        "duckdb": duck,
        "ratio_spark_over_duckdb": ratio,
        "ratio_net_of_floor": net_ratio,
        # cost of the r4 twin-carrying reduction queries (what the
        # correctness gate pays; headline times the production operator)
        "reduction_query_sec": reduction_query,
        # explicit twin-vs-production decomposition for the reduction-heavy
        # headliners (r5 VERDICT #6): production_sec is the operator a real
        # pipeline pays for; reduction_sec additionally recomputes the
        # exact ground truth the oracle contract verifies against
        "twin_decomposition": {
            rname: {
                "production_sec": timings[rname],
                "reduction_sec": reduction_query[rname],
            }
            for rname in reduction_query
        },
        "bench_attempts": attempt_log,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )

    out = {
        "metric": "sec total over headline query set (noop-write materialization)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # scalar summaries of the DuckDB same-SQL baseline (full per-query
        # maps in BENCH_DETAIL.json); floor = fixed per-query overhead at
        # this scale (1-task scan through the same noop-write path) —
        # ratios should be read net of it, it amortizes away at cluster
        # scale while DuckDB's per-row cost does not
        "duckdb_total_sec": round(sum(duck.values()), 3),
        "duckdb_n_queries": len(duck),
        # THE drift-immune headline statistic (r12 VERDICT #1, SCALING
        # addendum 18): both engines ran in the same process window on the
        # same box, so host-speed drift cancels in the quotient — compare
        # THIS round over round, not the raw wall (the spark total over
        # the subset of headline queries DuckDB also timed)
        "spark_over_duckdb_total": (
            round(
                sum(timings[n] for n in duck) / sum(duck.values()), 3
            )
            if duck and sum(duck.values()) > 0
            else None
        ),
        "ratio_median": median,
        "control_floor_sec": round(floor, 3),
        "control_floor_shuffle_sec": round(floor_shuffle, 3),
        "floor_drift_pct": (
            None if unvalidated else round(floor_drift * 100, 1)
        ),
        "noisy": noisy,
        "bench_attempts": len(attempt_log),
        "ratio_median_net_of_floor": net_median,
        "hll_merge_sketch_only_sec": round(hll_sketch_only, 3),
        "detail": "BENCH_DETAIL.json",
    }
    # stay inside the driver's ~2000-char stdout tail: shrink the queries
    # map iteratively (keeping the slowest) and finally drop it — the full
    # map is always in BENCH_DETAIL.json
    detail["queries_sec"] = timings
    line = json.dumps(out)
    for keep in (30, 15, 8, 0):
        if len(line) <= 1900:
            break
        if keep:
            out["queries"] = dict(
                sorted(timings.items(), key=lambda kv: -kv[1])[:keep]
            )
            out["queries_truncated_to_slowest"] = keep
        else:
            out.pop("queries", None)
            out["queries_truncated_to_slowest"] = 0
        line = json.dumps(out)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(line)


if __name__ == "__main__":
    main()
