"""Batch-equivalence reductions for the streaming legs (round-5 VERDICT #3).

The streaming components (B87's ``dedup_stream``, B91's ``shard_stream``,
B74's continuous distinct rollup) were pytest-only; the survey's test
strategy (SURVEY.md §5.3) also permits BATCH-EQUIVALENT oracle checks: run
the foreachBatch pipeline under ``trigger(availableNow)`` inside a query
function, then reduce the materialized streaming state against its batch
twin and emit oracle-recomputable exact columns + equivalence flags.  That
turns each streaming leg into a driver hash row.

Each query:

1. writes the source table split into two micro-batches of parquet under a
   fresh tempdir (write batch → drain → write batch → drain, the same
   ordering discipline as the pytest suite — ``availableNow`` would
   otherwise fold both into one batch);
2. runs the REAL streaming pipeline (writeStream.foreachBatch + checkpoint,
   not a hand-called batch body) to completion;
3. reads the persisted streaming state back and compares it EXACTLY
   (same-engine, so even rounded doubles are bit-identical) against the
   registered batch operator on the same split;
4. returns a reduction whose data columns DuckDB recomputes from the raw
   table and whose flags assert the equivalence — localCheckpoint-ed so the
   result outlives the tempdir.

Scale note: the equivalence harness is test-scale by design (it drains a
bounded stream); the OPERATORS it exercises are the production paths whose
scale shapes are documented in their own modules.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

_DRAIN_TIMEOUT_MS = 300_000


def _drain(query) -> None:
    query.awaitTermination(_DRAIN_TIMEOUT_MS // 1000)
    if query.isActive:  # pragma: no cover - only on a hung stream
        query.stop()
        raise TimeoutError("streaming drain did not complete")


def _two_batch_source(df: DataFrame, split_col: str, src: str) -> None:
    """Write ``df`` as two parquet sub-dirs keyed by ``split_col`` parity.
    Only b1 is written here; b2 via ``_write_second_batch`` after the first
    drain (file-stream batch boundaries follow file arrival order)."""
    os.makedirs(src, exist_ok=True)
    df.filter((F.col(split_col) % 2) == 0).coalesce(1).write.parquet(src + "/b1")


def _write_second_batch(df: DataFrame, split_col: str, src: str) -> None:
    df.filter((F.col(split_col) % 2) == 1).coalesce(1).write.parquet(src + "/b2")


def q_stream_shard_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B91 streaming form, oracle-backed: documents arrive in two
    micro-batches through ``incremental_shard_stream`` (foreachBatch,
    availableNow, per-batch dynamic partition overwrite); the rolled-up
    streaming manifest must equal BOTH the deterministic per-shard
    accounting DuckDB recomputes from the raw table (hashed columns) and
    the batch writer's manifest on the same data (flag).

    Columns: the md5-keyspace shard assignment is engine-portable
    (``corpus.shard_id_col``), so shard_id / n_docs / min / max are exact
    and fully oracle-recomputable — the streaming state itself is under
    the hash gate, not just a boolean about it."""
    from ..operators.corpus import shard_id_col
    from ..streaming.shard_stream import (
        incremental_shard_stream,
        read_stream_manifest,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="k2e_stream_shard_")
    try:
        src, dst = os.path.join(work, "src"), os.path.join(work, "dst")

        def start():
            return incremental_shard_stream(
                spark,
                spark.readStream.schema("doc_id long, text string").parquet(
                    src + "/*"
                ),
                dst,
            )

        _two_batch_source(docs, "doc_id", src)
        _drain(start())
        _write_second_batch(docs, "doc_id", src)
        _drain(start())

        stream_m = read_stream_manifest(spark, dst).select(
            "shard_id",
            F.col("n_rows").alias("n_docs"),
            F.col("min_key").alias("min_doc_id"),
            F.col("max_key").alias("max_doc_id"),
        )
        batch_m = (
            docs.select(shard_id_col(F.col("doc_id")), "doc_id")
            .groupBy("shard_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
            )
        )
        sym_diff = stream_m.exceptAll(batch_m).unionAll(batch_m.exceptAll(stream_m))
        equiv = sym_diff.agg((F.count("*") == 0).alias("ok"))
        out = (
            stream_m.crossJoin(F.broadcast(equiv))
            .select(
                "shard_id",
                "n_docs",
                "min_doc_id",
                "max_doc_id",
                F.col("ok").alias("stream_equals_batch_ok"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_stream_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B87 streaming form, oracle-backed: the two-batch drain of
    ``incremental_dedup_stream`` (even doc_ids arrive first and build the
    band index; odd doc_ids arrive second and dedup against it) must
    produce EXACTLY the verified cross-pair set of the batch operator
    ``minhash_incremental_detail`` on the same even/odd split — same
    banding, same hot-bucket guard, same exact-verify, same engine (so
    the rounded jaccard column is bit-identical and the comparison is on
    full rows, not counts).

    Hashed columns follow the q_minhash_incremental reduction: exact
    batch/index populations and the exact cross-parity ≥9/10-Jaccard pair
    count (all DuckDB-recomputable), the ≥90% recall floor of the STREAM
    pairs against that set, plus the stream≡batch flag."""
    from ..operators.llmops import (
        MINHASH_HI_DEN,
        MINHASH_HI_NUM,
        _docs_parallel,
        _shingles,
        exact_set_pairs,
        minhash_incremental_detail,
    )
    from ..streaming.dedup_stream import incremental_dedup_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="k2e_stream_dedup_")
    try:
        src, state = os.path.join(work, "src"), os.path.join(work, "state")

        def start():
            return incremental_dedup_stream(
                spark,
                spark.readStream.schema("doc_id long, text string").parquet(
                    src + "/*"
                ),
                state,
            )

        _two_batch_source(docs, "doc_id", src)
        _drain(start())
        _write_second_batch(docs, "doc_id", src)
        _drain(start())

        pairs_path = os.path.join(state, "pairs")
        if os.path.isdir(pairs_path):
            stream_pairs = spark.read.parquet(pairs_path).select(
                "doc_new", "doc_old", "jaccard"
            )
        else:  # no candidates at all in batch 2
            stream_pairs = spark.createDataFrame(
                [], "doc_new long, doc_old long, jaccard double"
            )
        stream_pairs = stream_pairs.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    batch_pairs = minhash_incremental_detail(spark, sf_dir).localCheckpoint(
        eager=True
    )
    sym_diff = stream_pairs.exceptAll(batch_pairs).unionAll(
        batch_pairs.exceptAll(stream_pairs)
    )
    equiv = sym_diff.agg((F.count("*") == 0).alias("stream_equals_batch_ok"))

    d = _docs_parallel(spark, sf_dir)
    sets = d.select("doc_id", _shingles(F.col("text")).alias("words"))
    cross_hi = (
        exact_set_pairs(sets, MINHASH_HI_NUM, MINHASH_HI_DEN)
        .filter((F.col("doc_a") % 2) != (F.col("doc_b") % 2))
        .localCheckpoint(eager=True)
    )
    caught = stream_pairs.select(
        F.least("doc_new", "doc_old").alias("doc_a"),
        F.greatest("doc_new", "doc_old").alias("doc_b"),
    )
    caught_hi = cross_hi.join(caught, ["doc_a", "doc_b"], "left_semi")
    pops = d.agg(
        F.sum(((F.col("doc_id") % 2) == 1).cast("long")).alias("n_new"),
        F.sum(((F.col("doc_id") % 2) == 0).cast("long")).alias("n_old"),
    )
    n_hi = cross_hi.agg(F.count("*").cast("long").alias("n_exact_cross_hi_pairs"))
    n_caught = caught_hi.agg(F.count("*").alias("_nc"))
    return (
        pops.crossJoin(n_hi)
        .crossJoin(n_caught)
        .crossJoin(F.broadcast(equiv))
        .select(
            "n_new",
            "n_old",
            "n_exact_cross_hi_pairs",
            (
                (F.col("n_exact_cross_hi_pairs") == 0)
                | (F.col("_nc") * 10 >= F.col("n_exact_cross_hi_pairs") * 9)
            ).alias("stream_recall_hi_ok"),
            "stream_equals_batch_ok",
        )
    )


def q_stream_rollup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B74 continuous distinct rollup, oracle-backed: events arrive in two
    micro-batches (event_id parity, so the SECOND batch re-touches every
    hour bucket — the late-data path where a frozen count would be wrong
    and mergeable sketches are the point); the materialized HLL state is
    then compared per (bucket, event_type) against the exact distinct
    count.  Hashed columns are the exact counts DuckDB recomputes; the
    sketch estimate itself is engine-local, so it ships as the ±5%
    accuracy flag (HLL at default lgConfigK ≈ 1.6% rse) — the
    q_hll_merge est_ok discipline applied to streaming state."""
    from ..streaming.rollup import (
        continuous_distinct_rollup_writer,
        read_distinct_rollup,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    work = tempfile.mkdtemp(prefix="k2e_stream_rollup_")
    try:
        src, state = os.path.join(work, "src"), os.path.join(work, "state")

        def start():
            return (
                spark.readStream.schema(
                    "event_id long, user_id long, ts timestamp, event_type string"
                )
                .parquet(src + "/*")
                .writeStream.foreachBatch(continuous_distinct_rollup_writer(spark, state))
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )

        _two_batch_source(ev, "event_id", src)
        _drain(start())
        _write_second_batch(ev, "event_id", src)
        _drain(start())

        est = read_distinct_rollup(spark, state).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    exact = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.countDistinct("user_id").cast("long").alias("n_users_exact"))
    j = exact.join(est, ["bucket", "event_type"], "left")
    return j.select(
        "bucket",
        "event_type",
        "n_users_exact",
        (
            F.col("n_users_est").isNotNull()
            & (
                F.abs(F.col("n_users_est") - F.col("n_users_exact"))
                * 100
                <= F.col("n_users_exact") * 5
            )
        ).alias("est_within_5pct_ok"),
    )


QUERIES = {
    "q_stream_shard_equiv": q_stream_shard_equiv,
    "q_stream_dedup_equiv": q_stream_dedup_equiv,
    "q_stream_rollup_equiv": q_stream_rollup_equiv,
}


def _shard_manifest_sql() -> str:
    from ..operators.corpus import N_SHARDS

    return f"""
        WITH s AS (
          SELECT doc_id,
                 ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                   % {N_SHARDS} AS shard_id
          FROM documents)
        SELECT CAST(shard_id AS BIGINT) AS shard_id,
               count(*) AS n_docs,
               min(doc_id) AS min_doc_id,
               max(doc_id) AS max_doc_id,
               TRUE AS stream_equals_batch_ok
        FROM s GROUP BY shard_id
    """


ORACLE = {
    "q_stream_shard_equiv": _shard_manifest_sql(),
    # identical exact-ground-truth shape as ORACLE["q_minhash_incremental"]
    # (the batch twin), with the streaming flags constant-true
    "q_stream_dedup_equiv": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        sh AS (SELECT doc_id,
                 CASE WHEN len(words) >= 3
                      THEN list_distinct(list_transform(range(1, len(words) - 1),
                             i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                      ELSE [array_to_string(words, ' ')] END AS sh
               FROM w),
        hi AS (SELECT 1 AS x FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE (a.doc_id % 2) <> (b.doc_id % 2)
                 AND len(list_intersect(a.sh, b.sh)) * 10
                     >= len(list_distinct(list_concat(a.sh, b.sh))) * 9)
        SELECT (SELECT count(*) FROM documents WHERE doc_id % 2 = 1) AS n_new,
               (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS n_old,
               CAST((SELECT count(*) FROM hi) AS BIGINT) AS n_exact_cross_hi_pairs,
               TRUE AS stream_recall_hi_ok,
               TRUE AS stream_equals_batch_ok
    """,
    "q_stream_rollup_equiv": """
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
               TRUE AS est_within_5pct_ok
        FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
}
