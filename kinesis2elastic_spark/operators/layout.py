"""Data-layout maintenance: small-file compaction and partitioned+sorted
(clustered) writes.

The two chronic operational problems of a 100 TB parquet lake:

- **Small files.**  Streaming micro-batches and over-parallel writers
  produce thousands of KB-sized files per partition; every later scan
  then pays per-file open/footer costs and the driver pays listing costs.
  ``compact_parquet`` rewrites a directory into ~``target_mb`` files,
  sized from the ACTUAL byte size on disk, not a guessed partition count.
  ``compact_table`` is the plan-driven form (B135 execution leg): bins
  from the greedy manifest rule of ``tableops.q_compaction_plan``, one
  bin-scoped rewrite job per bin reading exactly that bin's files.
- **Unclustered data.**  ``write_partitioned_sorted`` writes
  ``partitionBy(date-ish)`` for partition pruning plus
  ``sortWithinPartitions(key)`` so min/max footer stats make point/range
  predicates on ``key`` skip row groups — the poor man's Z-order, and the
  right default for time-partitioned fact tables.

Both are pure write-path helpers (no queries() entry — their observable
contract is the resulting file layout, asserted in
``tests/test_layout.py``).  Complements ``bucketing.py`` (join
co-location) and ``streaming/rollup.py`` (incremental materialization).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RANGE_SAMPLE_KEY = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
# Driver-side budget for RangePartitioner boundary estimation, in sampled
# KEYS (the sketch ships one clustering key per sample to the driver —
# ~16 MB of longs at the cap), scale-capped so a million-partition input
# cannot blow up the driver while small inputs get effectively-exact
# boundaries.
_RANGE_SAMPLE_BUDGET = 2_000_000
_RANGE_SAMPLE_MAX_PER_PART = 20_000


@contextmanager
def accurate_range_sampling(df: DataFrame):
    """Clustered writes put file min/max stats where RangePartitioner
    boundaries land.  The default sketch (100 samples per input
    partition) has O(n_rows/sqrt(n_samples)) boundary RANK error, so
    rows leak across the intended per-file ranges and widen footer
    stats — measured on the 4096-row zorder fixture: a selective
    predicate keeps 4/4 files under the default (pruning lost, and
    flaky — the sketch seed varies with RDD id) vs 3/4 and 2/4 with
    accurate boundaries.  Raise the per-partition sample size for the
    duration of a clustered write, capped by a fixed driver sample
    budget so the cost stays bounded at any scale.  Boundary placement
    is a write-side layout concern only: reads stay exact either way
    (stats pruning always keeps a residual filter)."""
    spark = df.sparkSession
    n_parts = max(1, df.rdd.getNumPartitions())
    size = max(
        100, min(_RANGE_SAMPLE_MAX_PER_PART, _RANGE_SAMPLE_BUDGET // n_parts)
    )
    try:
        old = spark.conf.get(_RANGE_SAMPLE_KEY)
    except Exception:
        old = None
    spark.conf.set(_RANGE_SAMPLE_KEY, str(size))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_RANGE_SAMPLE_KEY)
        else:
            spark.conf.set(_RANGE_SAMPLE_KEY, old)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_files(path: str) -> list[str]:
    """Data files (not _SUCCESS/metadata) under a parquet output dir."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_mb: int = 128
) -> int:
    """Rewrite ``src`` into ``dst`` as ceil(bytes / target_mb) files and
    return that file count.

    Scale shape: one coalesce-style repartition — no keys, no sort — so
    the only cost is the rewrite itself.  File count derives from real
    on-disk bytes; at cluster scale the same arithmetic comes from the
    filesystem listing the driver already holds.  Production would gate
    this on a small-file-ratio threshold and run per partition; the
    per-directory primitive is the same."""
    n_bytes = _dir_bytes(src)
    n_files = max(1, -(-n_bytes // (target_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


def plan_compaction_bins(
    files: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """Greedy cumulative-size binning over a (path, bytes) manifest —
    the SAME deterministic rule as ``tableops.q_compaction_plan`` (bin =
    cumulative bytes BEFORE the file, integer-divided by the target),
    applied to real files: files ordered by path, each bin a consecutive
    run totaling ~``target_bytes``.

    Pure driver-side metadata arithmetic: the manifest is one row per
    file (~10⁶ rows per partition at 100 TB with 128 MB files — the
    listing the driver already holds; an ACID format reads it from the
    snapshot manifest instead of the filesystem)."""
    bins: list[list[str]] = []
    cum = 0
    for path, n_bytes in sorted(files):
        b = cum // target_bytes
        while len(bins) <= b:
            bins.append([])
        bins[b].append(path)
        cum += n_bytes
    return [b for b in bins if b]


def compact_table(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[list[str]]:
    """Execute a compaction plan (the OPTIMIZE-job shape a 100 TB
    streaming table actually runs — closes the B135 loop: the planner
    emits rewrite bins, this rewrites them): plan bins over ``src``'s
    file manifest with ``plan_compaction_bins``, then rewrite EXACTLY
    each planned bin into one output file under ``dst/bin=N``.

    Plan-driven file pruning: each rewrite job reads only its bin's
    files (explicit path list to ``spark.read.parquet`` — never a scan
    of the whole table), writes one file (the bin IS the target size by
    construction), and is independent of every other bin — at cluster
    scale the bins submit concurrently as separate jobs and a failed bin
    retries alone, which is exactly why OPTIMIZE jobs are bin-scoped.
    Rewrite cost = the planned bytes, touched once (read + write); no
    shuffle — the coalesce(1) is a narrow dependency over the bin's
    files.

    Returns the executed plan (list of bins, each a list of source file
    paths) so the caller can assert layout or commit a manifest swap.
    Before/after layout + content equality asserted in
    tests/test_layout.py."""
    manifest = [(p, os.path.getsize(p)) for p in parquet_files(src)]
    bins = plan_compaction_bins(manifest, target_bytes)
    for i, bin_files in enumerate(bins):
        (
            spark.read.parquet(*bin_files)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"bin={i}"))
        )
    return bins


def zorder_value(col_a, col_b, a_min, a_max, b_min, b_max, bits: int = 16):
    """Z-order (Morton) curve value for two columns: each column is
    min/max-scaled to a ``bits``-bit integer and the bits interleaved —
    rows close on the curve are close in BOTH dimensions, so clustering
    by z gives row-group/file skipping on either column.

    Pure Catalyst arithmetic (2·bits shift/mask/add terms inside one
    whole-stage-codegen projection); the min/max come from one aggregate
    the caller broadcasts as literals.  This is the standard lakehouse
    OPTIMIZE ZORDER BY technique, minus the table format."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1

    def scaled(c, lo, hi):
        span = F.when(F.lit(hi - lo) > 0, F.lit(float(hi - lo))).otherwise(F.lit(1.0))
        frac = (c.cast("double") - F.lit(float(lo))) / span
        return F.least(F.lit(top), F.greatest(F.lit(0), F.floor(frac * top))).cast("long")

    a, b = scaled(col_a, a_min, a_max), scaled(col_b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame, dst: str, col_a: str, col_b: str, n_files: int = 16, bits: int = 16
) -> None:
    """Z-order clustered write: range-partition and sort by the Morton
    value of (col_a, col_b), so min/max footer stats are tight for BOTH
    columns and a selective predicate on either one skips most files —
    where a single-column sort only ever skips for its own column.

    Scale shape: one bounded min/max aggregate (4 scalars to the driver),
    one codegen projection for z, one range shuffle into ``n_files``
    write tasks.  repartitionByRange gives GLOBAL z-clustering (files own
    disjoint z-ranges), sortWithinPartitions tightens row groups inside
    each file."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_a).alias("a_min"),
        F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"),
        F.max(col_b).alias("b_max"),
    ).first()
    if any(v is None for v in (stats.a_min, stats.a_max, stats.b_min, stats.b_max)):
        # empty input (or an all-NULL cluster column): no curve to build —
        # write as-is rather than crash in the literal arithmetic below
        df.write.mode("overwrite").parquet(dst)
        return
    z = zorder_value(
        F.col(col_a), F.col(col_b),
        stats.a_min, stats.a_max, stats.b_min, stats.b_max, bits=bits,
    )
    with accurate_range_sampling(df):
        (
            df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(dst)
        )


def write_partitioned_sorted(
    df: DataFrame, dst: str, partition_col: str, sort_col: str
) -> None:
    """Clustered write: hive-style ``partitionBy(partition_col)`` for
    partition pruning + ``sortWithinPartitions(sort_col)`` so parquet
    row-group min/max stats cover ``sort_col`` ranges tightly and
    selective scans skip row groups.  ``repartition(partition_col)``
    first, so each hive partition is written by one task (one file, no
    small-file spray from every task touching every partition).

    The sort is (partition_col, sort_col), not sort_col alone: the file
    writer requires rows grouped by the partition column and inserts its
    OWN sort on it when the incoming order doesn't already satisfy that —
    a sort that does not preserve the secondary order.  Leading with the
    partition column makes the writer's requirement already-met, so the
    sort_col clustering survives into the files."""
    (
        df.repartition(partition_col)
        .sortWithinPartitions(partition_col, sort_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst)
    )


def write_training_shards(
    df: DataFrame, dst: str, key_col: str, n_shards: int | None = None
) -> None:
    """Materialize the deterministic training-shard layout whose
    accounting is ``corpus.q_shard_manifest``: every row goes to shard
    ``corpus.shard_id_col(key)`` (md5-keyspace mod — the reproducible
    "global shuffle" of a training-data run), one hive directory per
    shard, rows inside each shard sorted by key so the files are
    byte-reproducible across runs.

    Scale shape: ONE shuffle, keyed by shard_id — the shuffle a training
    run needs anyway to decorrelate document order; md5 uniformity keeps
    shards balanced without salting.  ``repartition(n, shard_id)`` makes
    each shard the property of exactly one task (one file per shard, no
    small-file spray); at 100 TB, n_shards comes from
    total_bytes / target_shard_bytes and the same plan holds.  A
    training job consumes the manifest (exact token counts per shard)
    for deterministic data-order resume without opening files.

    A ``_manifest`` parquet (per-shard row count + key range, computed
    from the same materialized assignment) is written next to the shard
    dirs so a consumer schedules reads without listing or opening shard
    files; read it back with ``read_shard_manifest``.  The assignment is
    localCheckpoint-ed (eager) before the two writes — they are separate
    jobs, and without pinning, any nondeterminism upstream (sample/rand
    rows) could make the manifest disagree with the shards actually
    written (the streaming twin ``shard_stream_batch`` pins for the same
    reason)."""
    from .corpus import N_SHARDS, shard_id_col

    n = n_shards or N_SHARDS
    assigned = df.withColumn(
        "shard_id", shard_id_col(F.col(key_col), n)
    ).localCheckpoint(eager=True)
    (
        assigned.repartition(n, "shard_id")
        .sortWithinPartitions("shard_id", key_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(dst)
    )
    (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "_manifest"))
    )


def read_shard_manifest(spark: SparkSession, dst: str) -> DataFrame:
    """The ``_manifest`` side table of ``write_training_shards`` (the
    underscore prefix makes parquet readers of ``dst`` skip it, like
    ``_SUCCESS``)."""
    return spark.read.parquet(os.path.join(dst, "_manifest"))
