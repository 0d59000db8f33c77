"""Data-layout maintenance: compaction file-count contract, clustered
write pruning + row-group stats layout."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.operators import layout


def test_compact_collapses_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    e = load(spark, sf_dir, "events")
    e.repartition(64).write.parquet(src)  # simulate micro-batch spray
    assert len(layout.parquet_files(src)) == 64
    n = layout.compact_parquet(spark, src, dst, target_mb=128)
    assert len(layout.parquet_files(dst)) == n == 1  # sf data << 128 MB
    assert spark.read.parquet(dst).count() == e.count()


def test_partitioned_sorted_layout(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "clustered")
    e = (
        load(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts").cast("string"))
    )
    layout.write_partitioned_sorted(e, dst, "d", "user_id")
    # hive layout: one dir per day, one data file per partition
    files = layout.parquet_files(dst)
    days = {f.split("d=")[1].split("/")[0] for f in files}
    assert days == {r.d for r in e.select("d").distinct().collect()}
    per_dir = {}
    for f in files:
        per_dir.setdefault(f.rsplit("/", 1)[0], []).append(f)
    assert all(len(v) == 1 for v in per_dir.values())
    # partition pruning: a day filter scans one partition only
    one_day = sorted(days)[0]
    pruned = spark.read.parquet(dst).filter(F.col("d") == one_day)
    from kinesis2elastic_spark.plans.explain import formatted_plan

    assert "PartitionFilters: [isnotnull(d" in formatted_plan(pruned)
    # within a file, user_id is sorted (row-group stats are tight)
    import pyarrow.parquet as pq

    col = pq.read_table(per_dir[sorted(per_dir)[0]][0], columns=["user_id"])[
        "user_id"
    ].to_pylist()
    assert col == sorted(col)
    assert spark.read.parquet(dst).count() == e.count()


def test_zorder_skips_both_columns(spark, sf_dir, tmp_path):
    """File-level min/max spans: a user_id-sorted layout is tight on
    user_id but each file spans ~the full value range (no skipping on
    value); the z-ordered layout must be substantially tight on BOTH
    columns — the whole point of multi-column clustering."""
    import pyarrow.parquet as pq

    from kinesis2elastic_spark.catalog import load
    from kinesis2elastic_spark.operators.layout import (
        parquet_files,
        write_partitioned_sorted,
        write_zordered,
    )

    e = load(spark, sf_dir, "events").select("user_id", "value", "event_id")
    zdst = str(tmp_path / "zorder")
    sdst = str(tmp_path / "sorted")
    write_zordered(e, zdst, "user_id", "value", n_files=16)
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdst)
    )

    def mean_span(path, col):
        lo = hi = None
        spans = []
        per_file = []
        for f in parquet_files(path):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            per_file.append((fmin, fmax))
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        total = (hi - lo) or 1
        return sum((b - a) / total for a, b in per_file) / len(per_file)

    z_user, z_value = mean_span(zdst, "user_id"), mean_span(zdst, "value")
    s_user, s_value = mean_span(sdst, "user_id"), mean_span(sdst, "value")
    assert s_user < 0.25            # single-column sort: tight on its column
    assert s_value > 0.5            # ...and near-useless for the other
    assert z_user < 0.6 and z_value < 0.6   # z-order: tight on BOTH
    assert z_value < 0.75 * s_value  # and strictly better than the sort on value


def test_training_shards_match_manifest(spark, sf_dir, tmp_path):
    """write_training_shards must materialize EXACTLY the layout that
    q_shard_manifest accounts for: one hive dir + one file per shard,
    per-shard recomputed stats equal to the manifest rows, shards
    partitioning the corpus, and key-sorted rows inside each file."""
    from kinesis2elastic_spark.operators.corpus import N_SHARDS, q_shard_manifest

    docs = load(spark, sf_dir, "documents")
    dst = str(tmp_path / "shards")
    layout.write_training_shards(docs, dst, key_col="doc_id")

    manifest = {r.shard_id: r for r in q_shard_manifest(spark, sf_dir).collect()}
    assert set(manifest) == set(range(N_SHARDS))

    back = spark.read.parquet(dst)
    got = {
        r.shard_id: r
        for r in back.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            F.sum(F.length("text")).alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .collect()
    }
    assert set(got) == set(manifest)
    for sid, m in manifest.items():
        g = got[sid]
        assert (g.n_docs, g.n_tokens, g.n_chars, g.min_doc_id, g.max_doc_id) == (
            m.n_docs, m.n_tokens, m.n_chars, m.min_doc_id, m.max_doc_id
        )

    # partition property: no doc lost or duplicated across shards
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    # persisted _manifest side table agrees with the in-query manifest
    pm = {r.shard_id: r for r in layout.read_shard_manifest(spark, dst).collect()}
    assert set(pm) == set(manifest)
    for sid, m in manifest.items():
        assert (pm[sid].n_rows, pm[sid].min_key, pm[sid].max_key) == (
            m.n_docs, m.min_doc_id, m.max_doc_id
        )

    # layout property: one file per shard, rows inside sorted by key
    files = [f for f in layout.parquet_files(dst) if "_manifest" not in f]
    assert len(files) == N_SHARDS
    import pyarrow.parquet as pq

    for f in files:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)


def test_compact_table_executes_planned_bins(spark, sf_dir, tmp_path):
    """B135 execution leg: the bin rewrite must (a) produce exactly one
    file per planned bin, (b) fill bins to ~target (every bin but the
    last >= target once its last file lands, since the greedy rule only
    opens bin b+1 after cumulative bytes cross the target), and (c)
    preserve content row-for-row."""
    import os

    import pyarrow.parquet as pq

    src = str(tmp_path / "spray")
    dst = str(tmp_path / "optimized")
    e = load(spark, sf_dir, "events")
    e.repartition(24).write.parquet(src)  # micro-batch small-file spray
    files = [(p, os.path.getsize(p)) for p in layout.parquet_files(src)]
    total = sum(b for _, b in files)
    target = total // 4  # expect ~4-5 bins
    bins = layout.compact_table(spark, src, dst, target_bytes=target)
    # the executed plan equals the pure-metadata plan
    assert bins == layout.plan_compaction_bins(files, target)
    # every src file lands in exactly one bin
    flat = [p for b in bins for p in b]
    assert sorted(flat) == sorted(p for p, _ in files)
    # one output file per bin
    out_files = layout.parquet_files(dst)
    per_bin = {}
    for f in out_files:
        per_bin.setdefault(f.split("bin=")[1].split("/")[0], []).append(f)
    assert len(per_bin) == len(bins)
    assert all(len(v) == 1 for v in per_bin.values())
    # bin fill: planned bytes per bin reach the target for all but the last
    sizes = dict(files)
    planned = [sum(sizes[p] for p in b) for b in bins]
    assert all(x >= target for x in planned[:-1])
    # per-bin row counts match the bin's source files (plan-driven pruning
    # read exactly the right files)
    for i, b in enumerate(bins):
        want = sum(pq.read_metadata(p).num_rows for p in b)
        got = pq.read_metadata(per_bin[str(i)][0]).num_rows
        assert got == want
    # row-for-row content equality
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst).select(a.columns)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
