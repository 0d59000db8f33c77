"""External lakehouse-format interop queries (B190 Delta, B191 Iceberg).

The repo's own snapshot protocol (operators/timetravel.py) covers
tables THIS engine writes; a real 100 TB deployment must also READ
tables that arrive in the open formats.  The parsers live in
``sources/delta_log.py`` (Delta ``_delta_log`` replay) and
``sources/iceberg_meta.py`` (Iceberg ``metadata.json``); this module
holds the driver-contract queries that prove them against DuckDB.

Each query generator-builds a REAL fixture table (multi-commit,
partitioned, checkpointed, log-cleaned) from the driver's own parquet
— no vendored data — then reads it back through the interop path and
aggregates; the oracle restates the surviving row set from the raw
table.  Cite: reference repo (Go relay, Moulick/kinesis2elastic
main.go) has no table format at all; this is the extension surface a
lakehouse user hits first (r12 VERDICT items 2 and 7).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..sources import delta_log as dl


def _status_agg(df: DataFrame, leg: str) -> DataFrame:
    return df.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    ).select(F.lit(leg).alias("leg"), "*")


def q_delta_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B190 contract query: build a real Delta table from orders —
    v0 append (o_orderkey%3==0, partitioned by o_orderstatus),
    v1 append (%3==1), v2 remove the status='O' files (file-level
    delete), v3 append (%3==2), checkpoint at v3, EXPIRE the
    pre-checkpoint json commits (so the read MUST replay through the
    checkpoint parquet), v4 append (%3==1 AND status='O' back) — then
    read latest and AS OF v1 through the interop reader.

    Latest live set = all orders EXCEPT (%3==0 AND status='O'):
    the v2 remove dropped status-O files from both the %3==0 and %3==1
    commits, and v4 re-inserted only the %3==1 slice.  As-of v1 =
    %3 <= 1, all statuses (time travel sees the pre-remove state).
    ``interop_ok`` pins that the checkpoint was actually used, the log
    was actually cleaned, and the injected partition column came back
    typed — flags any of which failing flips every hashed row."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k3 = F.col("o_orderkey") % 3
    work = tempfile.mkdtemp(prefix="k2e_delta_")
    table = os.path.join(work, "t")
    try:
        dl.delta_append(
            spark, table, o.filter(k3 == 0), partition_by=["o_orderstatus"]
        )
        dl.delta_append(
            spark, table, o.filter(k3 == 1), partition_by=["o_orderstatus"]
        )
        dl.delta_remove_where(
            table,
            lambda a: a["partitionValues"].get("o_orderstatus") == "O",
        )
        dl.delta_append(
            spark, table, o.filter(k3 == 2), partition_by=["o_orderstatus"]
        )
        # time travel BEFORE log cleanup: expiring the pre-checkpoint
        # commits legitimately loses versions below the checkpoint
        # (same as real Delta log retention) — the plan resolves its
        # concrete file list here, so it survives the cleanup
        asof_v1 = dl.read_delta(spark, table, version=1)
        ckpt_v = dl.delta_checkpoint(table)
        n_expired = dl.expire_delta_log(table, before_version=ckpt_v)
        dl.delta_append(
            spark,
            table,
            o.filter((k3 == 1) & (F.col("o_orderstatus") == "O")),
            partition_by=["o_orderstatus"],
        )
        snap = dl.delta_snapshot(table)
        latest = dl.read_delta(spark, table)
        interop_ok = bool(
            snap["checkpoint_used"]
            and n_expired > 0
            and dict(latest.dtypes)["o_orderstatus"] == "string"
            and snap["version"] == ckpt_v + 1
        )
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(asof_v1, "v1"))
            .withColumn("interop_ok", F.lit(interop_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B191 contract query: build a real Iceberg table from orders —
    snapshot s1 appends o_orderkey%2==0 under spec [year(o_orderdate)],
    s2 appends %2==1 under the EVOLVED spec [year, murmur3-bucket[8]
    (o_custkey)], s3 file-deletes the year-2000 partition (both spec
    generations) — then reads three legs through the interop path:

    - ``latest``: all orders except year 2000 (the delete hit files of
      BOTH specs — month partitions are exact row boundaries);
    - ``s1``: snapshot time travel to the first append (%2==0, year 2000
      included — pre-delete state);
    - ``pruned``: a within-1998 date filter through manifest pruning
      (the year transform decides the range), the residual filter
      keeping the read exact.

    Year grain (not month) keeps the fixture at ~7 partitions x 8
    buckets instead of ~80 x 8 — the bench times this query per round,
    and the month layout made the partitionBy write + per-file manifest
    build dominate the measurement.

    ``interop_ok`` pins that pruning actually skipped files, that two
    partition-spec generations coexist, and that the snapshot lineage
    recorded the delete."""
    import datetime as _dt

    from ..sources import iceberg_meta as im

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    )
    k2 = F.col("o_orderkey") % 2
    work = tempfile.mkdtemp(prefix="k2e_iceberg_")
    table = os.path.join(work, "t")
    try:
        s1 = im.iceberg_append(
            spark, table, o.filter(k2 == 0), spec=[("o_orderdate", "year")]
        )
        im.iceberg_append(
            spark,
            table,
            o.filter(k2 == 1),
            spec=[("o_orderdate", "year"), ("o_custkey", "bucket[8]")],
        )
        im.iceberg_delete_files(
            table,
            lambda fd: fd["partition"].get("o_orderdate_year") == "2000",
        )
        snap = im.iceberg_snapshot(table)
        latest = im.read_iceberg(spark, table)
        asof_s1 = im.read_iceberg(spark, table, snapshot_id=s1)
        filt = [
            (
                "o_orderdate",
                "between",
                (_dt.datetime(1998, 2, 1), _dt.datetime(1998, 11, 30, 23, 59, 59)),
            )
        ]
        kept, total = im.iceberg_prune(table, filt)
        pruned = im.read_iceberg(spark, table, filters=filt)
        interop_ok = bool(
            0 < len(kept) < total
            and len(snap["specs"]) == 2
            and len(snap["metadata"]["snapshots"]) == 3
            and snap["metadata"]["snapshots"][-1]["summary"]["operation"]
            == "delete"
        )
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(asof_s1, "s1"))
            .unionByName(_status_agg(pruned, "pruned"))
            .withColumn("interop_ok", F.lit(interop_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_iceberg_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B195 contract query: Iceberg v2 merge-on-read — s1 appends all
    orders, s2 POSITION-deletes rows with o_orderkey%97==0 (row-level,
    scattered across files, no data rewritten), s3 EQUALITY-deletes the
    status-'P' key, s4 re-appends the o_orderkey%500==3 slice (whose
    'P' rows must SURVIVE the earlier equality delete — the spec's
    strictly-lower-sequence scoping).  Live set = (not %97==0 and not
    'P' from s1) UNION ALL (%500==3 re-appends); the oracle restates
    exactly that, so a scoping bug (eq delete leaking onto later data,
    pos delete missing a file) flips a hashed row."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="k2e_icemor_")
    table = os.path.join(work, "t")
    from ..sources import iceberg_meta as im

    try:
        im.iceberg_append(spark, table, o)
        im.iceberg_positional_delete(
            spark, table, F.col("o_orderkey") % 97 == 0
        )
        im.iceberg_equality_delete(
            spark,
            table,
            spark.createDataFrame([("P",)], "o_orderstatus string"),
            ["o_orderstatus"],
        )
        im.iceberg_append(
            spark, table, o.filter(F.col("o_orderkey") % 500 == 3)
        )
        snap = im.iceberg_snapshot(table)
        mor_ok = bool(
            len(snap["deletes"]) == 2
            and {d["kind"] for d in snap["deletes"]} == {"pos", "eq"}
            and len(snap["metadata"]["snapshots"]) == 4
        )
        out = (
            _status_agg(im.read_iceberg(spark, table), "mor")
            .withColumn("interop_ok", F.lit(mor_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B196 contract query: three snapshot-protocol commits (orders split
    by o_orderkey%3, version = remainder) are EXPORTED as a Delta table
    (metadata-only — the add actions reference the original parquet),
    then read back through the Delta replay at latest AND as of delta
    version 1.  Latest must equal ALL orders; v1 must equal the first
    two commits (%3 <= 1) — any export defect (missed add, wrong remove
    delta, broken version mapping) flips a hashed row.  ``export_ok``
    pins metadata-rate: the export wrote zero data files."""
    import glob as _glob

    from ..operators.timetravel import commit_snapshot

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="k2e_dexport_")
    src = os.path.join(work, "src")
    dst = os.path.join(work, "dst")
    try:
        for v in range(3):
            commit_snapshot(
                spark, src, o.filter(F.col("o_orderkey") % 3 == v), v
            )
        n_before = len(_glob.glob(os.path.join(dst, "**", "*.parquet"), recursive=True))
        n_commits = dl.export_delta_log(spark, src, dst)
        data_written = [
            f
            for f in _glob.glob(os.path.join(dst, "**", "*"), recursive=True)
            if f.endswith(".parquet") and "_delta_log" not in f
        ]
        export_ok = bool(
            n_commits == 3 and n_before == 0 and not data_written
        )
        latest = dl.read_delta(spark, dst)
        asof_v1 = dl.read_delta(spark, dst, version=1)
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(asof_v1, "v1"))
            .withColumn("interop_ok", F.lit(export_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_delta_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B198 contract query: row-level deletes via deletion vectors —
    build a real Delta table from orders (two appends split by
    o_orderkey%2, partitioned by o_orderstatus, per-file stats), then:

    - v2: DELETE WHERE o_orderkey%7==3 with ``inline_max_bytes=0`` —
      every touched file gets an ON-DISK DV ('u', shared
      ``deletion_vector_<uuid>.bin`` sidecar, offset-addressed);
    - v3: DELETE WHERE o_orderkey%7==5 AND status='O' with a large
      inline budget — the 'O' files' DVs MERGE (new bitmap contains
      the old positions, the spec's replacement rule) and come back
      INLINE ('i', Z85 in the log), so the live state mixes both
      storage types;
    - checkpoint at v3 + expire the pre-checkpoint commits — the
      latest read must replay DV descriptors out of the checkpoint
      parquet (dropping them there would resurrect deleted rows).

    Legs: latest (both deletes), v2 (first delete only), v1
    (pre-delete) — time travel pins that DVs version correctly.
    ``interop_ok`` additionally pins the protocol upgrade
    (readerFeatures=[deletionVectors]), the mixed 'u'+'i' storage
    state, and that the live DV cardinalities sum to the exact
    deleted-row count."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2 = F.col("o_orderkey") % 2
    k7 = F.col("o_orderkey") % 7
    work = tempfile.mkdtemp(prefix="k2e_dv_")
    table = os.path.join(work, "t")
    try:
        dl.delta_append(
            spark, table, o.filter(k2 == 0),
            partition_by=["o_orderstatus"], collect_stats=True,
        )
        dl.delta_append(
            spark, table, o.filter(k2 == 1),
            partition_by=["o_orderstatus"], collect_stats=True,
        )
        v2 = dl.delta_delete_where(
            spark, table, k7 == 3, inline_max_bytes=0
        )
        dl.delta_delete_where(
            spark,
            table,
            (k7 == 5) & (F.col("o_orderstatus") == "O"),
            inline_max_bytes=1 << 20,
        )
        asof_v1 = dl.read_delta(spark, table, version=1)
        asof_v2 = dl.read_delta(spark, table, version=v2)
        ckpt_v = dl.delta_checkpoint(table)
        n_expired = dl.expire_delta_log(table, before_version=ckpt_v)
        snap = dl.delta_snapshot(table)
        latest = dl.read_delta(spark, table)
        dvs = [
            f_["deletionVector"]
            for f_ in snap["files"]
            if f_.get("deletionVector")
        ]
        n_deleted_expected = o.filter(
            (k7 == 3) | ((k7 == 5) & (F.col("o_orderstatus") == "O"))
        ).count()
        interop_ok = bool(
            snap["checkpoint_used"]
            and n_expired > 0
            and "deletionVectors"
            in (snap["protocol"] or {}).get("readerFeatures", [])
            and {d["storageType"] for d in dvs} == {"u", "i"}
            and sum(int(d["cardinality"]) for d in dvs)
            == n_deleted_expected
        )
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(asof_v2, "v2"))
            .unionByName(_status_agg(asof_v1, "v1"))
            .withColumn("interop_ok", F.lit(interop_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B199 contract query: snapshot-to-Iceberg export WITH
    merge-on-read debt — the direction B196's Delta export refuses.
    Build a timetravel-protocol table from orders:

    - v0/v1: appends split by o_orderkey%2;
    - v2: EQUALITY delete (keys = o_orderkey where %7==3 — B152
      merge-on-read, no data rewrite);
    - v3: POSITIONAL delete of the physical rows where %11==5 (B169
      pairs via the ``_metadata`` scan);
    - v4: re-insert the %7==3 AND %13==0 slice — rows that must
      SURVIVE the v2 equality delete under the sequence-number rule.

    Export to Iceberg v2 (data files referenced in place; equality
    deletes in place with footer-derived key columns + schema-resolved
    field ids; position-delete pairs rewritten pairs-rate to the
    spec's (file_path, pos) names) and read back three legs through
    the interop reader: latest (all debt applied + re-insert), s2
    (equality delete only), s1 (pre-delete).  ``interop_ok`` pins
    metadata-only-ness (no data parquet under the destination beyond
    the converted pairs), both delete manifest kinds present, and
    full snapshot-history travel."""
    import glob as _glob

    from ..operators import timetravel as tt
    from ..sources import iceberg_meta as im

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2, k7, k11, k13 = (F.col("o_orderkey") % n for n in (2, 7, 11, 13))
    work = tempfile.mkdtemp(prefix="k2e_iexp_")
    src = os.path.join(work, "src")
    dst = os.path.join(work, "dst")
    try:
        tt.commit_snapshot(spark, src, o.filter(k2 == 0), 0)
        tt.commit_snapshot(spark, src, o.filter(k2 == 1), 1)
        tt.commit_delete(
            spark, src, o.filter(k7 == 3).select("o_orderkey"), 2
        )
        data_paths = [
            e["path"]
            for e in tt.manifest_entries(src, 2)
            if e["kind"] == "data"
        ]
        from ..catalog import read_parquet_footer

        pairs = (
            read_parquet_footer(spark, *data_paths)
            .select(
                "o_orderkey",
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:", ""
                ).alias("file_path"),
                F.col("_metadata.row_index").cast("long").alias("row_index"),
            )
            .filter(k11 == 5)
            .select("file_path", "row_index")
        )
        tt.commit_positional_delete(spark, src, pairs, 3)
        tt.commit_snapshot(
            spark, src, o.filter((k7 == 3) & (k13 == 0)), 4
        )
        n_snaps = im.export_iceberg_meta(spark, src, dst)
        data_under_dst = [
            f
            for f in _glob.glob(os.path.join(dst, "**", "*.parquet"), recursive=True)
            if "/deletes/" not in f
        ]
        snap = im.iceberg_snapshot(dst)
        kinds = {d["kind"] for d in snap["deletes"]}
        latest = im.read_iceberg(spark, dst)
        s2 = im.read_iceberg(spark, dst, snapshot_id=2)
        s1 = im.read_iceberg(spark, dst, snapshot_id=1)
        interop_ok = bool(
            n_snaps == 5
            and not data_under_dst
            and kinds == {"pos", "eq"}
            and len(snap["metadata"]["snapshots"]) == 5
        )
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(s2, "s2"))
            .unionByName(_status_agg(s1, "s1"))
            .withColumn("interop_ok", F.lit(interop_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B203 contract query: the change data feed derived from Delta log
    replay + deletion-vector diffs (no CDC sidecar files needed) —
    fixture: v0/v1 appends split by o_orderkey%2 (partitioned by
    status), v2 row-level DV delete (%7==3), v3 FILE-level remove of
    the 'O' partition, v4 re-append of the (odd, 'O') slice; then
    ``delta_changes(1, latest)`` must report exactly

    - v2: deletes = rows %7==3 (the DV-diff position-keep leg),
    - v3: deletes = surviving 'O' rows (%7<>3 — the removed-file leg
      reads LIVE rows as of v2, so already-DV-dead rows must NOT
      re-report),
    - v4: inserts = the re-appended slice,

    aggregated per (_commit_version, _change_type, status) with exact
    key checksums.  The v3 leg is the sharp edge: a reader that scans
    removed files without applying their prior deletion vectors
    double-reports the %7==3 'O' rows and flips two rows' hashes."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2 = F.col("o_orderkey") % 2
    k7 = F.col("o_orderkey") % 7
    work = tempfile.mkdtemp(prefix="k2e_cdf_")
    table = os.path.join(work, "t")
    try:
        dl.delta_append(
            spark, table, o.filter(k2 == 0), partition_by=["o_orderstatus"]
        )
        dl.delta_append(
            spark, table, o.filter(k2 == 1), partition_by=["o_orderstatus"]
        )
        dl.delta_delete_where(spark, table, k7 == 3)
        dl.delta_remove_where(
            table,
            lambda a: a["partitionValues"].get("o_orderstatus") == "O",
        )
        dl.delta_append(
            spark,
            table,
            o.filter((k2 == 1) & (F.col("o_orderstatus") == "O")),
            partition_by=["o_orderstatus"],
        )
        ch = dl.delta_changes(spark, table, 1)
        out = (
            ch.groupBy(
                "_commit_version",
                "_change_type",
                F.col("o_orderstatus").alias("status"),
            )
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_uniform_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B208: UniForm dual-publish parity — ONE timetravel-protocol
    table (three %3 order slices) exported METADATA-ONLY to BOTH open
    formats (B196 Delta log + B199 Iceberg metadata, over the same
    physical parquet), then every leg read back through the respective
    interop reader: latest and v1 through Delta, latest and snapshot-1
    through Iceberg.  The oracle emits each (leg, status) row TWICE —
    once per format — so ANY cross-format divergence (a version map
    off-by-one, a file list drift, a schema cast difference) flips the
    hash.  ``parity_ok`` additionally pins that neither export copied
    a data file: both tables reference the source parquet in place."""
    import glob as _glob

    from ..operators.timetravel import commit_snapshot
    from ..sources import iceberg_meta as im

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="k2e_uniform_")
    src = os.path.join(work, "src")
    d_dst = os.path.join(work, "delta")
    i_dst = os.path.join(work, "iceberg")
    try:
        for v in range(3):
            commit_snapshot(
                spark, src, o.filter(F.col("o_orderkey") % 3 == v), v
            )
        n_delta = dl.export_delta_log(spark, src, d_dst)
        n_ice = im.export_iceberg_meta(spark, src, i_dst)
        copied = [
            f
            for dst in (d_dst, i_dst)
            for f in _glob.glob(os.path.join(dst, "**", "*.parquet"), recursive=True)
            if "_delta_log" not in f and f"{os.sep}metadata{os.sep}" not in f
        ]
        parity_ok = bool(n_delta == 3 and n_ice == 3 and not copied)
        legs = [
            ("delta", _status_agg(dl.read_delta(spark, d_dst), "latest")),
            ("delta", _status_agg(dl.read_delta(spark, d_dst, version=1), "v1")),
            ("iceberg", _status_agg(im.read_iceberg(spark, i_dst), "latest")),
            (
                "iceberg",
                _status_agg(
                    im.read_iceberg(spark, i_dst, snapshot_id=1), "v1"
                ),
            ),
        ]
        out = None
        for fmt, df in legs:
            df = df.withColumn("fmt", F.lit(fmt))
            out = df if out is None else out.unionByName(df)
        out = out.withColumn(
            "parity_ok", F.lit(parity_ok)
        ).localCheckpoint(eager=True)  # materialize before the rmtree
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def q_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B216 contract query: MERGE INTO via merge-on-read deletion
    vectors — the delta-spark upsert shape on an interop table: two
    appends (o_orderkey%2, partitioned by status), then ONE atomic
    merge whose source carries the %9==4 slice doubled in price
    (matched -> DV-delete + re-land) plus the same slice re-keyed
    +10^7 (not matched -> insert).  Legs: latest (upsert applied) and
    v1 (pre-merge — time travel must see the original prices, so a
    merge that rewrote files in place instead of DV'ing them flips
    this leg).  ``merge_ok`` pins the matched/written counts and that
    the touched files carry DVs rather than having been rewritten."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2, k9 = F.col("o_orderkey") % 2, F.col("o_orderkey") % 9
    work = tempfile.mkdtemp(prefix="k2e_merge_")
    table = os.path.join(work, "t")
    try:
        dl.delta_append(
            spark, table, o.filter(k2 == 0),
            partition_by=["o_orderstatus"], collect_stats=True,
        )
        dl.delta_append(
            spark, table, o.filter(k2 == 1),
            partition_by=["o_orderstatus"], collect_stats=True,
        )
        upd = o.filter(k9 == 4).select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
        ins = o.filter(k9 == 4).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
        )
        res = dl.delta_merge(
            spark, table, upd.unionByName(ins), ["o_orderkey"]
        )
        n_slice = o.filter(k9 == 4).count()
        snap = dl.delta_snapshot(table)
        n_dv = sum(
            1 for f_ in snap["files"] if f_.get("deletionVector")
        )
        merge_ok = bool(
            res["n_matched"] == n_slice
            and res["n_written"] >= 1
            and n_dv >= 1
        )
        latest = dl.read_delta(spark, table)
        asof_v1 = dl.read_delta(spark, table, version=1)
        out = (
            _status_agg(latest, "latest")
            .unionByName(_status_agg(asof_v1, "v1"))
            .withColumn("interop_ok", F.lit(merge_ok))
            .localCheckpoint(eager=True)  # materialize before the rmtree
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


QUERIES = {
    "q_delta_read": q_delta_read,
    "q_delta_dv": q_delta_dv,
    "q_delta_cdf": q_delta_cdf,
    "q_delta_merge": q_delta_merge,
    "q_iceberg_export": q_iceberg_export,
    "q_uniform_parity": q_uniform_parity,
    "q_iceberg_read": q_iceberg_read,
    "q_iceberg_mor": q_iceberg_mor,
    "q_delta_export": q_delta_export,
}

ORACLE = {
    "q_delta_merge": """
        WITH latest AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 9 = 4 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            UNION ALL
            SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 9 = 4
        ), lagg AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM latest GROUP BY o_orderstatus
        ), v1agg AS (
            SELECT 'v1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus
        )
        SELECT *, TRUE AS interop_ok FROM lagg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM v1agg
    """,
    "q_uniform_parity": """
        WITH fmts AS (SELECT 'delta' AS fmt UNION ALL SELECT 'iceberg'),
        lagg AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus
        ), vagg AS (
            SELECT 'v1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM orders WHERE o_orderkey % 3 <= 1 GROUP BY o_orderstatus
        ), both_legs AS (
            SELECT * FROM lagg UNION ALL SELECT * FROM vagg
        )
        SELECT b.*, f.fmt, TRUE AS parity_ok
        FROM both_legs b CROSS JOIN fmts f
    """,
    "q_delta_cdf": """
        WITH ch AS (
            SELECT CAST(2 AS BIGINT) AS _commit_version,
                   'delete' AS _change_type, o_orderstatus AS status,
                   o_orderkey
            FROM orders WHERE o_orderkey % 7 = 3
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'delete', o_orderstatus, o_orderkey
            FROM orders
            WHERE o_orderstatus = 'O' AND o_orderkey % 7 <> 3
            UNION ALL
            SELECT CAST(4 AS BIGINT), 'insert', o_orderstatus, o_orderkey
            FROM orders
            WHERE o_orderkey % 2 = 1 AND o_orderstatus = 'O'
        )
        SELECT _commit_version, _change_type, status,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM ch GROUP BY _commit_version, _change_type, status
    """,
    "q_iceberg_export": """
        WITH latest AS (
            SELECT * FROM orders
            WHERE (o_orderkey % 7 <> 3 AND o_orderkey % 11 <> 5)
               OR (o_orderkey % 7 = 3 AND o_orderkey % 13 = 0)
        ), s2 AS (
            SELECT * FROM orders WHERE o_orderkey % 7 <> 3
        ), lagg AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM latest GROUP BY o_orderstatus
        ), s2agg AS (
            SELECT 's2' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM s2 GROUP BY o_orderstatus
        ), s1agg AS (
            SELECT 's1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus
        )
        SELECT *, TRUE AS interop_ok FROM lagg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM s2agg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM s1agg
    """,
    "q_delta_dv": """
        WITH latest AS (
            SELECT * FROM orders
            WHERE o_orderkey % 7 <> 3
              AND NOT (o_orderkey % 7 = 5 AND o_orderstatus = 'O')
        ), v2 AS (
            SELECT * FROM orders WHERE o_orderkey % 7 <> 3
        ), lagg AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM latest GROUP BY o_orderstatus
        ), v2agg AS (
            SELECT 'v2' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM v2 GROUP BY o_orderstatus
        ), v1agg AS (
            SELECT 'v1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus
        )
        SELECT *, TRUE AS interop_ok FROM lagg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM v2agg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM v1agg
    """,
    "q_delta_read": """
        WITH latest AS (
            SELECT * FROM orders
            WHERE NOT (o_orderkey % 3 = 0 AND o_orderstatus = 'O')
        ), v1 AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <= 1
        ), lagg AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM latest GROUP BY o_orderstatus
        ), vagg AS (
            SELECT 'v1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM v1 GROUP BY o_orderstatus
        )
        SELECT *, TRUE AS interop_ok FROM lagg
        UNION ALL
        SELECT *, TRUE AS interop_ok FROM vagg
    """,
    "q_iceberg_read": """
        WITH latest AS (
            SELECT * FROM orders
            WHERE EXTRACT(year FROM o_orderdate) <> 2000
        ), s1 AS (
            SELECT * FROM orders WHERE o_orderkey % 2 = 0
        ), pruned AS (
            SELECT * FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1998-02-01 00:00:00' AND TIMESTAMP '1998-11-30 23:59:59'
        ), a1 AS (
            SELECT 'latest' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM latest GROUP BY o_orderstatus
        ), a2 AS (
            SELECT 's1' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM s1 GROUP BY o_orderstatus
        ), a3 AS (
            SELECT 'pruned' AS leg, o_orderstatus AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            FROM pruned GROUP BY o_orderstatus
        )
        SELECT *, TRUE AS interop_ok FROM a1
        UNION ALL SELECT *, TRUE AS interop_ok FROM a2
        UNION ALL SELECT *, TRUE AS interop_ok FROM a3
    """,
}

ORACLE["q_delta_export"] = """
    WITH latest AS (SELECT * FROM orders),
    v1 AS (SELECT * FROM orders WHERE o_orderkey % 3 <= 1),
    a1 AS (
        SELECT 'latest' AS leg, o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM latest GROUP BY o_orderstatus
    ), a2 AS (
        SELECT 'v1' AS leg, o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM v1 GROUP BY o_orderstatus
    )
    SELECT *, TRUE AS interop_ok FROM a1
    UNION ALL SELECT *, TRUE AS interop_ok FROM a2
"""

ORACLE["q_iceberg_mor"] = """
    WITH live AS (
        SELECT * FROM orders
        WHERE o_orderkey % 97 <> 0 AND o_orderstatus <> 'P'
        UNION ALL
        SELECT * FROM orders WHERE o_orderkey % 500 = 3
    )
    SELECT 'mor' AS leg, o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           TRUE AS interop_ok
    FROM live GROUP BY o_orderstatus
"""

ROWS_ONLY: set[str] = set()
