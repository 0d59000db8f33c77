"""Catalog statistics for CBO join planning (B194, r12 verdict item 8).

Spark's pre-AQE broadcast decision for a path-based parquet read is a
FILE-SIZE proxy: `sizeInBytes = on-disk bytes x projection width ratio`
(schema-DEFAULT widths — a string counts 20 bytes whatever it holds).
At 100 TB that proxy lies in both directions: a dim whose fat text
column dominates its files looks too big to broadcast even when the
join projects only its key, and AQE can only fix it after the first
shuffle materializes.  The fix Spark actually supports is CATALOG
statistics: with a registered rowCount and `spark.sql.cbo.enabled`,
the planner sizes every operator from row counts x output width
(`BasicStatsPlanVisitor`) — the broadcast decision becomes stats-driven
before any shuffle exists.

``register_table_stats`` is the repo's one-call wiring: register the
parquet path as a session-catalog table and run
`ANALYZE TABLE ... COMPUTE STATISTICS` — for parquet the row count is a
FOOTER-rate aggregate (no data pages), i.e. the same number the B150
manifest records as `n_rows`.  Direct injection of the manifest values
via `CatalogStatistics` is NOT reachable from PySpark: py4j
auto-converts `scala.math.BigInt` return values to Python ints, so the
constructor can never be fed a BigInt from this side, and Hive rejects
`spark.sql.statistics.*` TBLPROPERTIES set through SQL — the ANALYZE
path computes the identical numbers through a public API instead.

Scope note (documented, not hidden): a session-catalog table points at
a DIRECTORY, so this wiring covers plain parquet layouts and snapshot
tables whose live set is one data dir (REPLACE / post-OPTIMIZE
layouts).  A carry-forward manifest whose live files span several
commit dirs cannot be expressed as a catalog table — OPTIMIZE first
(B135/B178), then register.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.timetravel import manifest_entries


def enable_cbo(spark: SparkSession) -> None:
    """Turn on cost-based optimization + stats-driven join reordering —
    without `spark.sql.cbo.enabled`, registered rowCounts are ignored
    and the planner stays on the file-size proxy."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")


def register_table_stats(
    spark: SparkSession, name: str, path: str, replace: bool = True
) -> dict:
    """Register ``path`` (a parquet dir) as catalog table ``name`` and
    compute its statistics (footer-rate for parquet).  Returns the
    registered {"n_rows", "size_bytes"} read back from the catalog, so
    callers can assert the wiring took."""
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    return catalog_stats(spark, name)


def register_snapshot_stats(
    spark: SparkSession, name: str, table_dir: str, version: int | None = None
) -> dict:
    """The manifest-table leg: register the LIVE snapshot of a
    timetravel table (B138) for CBO.  Requires the live data files to
    share one directory (REPLACE commits, post-OPTIMIZE layouts — the
    shapes a table serving repeated joins should be in anyway); fails
    loud otherwise instead of silently registering dead files.  The
    ANALYZE row count then equals the manifest's summed ``n_rows`` by
    construction (both are parquet footer counts over the same files) —
    asserted here, so a divergence (stale dir contents) cannot pass."""
    import os

    entries = [
        e for e in manifest_entries(table_dir, version) if e["kind"] == "data"
    ]
    if not entries:
        raise ValueError(f"no data files in snapshot of {table_dir}")
    dirs = {os.path.dirname(e["path"]) for e in entries}
    if len(dirs) != 1:
        raise ValueError(
            f"live snapshot spans {len(dirs)} dirs — a catalog table can't "
            "express a file list; OPTIMIZE (B135) first, then register"
        )
    d = dirs.pop()
    on_disk = {
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    }
    live = {e["path"] for e in entries}
    if on_disk != live:
        raise ValueError(
            "snapshot dir holds files outside the live manifest — "
            "registering it would hand the planner dead data"
        )
    got = register_table_stats(spark, name, d)
    manifest_rows = sum(int(e["n_rows"]) for e in entries)
    if got["n_rows"] != manifest_rows:
        raise ValueError(
            f"ANALYZE rowCount {got['n_rows']} != manifest n_rows "
            f"{manifest_rows} for {table_dir}"
        )
    return got


def catalog_stats(spark: SparkSession, name: str) -> dict:
    """Read back the registered statistics ({"n_rows", "size_bytes"};
    None when absent) from DESCRIBE TABLE EXTENDED."""
    import re

    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row.col_name == "Statistics":
            m = re.search(r"(\d+) bytes(?:, (\d+) rows)?", row.data_type)
            if m:
                return {
                    "size_bytes": int(m.group(1)),
                    "n_rows": int(m.group(2)) if m.group(2) else None,
                }
    return {"size_bytes": None, "n_rows": None}
