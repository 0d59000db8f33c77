"""Sectioned py4j-call + wall accounting for _scan_delta_files (r14).

Replicates read_delta(latest) on the q_delta_dv fixture step by step,
counting py4j send_command round-trips and wall per section.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.clientserver as _cs
from pyspark.sql import functions as F

from kinesis2elastic_spark.session import get_spark
from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.sources import delta_log as dl

CALLS = [0]
_orig = _cs.ClientServerConnection.send_command


def _counted(self, *a, **k):
    CALLS[0] += 1
    return _orig(self, *a, **k)


_cs.ClientServerConnection.send_command = _counted


class S:
    def __init__(self):
        self.rows = []

    def __call__(self, name):
        self.name, self.t0, self.c0 = name, time.monotonic(), CALLS[0]
        return self

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.rows.append(
            (self.name, time.monotonic() - self.t0, CALLS[0] - self.c0)
        )


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("r14-dvread-sections")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2, k7 = F.col("o_orderkey") % 2, F.col("o_orderkey") % 7
    work = tempfile.mkdtemp(prefix="k2e_dvsect_")
    table = os.path.join(work, "t")
    try:
        dl.delta_append(spark, table, o.filter(k2 == 0),
                        partition_by=["o_orderstatus"], collect_stats=True)
        dl.delta_append(spark, table, o.filter(k2 == 1),
                        partition_by=["o_orderstatus"], collect_stats=True)
        dl.delta_delete_where(spark, table, k7 == 3, inline_max_bytes=0)
        dl.delta_delete_where(
            spark, table, (k7 == 5) & (F.col("o_orderstatus") == "O"),
            inline_max_bytes=1 << 20)
        dl.read_delta(spark, table)  # warm

        for rep in range(3):
            sec = S()
            with sec("snapshot"):
                snap = dl.delta_snapshot(table, None)
            files = snap["files"]
            schema = snap["schema"]
            pcols = snap["partition_columns"]
            pmap = snap.get("physical_names") or {}
            dtypes = {f.name: f.dataType for f in schema.fields}
            from kinesis2elastic_spark.sources import dvectors as _dv

            with sec("dv-decode"):
                positions = {}
                for f_ in files:
                    if f_.get("deletionVector"):
                        positions[f_["path"]] = _dv.decode_descriptor(
                            table, f_["deletionVector"])
            with sec("pos_df"):
                import pandas as _pd
                pos_df = spark.createDataFrame(_pd.DataFrame(
                    [(p, int(i)) for p, poss in positions.items()
                     for i in poss], columns=["__dvf", "__dvp"]))
            groups = {}
            for f_ in files:
                key = tuple((f_["partitionValues"] or {}).get(
                    pmap.get(c, c)) for c in pcols)
                groups.setdefault(key, []).append(f_)
            from pyspark.sql.types import StructField as _SF
            from pyspark.sql.types import StructType as _ST
            phys_schema = _ST([_SF(pmap.get(f.name, f.name), f.dataType, True)
                               for f in schema.fields if f.name not in pcols])
            parts = []
            for key, fgroup in sorted(groups.items(), key=lambda kv: str(kv[0])):
                clean = [f["path"] for f in fgroup if f["path"] not in positions]
                dirty = [f["path"] for f in fgroup if f["path"] in positions]
                legs = []
                if clean:
                    with sec("clean-scan"):
                        legs.append(spark.read.schema(phys_schema).parquet(*clean))
                if dirty:
                    with sec("dirty-scan"):
                        d0 = spark.read.schema(phys_schema).parquet(*dirty)
                    with sec("dirty-meta-select"):
                        d1 = d0.select(
                            "*",
                            F.regexp_replace(F.col("_metadata.file_path"),
                                             "^file:/*", "/").alias("__dvf"),
                            F.col("_metadata.row_index").cast("long").alias("__dvp"))
                    with sec("dirty-join-drop"):
                        legs.append(d1.join(F.broadcast(pos_df),
                                            ["__dvf", "__dvp"], "left_anti")
                                    .drop("__dvf", "__dvp"))
                df = legs[0]
                for leg in legs[1:]:
                    with sec("leg-union"):
                        df = df.unionByName(leg)
                with sec("map-select"):
                    cols = []
                    for f in schema.fields:
                        if f.name in pcols:
                            raw = key[pcols.index(f.name)]
                            if raw is None or raw == dl._HIVE_NULL:
                                cols.append(F.lit(None).cast(dtypes[f.name]).alias(f.name))
                            else:
                                cols.append(F.lit(raw).cast(dtypes[f.name]).alias(f.name))
                        else:
                            cols.append(F.col(pmap.get(f.name, f.name)).alias(f.name))
                    parts.append(df.select(*cols))
            with sec("group-union"):
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
            with sec("final-cast"):
                out = out.select(*[F.col(f.name).cast(f.dataType).alias(f.name)
                                   for f in schema.fields])
            agg = {}
            for name, w, c in sec.rows:
                a = agg.setdefault(name, [0.0, 0, 0])
                a[0] += w; a[1] += c; a[2] += 1
            print(f"== rep {rep}")
            for name, (w, c, n) in agg.items():
                print(f"  {name:18s} wall={w:6.3f}s calls={c:4d} (x{n})")
            print(f"  TOTAL              wall={sum(a[0] for a in agg.values()):6.3f}s calls={sum(a[1] for a in agg.values())}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
