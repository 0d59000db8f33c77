"""r14: A/B the DV victims-position transfer (guide §5, driver boundary).

delta_delete_where / delta_merge materialize the matched (file, pos)
pairs on the driver to build the per-file DV bitmaps.  This times the
two transfer forms on the SAME frame — row-based ``.collect()``
(pickled Row objects) vs Arrow ``.toPandas()`` + vectorized groupby —
at a wide-delete cardinality, where the transfer cost is visible above
the scan.

Usage: python tools/r14_victims_ab.py [n_rows] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis2elastic_spark.session import get_spark
from kinesis2elastic_spark.sources import delta_log as dl


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark("r14-victims-ab")
    tmp = tempfile.mkdtemp(prefix="r14_victims_")
    t = os.path.join(tmp, "t")
    try:
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        dl.delta_append(spark, t, df)
        snap = dl.delta_snapshot(t)
        scan = dl._identity_scan(spark, t, snap)
        hits = scan.filter(F.col("k") % 2 == 0).select("__dvf", "__dvp")

        # warm both paths once (page cache, Arrow init)
        hits.toPandas()
        hits.collect()

        def grp_rows() -> dict:
            rows = hits.collect()
            new_pos: dict[str, set[int]] = {}
            for r in rows:
                new_pos.setdefault(r["__dvf"], set()).add(int(r["__dvp"]))
            return new_pos

        def grp_arrow() -> dict:
            pdf = hits.toPandas()
            return {
                f: set(map(int, g["__dvp"].to_numpy()))
                for f, g in pdf.groupby("__dvf", sort=False)
            }

        t_rows = t_arrow = float("inf")
        for _ in range(reps):
            t0 = time.time()
            a = grp_rows()
            t_rows = min(t_rows, time.time() - t0)
            t0 = time.time()
            b = grp_arrow()
            t_arrow = min(t_arrow, time.time() - t0)
        assert a == b, "paths disagree"
        n_pos = sum(len(v) for v in a.values())
        print(
            f"n_rows={n_rows} matched={n_pos} files={len(a)} "
            f"rows_collect={t_rows:.3f}s arrow_toPandas={t_arrow:.3f}s "
            f"speedup={t_rows / t_arrow:.2f}x"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
