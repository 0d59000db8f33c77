"""cProfile the driver-side cost of a DV-table read_delta (r15 candidate
#1 scoping): builds the q_delta_dv fixture at a small SF, then profiles
read_delta(latest) construct only (no action).

Usage: python tools/r14_dvread_prof.py [--sf DIR]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis2elastic_spark.session import get_spark
from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.sources import delta_log as dl


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("r14-dvread-prof")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k2 = F.col("o_orderkey") % 2
    k7 = F.col("o_orderkey") % 7
    work = tempfile.mkdtemp(prefix="k2e_dvprof_")
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
        dl.delta_delete_where(spark, table, k7 == 3, inline_max_bytes=0)
        dl.delta_delete_where(
            spark, table,
            (k7 == 5) & (F.col("o_orderstatus") == "O"),
            inline_max_bytes=1 << 20,
        )
        # warm one read so JVM/py4j paths are hot
        dl.read_delta(spark, table)
        for rep in range(3):
            t0 = time.monotonic()
            pr = cProfile.Profile()
            pr.enable()
            dl.read_delta(spark, table)
            pr.disable()
            wall = time.monotonic() - t0
            print(f"== rep {rep}: read_delta construct {wall:.3f}s")
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
            print("\n".join(s.getvalue().splitlines()[4:40]))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
