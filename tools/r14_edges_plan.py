"""Capture the edge-derivation subplan before/after the r14 symmetrization
(change #5, commit 54f41a2).

The graph kernels' end-to-end plans hide the edge derivation behind the
loop-interior pins (localCheckpoint), so this captures the derivation
subtree itself: the pre-change shape (unionByName over two selects of the
SAME orders⋈lineitem join — reconstructed verbatim from 54f41a2^) and the
current `_trade_edges` (one join, one explode).  Output:
plans/r14/edges_symmetrize_before.txt / _after.txt.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis2elastic_spark.session import get_spark
from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.operators.graph import _trade_edges


def formatted(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    spark = get_spark()

    # BEFORE (54f41a2^): both edge directions as unionByName over the same
    # join subtree — Spark executes the orders⋈lineitem join once PER BRANCH.
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    trade = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    before = trade.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).unionByName(trade.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))

    after = _trade_edges(spark, sf_dir)

    for name, df in (("before", before), ("after", after)):
        txt = formatted(df)
        path = os.path.join(out_dir, f"edges_symmetrize_{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        joins = txt.count("Join")
        scans = txt.count("Scan parquet")
        print(f"{name}: Join nodes={joins} Scan parquet={scans} -> {path}")

    spark.stop()


if __name__ == "__main__":
    main()
