"""r11 same-session interleaved A/B: LPA per-round argmax as row_number
window (r10 shape) vs map-combinable min(struct(-c, label)) fold, at
sf0.1 — the noise doctrine (cross-session runs drift +-30%, so keep /
revert decisions come only from interleaved same-session pairs)."""
import sys, time

sys.path.insert(0, "/root/repo")
from kinesis2elastic_spark.session import get_spark
from kinesis2elastic_spark.operators import graph
from kinesis2elastic_spark.operators.graph import (
    _trade_edges, LP_ROUNDS, _loop_parts, md5_prefix_long,
)
from kinesis2elastic_spark.plans.pinning import pin
from kinesis2elastic_spark.catalog import load
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"


def lpa_window(edges, rounds, n_edges_hint):
    """The r10 shape: row_number window argmax."""
    spark = edges.sparkSession
    edges = edges.select("src", "dst")
    parts = _loop_parts(spark, int(n_edges_hint))
    edges = pin(edges.repartition(parts, "src").dropDuplicates(["src", "dst"]))
    labels = pin(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(parts, "node")
    )
    for i in range(rounds):
        cnt = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        w = W.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
        upd = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("__new"))
            .repartition(parts, "node")
        )
        labels = labels.join(upd, "node", "left").select(
            "node", F.coalesce("__new", "label").alias("label")
        )
        if i % 2 == 1 or i == rounds - 1:
            labels = pin(labels)
    return labels


def reduce_out(labels):
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum(md5_prefix_long(F.col("node"))).cast("long").alias("cs"),
    )


def run(spark, variant):
    t0 = time.monotonic()
    hint = 2 * load(spark, SF, "lineitem").count()
    e = _trade_edges(spark, SF, dedup=False)
    if variant == "window":
        labels = lpa_window(e, LP_ROUNDS, hint)
    else:
        labels = graph.label_propagation(e, LP_ROUNDS, n_edges_hint=hint)
    rows = sorted((r.community, r.n_members, r.cs) for r in reduce_out(labels).collect())
    return time.monotonic() - t0, rows


def main():
    spark = get_spark("lpa-ab", cpus=16)
    # warm both paths once
    _, ra = run(spark, "window")
    _, rb = run(spark, "fold")
    assert ra == rb, "variants disagree!"
    print("outputs agree:", len(ra), "communities")
    times = {"window": [], "fold": []}
    for rep in range(3):
        for v in ("window", "fold"):
            dt, _ = run(spark, v)
            times[v].append(dt)
            print(f"rep{rep} {v}: {dt:.2f}s", flush=True)
    for v, ts in times.items():
        print(f"{v}: min={min(ts):.2f} med={sorted(ts)[1]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
