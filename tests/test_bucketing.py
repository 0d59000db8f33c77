"""Bucketing: co-located join must plan with NO shuffle Exchange."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.catalog import load
from kinesis2elastic_spark.operators.bucketing import bucketed_join, write_bucketed
from kinesis2elastic_spark.plans.explain import formatted_plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    write_bucketed(load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
                   "t_lineitem_b", "l_orderkey")
    write_bucketed(load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
                   "t_orders_b", "o_orderkey")
    joined = bucketed_join(spark, "t_lineitem_b", "t_orders_b", "l_orderkey", "o_orderkey")
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    # bucket-aligned scan: no shuffle on either side
    assert "Exchange" not in plan
    # and the result is right
    n = joined.count()
    expect = load(spark, sf_dir, "lineitem").count()
    assert n == expect  # every lineitem matches exactly one order


def test_unbucketed_join_shuffles_for_contrast(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").hint("merge")
    plan = formatted_plan(l.join(o, l.l_orderkey == o.o_orderkey))
    assert "Exchange" in plan  # the shuffle bucketing removes
