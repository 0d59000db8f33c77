"""Driver-contract sanity: entry() smoke, queries/oracle key discipline."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 45


def test_queries_run_at_smallest_sf(spark, sf_dir):
    qs = entrymod.queries()
    for name in ("q_pricing_agg", "q_join_star", "q_grok", "q_cosine_topk", "q_dedup_exact"):
        assert qs[name](spark, sf_dir).count() > 0
