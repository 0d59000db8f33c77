"""Corpus-construction operator tests: sampling determinism and split
disjointness, mix priority semantics, packing invariants."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import corpus


def test_hash_sample_deterministic_and_split_disjoint(spark, sf_dir):
    a = {r.doc_id: r.split for r in corpus.q_hash_sample(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in corpus.q_hash_sample(spark, sf_dir).collect()}
    assert a == b  # reproducible, no RNG
    assert set(a.values()) <= {"train", "val"}
    assert 0 < len(a) < spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert any(v == "val" for v in a.values())
    assert any(v == "train" for v in a.values())


def test_corpus_mix_keeps_one_per_fingerprint(spark, sf_dir):
    out = corpus.q_corpus_mix(spark, sf_dir)
    n_kept = out.agg(F.sum("n_kept")).first()[0]
    # kept total == number of distinct normalized fingerprints
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_fp = d.select(
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ").cast("binary"))
    ).distinct().count()
    assert n_kept == n_fp


def test_corpus_mix_priority_order(spark):
    rows = [
        (1, "en", "web", "same text"),
        (2, "en", "curated", "same text"),
        (3, "en", "synthetic", "same text"),
        (4, "en", "synthetic", "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string, text string")
    import kinesis2elastic_spark.operators.corpus as c

    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").cast("binary"))
    prio = (
        F.when(F.col("source") == "curated", 0)
        .when(F.col("source") == "web", 1)
        .otherwise(2)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("fingerprint").orderBy("priority", "doc_id")
    kept = (
        df.select("doc_id", "source", fp.alias("fingerprint"), prio.alias("priority"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    got = {r.doc_id: r.source for r in kept.collect()}
    assert got == {2: "curated", 4: "synthetic"}  # curated wins the dup


def test_seq_pack_invariants(spark, sf_dir):
    rows = corpus.q_seq_pack(spark, sf_dir).collect()
    by_pack: dict[tuple, list] = {}
    for r in rows:
        by_pack.setdefault((r.lang, r.pack_id), []).append(r)
    assert by_pack
    for (lang, pid), docs in by_pack.items():
        docs.sort(key=lambda r: r.doc_id)
        total = sum(r.n_tokens for r in docs)
        # budget respected unless a single oversized doc owns the pack
        assert total <= corpus.PACK_BUDGET or len(docs) == 1
        # offsets are the running sum in doc_id order
        run = 0
        for r in docs:
            assert r.pack_offset == run
            run += r.n_tokens
    # greedy: packing is contiguous in doc_id order within each lang
    for lang in {l for l, _ in by_pack}:
        seq = sorted((r.doc_id, r.pack_id) for r in rows if r.lang == lang)
        pids = [p for _, p in seq]
        assert pids == sorted(pids)  # pack ids never decrease along doc order


def test_quality_filter_partitions_all_docs(spark, sf_dir):
    out = corpus.q_quality_filter(spark, sf_dir)
    total = out.agg(F.sum("n")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    verdicts = {r.verdict for r in out.select("verdict").distinct().collect()}
    assert verdicts <= {"kept", "dropped_short", "dropped_lowq"}
