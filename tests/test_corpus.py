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
    rows = corpus.seq_pack_assignments(spark, sf_dir).collect()
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


def test_pii_redact_scrubs_everything(spark, sf_dir):
    out = corpus.q_pii_redact(spark, sf_dir)
    # every synthesized record carries exactly one of each PII kind ...
    counts = out.agg(
        F.min("n_emails"), F.max("n_emails"),
        F.min("n_phones"), F.max("n_phones"),
        F.min("n_ips"), F.max("n_ips"),
    ).first()
    assert tuple(counts) == (1, 1, 1, 1, 1, 1)
    # ... and no raw pattern survives redaction
    leftover = out.filter(
        F.col("redacted").rlike(corpus.PII_EMAIL)
        | F.col("redacted").rlike(corpus.PII_PHONE)
        | F.col("redacted").rlike(corpus.PII_IP)
    ).count()
    assert leftover == 0
    assert out.filter(~F.col("redacted").contains("<EMAIL>")).count() == 0


def test_decontam_flags_planted_overlap(spark):
    import kinesis2elastic_spark.operators.corpus as c

    # doc 0 (doc_id % BENCH_MOD == 0) is benchmark; doc 1 copies one of its
    # shingles verbatim, doc 2 shares nothing.
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text, "en", "web"),
        (1, "x y alpha beta gamma delta z w", "en", "web"),
        (2, "p q r s t u v", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    grams = df.select("doc_id", F.explode(c._word_ngrams(c.NGRAM_N)).alias("gram"))
    bench = grams.filter(F.col("doc_id") % c.BENCH_MOD == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % c.BENCH_MOD != 0)
    hits = {
        r.doc_id: r.n
        for r in train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n"))
        .collect()
    }
    assert hits == {1: 1}  # exactly the planted 4-gram, doc 2 clean


def test_repetition_stats_degenerate_doc(spark):
    rows = [
        (1, "spam spam spam spam", "en", "web"),   # 1 distinct word, 1 bigram
        (2, "a b c d", "en", "web"),               # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    import kinesis2elastic_spark.operators.corpus as c

    words = F.split("text", " ")
    base = df.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
    )
    bg = (
        df.select("doc_id", F.explode(c._word_ngrams(2)).alias("gram"))
        .groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("m"), F.sum("c").cast("long").alias("t"))
    )
    got = {
        r.doc_id: (r.n_distinct / r.n_tokens, r.m / r.t)
        for r in base.join(bg, "doc_id").collect()
    }
    assert got[1] == (0.25, 1.0)   # degenerate: one word, one repeated bigram
    assert got[2] == (1.0, 1.0 / 3)


def test_stratified_sample_exact_quota(spark, sf_dir):
    out = corpus.q_stratified_sample(spark, sf_dir).collect()
    per_lang = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rows in per_lang.items():
        assert len(rows) == corpus.STRATUM_QUOTA
        assert sorted(r.stratum_rank for r in rows) == list(
            range(1, corpus.STRATUM_QUOTA + 1)
        )


def test_stratified_sample_pre_prunes(spark, sf_dir):
    from kinesis2elastic_spark.plans.explain import assert_plan

    assert_plan(corpus.q_stratified_sample(spark, sf_dir), contains=("WindowGroupLimit",))


def test_embed_centroid_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)
    got = {(r.label, r.pos): r.avg_v for r in corpus.q_embed_centroid(spark, sf_dir).collect()}
    for label, vecs in by_label.items():
        M = np.array(vecs, dtype=np.float64)
        want = M.mean(axis=0)
        for pos in (1, len(want) // 2, len(want)):
            assert abs(got[(label, pos)] - round(float(want[pos - 1]), 6)) <= 1e-6


def test_doc_chunk_covers_text_with_overlap(spark, sf_dir):
    out = corpus.q_doc_chunk(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # reassembling chunk starts at stride spacing reproduces each text's length
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_id").alias("max_id"),
            F.sum(F.when(F.col("chunk_len") < corpus.CHUNK_LEN, 1).otherwise(0)).alias(
                "n_short"
            ),
        )
        .join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.n_chunks == r.max_id + 1  # contiguous chunk ids from 0
        assert r.n_chunks == (r.n - 1) // corpus.CHUNK_STRIDE + 1
        # only trailing chunks whose window runs past the text end may be
        # short: at most ceil(LEN/STRIDE) of them
        assert r.n_short <= -(-corpus.CHUNK_LEN // corpus.CHUNK_STRIDE)
    # consecutive chunks overlap by CHUNK_LEN - CHUNK_STRIDE chars
    two = (
        out.filter(F.col("chunk_id") <= 1)
        .groupBy("doc_id")
        .pivot("chunk_id", [0, 1])
        .agg(F.first("chunk"))
        .filter(F.col("1").isNotNull())
        .first()
    )
    ov = corpus.CHUNK_LEN - corpus.CHUNK_STRIDE
    assert two["0"][corpus.CHUNK_STRIDE:] == two["1"][:ov]


def test_tfidf_rare_term_outweighs_common(spark):
    rows = [
        (1, "apple apple apple zebra zebra zebra"),
        (2, "apple apple apple banana"),
        (3, "apple apple apple cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_t")
    import kinesis2elastic_spark.operators.corpus as c

    orig = c.load
    try:
        c.load = lambda spark, sf_dir, name: df
        out = {(r.doc_id, r.token): r.tfidf for r in c.q_tfidf(spark, "x").collect()}
    finally:
        c.load = orig
    # 'apple' appears in every doc -> idf = ln(1) = 0
    assert out[(1, "apple")] == 0.0
    # 'zebra' is unique to doc 1 with tf=3 -> 3 * ln(3)
    import math

    assert abs(out[(1, "zebra")] - round(3 * math.log(3), 4)) < 1e-9


def test_char_entropy_bounds(spark):
    rows = [(1, "aaaaaaaa"), (2, "abcdefgh")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import kinesis2elastic_spark.operators.corpus as c

    orig = c.load
    try:
        c.load = lambda spark, sf_dir, name: df
        out = {r.doc_id: r for r in c.q_char_entropy(spark, "x").collect()}
    finally:
        c.load = orig
    assert out[1].char_entropy == 0.0  # single repeated char
    import math

    assert abs(out[2].char_entropy - round(math.log(8), 4)) < 1e-9  # uniform
    assert out[2].n_distinct_chars == 8


def test_charlm_scores_gibberish_higher(spark, tmp_path):
    """A document of corpus-typical text must score a lower negative
    log-likelihood than line noise under the corpus-trained bigram
    model."""
    rows = [
        (1, "the cat sat on the mat and the dog sat on the log", "en", "web", 49),
        (2, "the man ran to the van and the fan was on the can", "en", "web", 49),
        (3, "qz xv jk wq zx kj qx vz jq kx zq xj", "en", "web", 35),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r.nll_score for r in corpus.q_charlm_score(spark, str(tmp_path)).collect()}
    assert out[3] > out[1] and out[3] > out[2]


def test_bloom_decontam_planted(spark, tmp_path):
    """Planted contamination: doc 53 is the benchmark (53 % 53 == 0);
    doc 1 shares a 4-gram with it verbatim, docs 2-3 do not.  The Bloom
    path must flag exactly the exact-path set (no false negatives by
    construction) and the summary flags must hold."""
    shared = "alpha beta gamma delta"
    rows = [
        (53, f"{shared} epsilon zeta", "en", "web", 28),
        (1, f"prefix words {shared} suffix", "en", "web", 33),
        (2, "totally unrelated content here now", "en", "web", 34),
        (3, "another clean document with words", "en", "web", 33),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = corpus.q_bloom_decontam(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_train_docs == 3
    assert r.n_exact_contaminated == 1
    assert r.no_false_negatives is True
    assert r.fp_ok is True


def test_heavy_hitters_matches_exact(spark, sf_dir):
    """The sketch-first path (per-batch candidates → exact recount) must
    return EXACTLY the plain groupBy-HAVING heavy hitters — the superset
    guarantee means candidate pruning can never lose a true heavy
    hitter, and the verify pass removes every false candidate."""
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.catalog import load

    got = {(r.token, r.freq) for r in corpus.q_heavy_hitters(spark, sf_dir).collect()}
    toks = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n_total = toks.count()
    exact = {
        (r.token, r.freq)
        for r in toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
        .filter(F.col("freq") > n_total / corpus.HH_CAPACITY)
        .collect()
    }
    assert got == exact and got


def test_inverted_index_caps_postings(spark, sf_dir):
    """Posting heads are capped (≤ 20 doc_ids), sorted ascending, and df
    counts distinct docs (≥ the emitted head length)."""
    rows = corpus.q_inverted_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert len(ids) <= 20
        assert ids == sorted(ids)
        assert r.df >= len(ids) and r.df >= 5


def test_bpe_train_hand_computed(spark, tmp_path):
    """BPE merge training on a corpus small enough to verify by hand:
    greedy left-to-right merge application and the (count desc, pair asc)
    tie-break must match the classic algorithm exactly."""
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "cd cd")],
        "doc_id bigint, text string",
    )
    sf = str(tmp_path / "bpe")
    docs.write.parquet(f"{sf}/documents.parquet")

    rows = [tuple(r) for r in corpus.q_bpe_train(spark, sf, n_rounds=3).collect()]
    # round 1: (a,b) appears 2x in each 'abab' (weight 2) + 1x in 'ab' = 5;
    #          (b,a) = 2; (c,d) = 2 -> winner (a,b,5)
    # round 2 after merge: 'abab'->[ab,ab] so (ab,ab)=2; (c,d)=2 ->
    #          tie on count, lexicographic pair order picks (ab,ab)
    # round 3: only (c,d)=2 remains
    assert rows == [
        (1, "a", "b", "ab", 5),
        (2, "ab", "ab", "abab", 2),
        (3, "c", "d", "cd", 2),
    ]


def test_bpe_train_matches_duckdb_unrolled(spark, tmp_path):
    """The unrolled-CTE oracle computes the identical merge table on the
    same corpus (the cross-engine contract the driver gate checks)."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "hello hello help"), (2, "world word ward"), (3, "held helm")],
        "doc_id bigint, text string",
    )
    sf = str(tmp_path / "bpe2")
    docs.write.parquet(f"{sf}/documents.parquet")

    got = sorted(tuple(r) for r in corpus.q_bpe_train(spark, sf, n_rounds=4).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(con.execute(corpus._bpe_oracle_sql(4)).fetchall())
    assert got == want


def test_bpe_encode_hand_computed(spark, tmp_path):
    """Encoding with the fitted merges, verified by hand on the same
    corpus as test_bpe_train_hand_computed: after 3 rounds the merges are
    (a,b)->ab, (ab,ab)->abab, (c,d)->cd, so 'abab'->1 token, 'ab'->1,
    'cd'->1; and the count is monotone non-increasing in rounds."""
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "cd cd")],
        "doc_id bigint, text string",
    )
    sf = str(tmp_path / "bpe_enc")
    docs.write.parquet(f"{sf}/documents.parquet")

    got = {r.doc_id: r for r in corpus.q_bpe_encode(spark, sf, n_rounds=3).collect()}
    assert (got[1].n_words, got[1].n_init_syms, got[1].n_bpe_tokens) == (3, 10, 3)
    assert (got[2].n_words, got[2].n_init_syms, got[2].n_bpe_tokens) == (2, 4, 2)

    # zero rounds = character tokenizer; more rounds never increase tokens
    got0 = {r.doc_id: r for r in corpus.q_bpe_encode(spark, sf, n_rounds=0).collect()}
    got1 = {r.doc_id: r for r in corpus.q_bpe_encode(spark, sf, n_rounds=1).collect()}
    for i in (1, 2):
        assert got0[i].n_bpe_tokens == got0[i].n_init_syms
        assert got1[i].n_bpe_tokens <= got0[i].n_bpe_tokens
        assert got[i].n_bpe_tokens <= got1[i].n_bpe_tokens


def test_source_drift_finds_planted_lift(spark, tmp_path):
    """A token exclusive to one source must surface as that source's
    top-lift row; shared tokens must show lift ~1 and never outrank it."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = (
        [(i, shared + " spamtoken spamtoken", "webA") for i in range(1, 7)]
        + [(i, shared, "webB") for i in range(7, 13)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sf = str(tmp_path / "drift")
    df.write.parquet(f"{sf}/documents.parquet")

    out = corpus.q_source_drift(spark, sf).collect()
    top = {r.source: r for r in out if r.rk == 1}
    assert top["webA"].token == "spamtoken"
    assert top["webA"].lift > 1.5
    # spamtoken appears ONLY in webA, so webB's best lift is a shared
    # token: corpus-share of shared tokens is below 1 for webB? No —
    # webB has no exclusive tokens, so its max lift is n/(n_s sum ratio)
    # of a shared token, all equal and > 1 (spamtoken dilutes webA).
    assert top["webB"].token != "spamtoken"
    for r in out:
        assert r.c_t >= corpus.DRIFT_MIN_DF


def test_split_leakage_detects_planted_leak(spark, tmp_path):
    """q_split_leakage on a corpus with one permutation-duplicate pair
    straddling the md5 split (doc 6 -> train side, doc 1 -> val side),
    one duplicate pair on the same side, and unique filler: exactly one
    leaking group of two docs is reported.  (The sf0.01 driver tier is
    legitimately leak-free, so the detection path is pinned here.)"""
    from kinesis2elastic_spark.operators.corpus import q_split_leakage

    rows = [
        (6, "alpha beta gamma delta"),       # md5('6') < '80' -> train
        (1, "delta gamma beta alpha"),       # md5('1') >= '80' -> val  (LEAK)
        (9, "one two three four"),           # train
        (11, "four three two one"),          # train (dup, same side -> no leak)
        (2, "unique text here entirely"),    # val, unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = q_split_leakage(spark, str(tmp_path)).first()
    assert (out.n_dup_groups, out.n_leaking_groups, out.n_docs_in_leaks) == (2, 1, 2)


def test_bench_artifact_caches_stay_bounded(spark):
    """r6 ADVICE: the per-(session, sf_dir) benchmark-artifact caches must
    evict prior keys (they pin localCheckpoint blocks / broadcast
    bitmaps) — a long-lived session screening many sf_dirs keeps exactly
    one artifact live."""
    from kinesis2elastic_spark.operators import corpus as c

    c._bench_shingle_set(spark, "/root/testdata/sf0.001")
    assert len(c._BENCH_SHINGLES) == 1
    c._bench_shingle_set(spark, "/root/testdata/sf0.01")
    assert len(c._BENCH_SHINGLES) == 1
    assert next(iter(c._BENCH_SHINGLES))[1] == "/root/testdata/sf0.01"


def test_importance_weights_planted_shift(spark, tmp_path):
    """B111 planted-shift property (r8, VERDICT r7 #4): a pool document
    drawn from the target's vocabulary must get a strictly higher DSIR
    weight (and the upweight flag) than one drawn from a disjoint
    vocabulary; and every hashed column must equal an independent pure-
    Python reimplementation (hashlib md5, exact integer micro-nats)."""
    import hashlib
    import math

    from kinesis2elastic_spark.operators.corpus import (
        DSIR_BUCKETS,
        DSIR_MICRO,
        q_importance_weights,
    )

    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["kappa", "sigma", "omega", "lambda", "theta"]

    def sent(vocab, seed, n=12):
        return " ".join(vocab[(seed * (i + 3) + i * i) % len(vocab)] for i in range(n))

    rows = []
    did = 0
    for s in range(8):            # target: en, vocab A
        rows.append((did, sent(vocab_a, s), "en", "tgt", 0)); did += 1
    for s in range(4):            # pool, target-like: vocab A
        rows.append((did, sent(vocab_a, s + 11), "fr", "poolA", 0)); did += 1
    for s in range(4):            # pool, off-target: vocab B
        rows.append((did, sent(vocab_b, s + 11), "zh", "poolB", 0)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: r for r in q_importance_weights(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(8, 16))  # pool docs only

    # independent reference: same featurization, model, quantization
    def grams(text):
        ws = text.split(" ")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % DSIR_BUCKETS

    t_f, r_f = {}, {}
    for doc_id, text, lang, _, _ in rows:
        for g in grams(text):
            cnt = t_f if lang == "en" else r_f
            b = bucket(g)
            cnt[b] = cnt.get(b, 0) + 1
    T = sum(t_f.values()) + DSIR_BUCKETS
    R = sum(r_f.values()) + DSIR_BUCKETS
    const = math.floor((math.log(R) - math.log(T)) * DSIR_MICRO + 0.5)

    for doc_id, text, lang, _, _ in rows:
        if lang == "en":
            continue
        gs = grams(text)
        w = sum(
            math.floor(
                (math.log(t_f.get(bucket(g), 0) + 1)
                 - math.log(r_f.get(bucket(g), 0) + 1)) * DSIR_MICRO + 0.5
            )
            for g in gs
        ) + len(gs) * const
        r = got[doc_id]
        assert r.n_grams == len(gs)
        assert r.sum_num == sum(t_f.get(bucket(g), 0) + 1 for g in gs)
        assert r.sum_den == sum(r_f.get(bucket(g), 0) + 1 for g in gs)
        assert r.w_micro == w, (doc_id, r.w_micro, w)
        assert r.is_upweighted == (w > 0)

    # the planted shift separates cleanly
    w_a = [got[i].w_micro for i in range(8, 12)]
    w_b = [got[i].w_micro for i in range(12, 16)]
    assert min(w_a) > max(w_b)
    assert all(got[i].is_upweighted for i in range(8, 12))
    assert not any(got[i].is_upweighted for i in range(12, 16))


def test_weighted_sample_matches_python_replication(spark, sf_dir):
    """The selected set is a pure function of the table: replicate the
    fixed-point priority key (u = 32-bit md5 prefix, key = u*2^20 // w)
    in pure Python over the raw parquet and demand set equality."""
    import hashlib

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    expected = sorted(
        (
            (int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) << 20)
            // max(r.n_chars, 1),
            r.doc_id,
        )
        for r in rows
    )[: corpus.WSAMPLE_K]
    got = corpus.q_weighted_sample(spark, sf_dir).collect()
    assert len(got) == min(corpus.WSAMPLE_K, len(rows))
    assert {(r.prio_key, r.doc_id) for r in got} == set(expected)


def test_weighted_sample_weight_monotone(spark, sf_dir):
    """Priority semantics: for the same u, a heavier doc gets a smaller
    key (more likely selected) — and selected docs skew heavier than the
    corpus average (u is uniform, so weight must carry the selection)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_avg = d.agg(F.avg("n_chars")).first()[0]
    sample = corpus.q_weighted_sample(spark, sf_dir)
    sample_avg = sample.agg(F.avg("w")).first()[0]
    assert sample_avg > corpus_avg


def test_top_p_mass_planted_cutoff(spark, tmp_path):
    """B121 boundary semantics: keep rows while the mass strictly before
    them is < 90% of the source total; the row crossing 90% is kept, the
    rest drop — including the exactly-at-90% edge."""
    rows = [
        # source a: weights 50/30/15/5 (total 100): keep 50,30,15; drop 5
        (1, "x", "en", "a", 50),
        (2, "x", "en", "a", 30),
        (3, "x", "en", "a", 15),
        (4, "x", "en", "a", 5),
        # source b: weights 9/1 (total 10): keep 9; the 1 starts at
        # exactly 90% prior mass -> dropped (strict <)
        (5, "x", "en", "b", 9),
        (6, "x", "en", "b", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = corpus.q_top_p_mass(spark, str(tmp_path))
    kept = {(r.source, r.doc_id) for r in out.collect()}
    assert kept == {("a", 1), ("a", 2), ("a", 3), ("b", 5)}


def test_collocations_planted_counts(spark, tmp_path, monkeypatch):
    """B134: exact unordered-pair doc-co-occurrence counts on a
    hand-computed corpus — dup tokens count once per doc, pairs are
    tok_a < tok_b, support-filtered, with correct doc frequencies."""
    monkeypatch.setattr(corpus, "COLLOC_MIN_SUPPORT", 2)
    rows = [
        (1, "a b c", "en", "s", 5),
        (2, "a b", "en", "s", 3),
        (3, "a c a", "en", "s", 5),
        (4, "b", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.tok_a, r.tok_b): (r.n_ab, r.df_a, r.df_b, r.n_docs)
        for r in corpus.q_collocations(spark, str(tmp_path)).collect()
    }
    # df: a=3 b=3 c=2; (a,b) docs {1,2}; (a,c) docs {1,3}; (b,c) doc {1}
    # falls below support
    assert out == {("a", "b"): (2, 3, 3, 4), ("a", "c"): (2, 3, 2, 4)}


def test_udtf_chunk_windows_exact(spark, tmp_path):
    """B160: the word-window UDTF emits ceil(n/stride) lateral rows per
    doc with exact window contents — incl. a short doc (one partial
    window), an exact-multiple doc, and empty text (no rows)."""
    from kinesis2elastic_spark.operators.relational_ext import (
        UDTF_CHUNK_STRIDE,
        UDTF_CHUNK_WORDS,
        q_udtf_chunk,
    )

    n = UDTF_CHUNK_WORDS + UDTF_CHUNK_STRIDE  # 70 words -> 3 windows
    long_doc = " ".join(f"w{i}" for i in range(n))
    docs = [
        (1, long_doc, "en", "s"),
        (2, "a b c", "en", "s"),   # one short window
        (3, "", "en", "s"),        # no rows
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = q_udtf_chunk(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    assert [(r.chunk_idx, r.n_chunk_words, r.first_word, r.last_word)
            for r in sorted(by_doc[2], key=lambda r: r.chunk_idx)] == [
        (0, 3, "a", "c")
    ]
    got1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.n_chunk_words) for r in got1] == [
        (0, UDTF_CHUNK_WORDS),
        (1, n - UDTF_CHUNK_STRIDE),
        (2, n - 2 * UDTF_CHUNK_STRIDE),
    ]
    assert got1[0].first_word == "w0"
    assert got1[0].last_word == f"w{UDTF_CHUNK_WORDS - 1}"
    assert got1[2].first_word == f"w{2 * UDTF_CHUNK_STRIDE}"
    assert got1[2].last_word == f"w{n - 1}"


def test_langid_planted_languages(spark, tmp_path):
    """B193: on a corpus with genuinely distinct character statistics
    the rank-profile classifier must be exact; training is supervised
    by the given lang column; prediction is deterministic (integer
    distances, lexicographic ties)."""
    from kinesis2elastic_spark.operators.corpus import (
        langid_predictions,
        langid_profiles,
    )

    def mk(word_pool, n, lang, start):
        return [
            (start + i, " ".join(word_pool[(i + j) % len(word_pool)] for j in range(30)), lang, "s", 0)
            for i in range(n)
        ]

    rows = (
        mk(["alpha", "beta", "gamma", "delta"], 8, "aa", 0)
        + mk(["zonk", "quux", "xyzzy", "wumpus"], 8, "bb", 100)
        + mk(["neun", "zehn", "elf", "zwoelf"], 8, "cc", 200)
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pred = langid_predictions(spark, str(tmp_path)).collect()
    assert len(pred) == 24
    assert all(r.pred == r.lang for r in pred)  # fully separable corpus
    # profiles: exactly 3 langs, ranks contiguous from 1, bounded depth
    prof = langid_profiles(spark, str(tmp_path)).collect()
    by_lang = {}
    for r in prof:
        by_lang.setdefault(r.lang, []).append(r.lrank)
    assert set(by_lang) == {"aa", "bb", "cc"}
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 64
    # determinism: a second run predicts identically
    pred2 = langid_predictions(spark, str(tmp_path)).collect()
    assert {(r.doc_id, r.pred) for r in pred} == {
        (r.doc_id, r.pred) for r in pred2
    }
