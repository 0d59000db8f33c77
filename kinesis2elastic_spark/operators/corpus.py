"""Training-corpus construction operators — the pipeline steps between a
raw document store and a training mix (beyond-the-reference surface, same
contract conventions as ``llmops.py``): deterministic sampling / splits,
priority-weighted corpus mixing, token-length histograms, quality-filter
accounting, and greedy sequence packing.

Scale notes (100 TB posture):
- sampling/splits hash the KEY, never sort or shuffle: a narrow projection
  + filter that pushes down to the scan — constant memory, no state;
- corpus mix dedups on a 16-byte fingerprint (the shuffle carries digests
  + a priority int, not documents);
- sequence packing is the one genuinely order-dependent operator:
  per-group ``applyInPandas`` where each group is one packing domain —
  domains pack independently, so parallelism = |domains| and state is one
  running counter per group, never global.

Engine-comparability: md5 hex strings are identical across engines, so
hash-derived buckets/splits compare exactly (lexicographic compare on the
hex works everywhere; no engine-specific hash or RNG in any oracle-checked
query).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load


def _doc_key(col):
    """Portable deterministic per-document hash key: lowercase md5 hex of
    the id rendered as a string (identical output in Spark and DuckDB)."""
    return F.md5(col.cast("string").cast("binary"))


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling + train/val split.  The classic
    rand()-based sample is non-reproducible and non-joinable; hashing the
    stable doc key gives a sample that is (a) reproducible across runs and
    engines, (b) consistent for the same doc across derived tables, and
    (c) a pure pushed-down filter — no shuffle, no state, any scale.

    Keeps md5(doc_id) < '28' (~2.5/16 = 15.6%); within the sample the
    first fifth of the keyspace ('08') is the validation split."""
    d = load(spark, sf_dir, "documents")
    key = _doc_key(F.col("doc_id"))
    return (
        d.withColumn("split_key", key)
        .filter(F.col("split_key") < "28")
        .select(
            "doc_id",
            "lang",
            "source",
            "split_key",
            F.when(F.col("split_key") < "08", "val").otherwise("train").alias("split"),
        )
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-weighted corpus mixing: when the same content appears in
    several sources, keep one copy from the highest-priority source
    (curated > web > synthetic here), then report the kept-mix per
    (source, lang).  The dedup key is a 16-byte fingerprint of normalized
    text — at corpus scale the shuffle carries (digest, priority, ids),
    never documents."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").cast("binary"))
    prio = (
        F.when(F.col("source") == "curated", 0)
        .when(F.col("source") == "web", 1)
        .otherwise(2)
    )
    w = W.partitionBy("fingerprint").orderBy("priority", "doc_id")
    kept = (
        d.select("doc_id", "lang", "source", fp.alias("fingerprint"), prio.alias("priority"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return kept.groupBy("source", "lang").agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").alias("min_doc_id"),
    )


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram per lang: fixed-width buckets of the
    whitespace token count (cap at bucket 20) — the standard corpus-shape
    diagnostic before choosing a packing/window budget.  One partial-agg
    shuffle on (lang, bucket)."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    # integer DIV, not float /: float division + cast would be truncation-
    # vs-floor-hazard territory across engines
    bucket = F.least(F.expr("CAST(size(split(text, ' ')) AS BIGINT) DIV 10"), F.lit(20).cast("long"))
    return (
        d.select("lang", bucket.alias("len_bucket"), n_tokens.alias("n_tokens"))
        .groupBy("lang", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter accounting: classify every document into
    kept / dropped_short / dropped_lowq with explicit thresholds and
    report counts per (lang, source, verdict).  The filter itself is a
    stateless projection (pushes to the scan); only the small accounting
    aggregate shuffles."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    stop = F.size(F.filter(words, lambda w: (w == "the") | (w == "a") | (w == "of"))).cast("long")
    stop_ratio = stop / n_words
    verdict = (
        F.when(n_words < 30, "dropped_short")
        .when(stop_ratio < 0.02, "dropped_lowq")
        .otherwise("kept")
    )
    return (
        d.select("lang", "source", verdict.alias("verdict"))
        .groupBy("lang", "source", "verdict")
        .agg(F.count("*").alias("n"))
    )


PACK_BUDGET = 512  # tokens per packed sequence (context-window stand-in)


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (rows-only: order-dependent scan): pack
    documents into fixed token budgets for training, per (lang) packing
    domain in deterministic doc_id order.  A pack closes when the next
    document would overflow ``PACK_BUDGET``; an oversized document gets a
    pack of its own.

    This is the canonical ``applyInPandas`` shape: each group is one
    independent packing domain, the kernel is a linear scan with one
    running counter, and the output carries (doc, pack, offset) — the
    shuffle moves token COUNTS, not text.  Exact-fit packing (bin
    packing) is NP-hard and order-destroying; greedy-in-key-order is the
    standard, deterministic practice."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, offsets = [], []
        pack_id, used = 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > PACK_BUDGET:
                pack_id += 1
                used = 0
            offsets.append(used)
            pack_ids.append(pack_id)
            used += n
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    return toks.groupBy("lang").applyInPandas(
        pack, "doc_id long, lang string, n_tokens long, pack_id long, pack_offset long"
    )


QUERIES = {
    "q_hash_sample": q_hash_sample,
    "q_corpus_mix": q_corpus_mix,
    "q_token_histogram": q_token_histogram,
    "q_quality_filter": q_quality_filter,
    "q_seq_pack": q_seq_pack,
}

ORACLE = {
    "q_hash_sample": """
        WITH k AS (SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS split_key
                   FROM documents)
        SELECT doc_id, lang, source, split_key,
               CASE WHEN split_key < '08' THEN 'val' ELSE 'train' END AS split
        FROM k WHERE split_key < '28'
    """,
    "q_corpus_mix": """
        WITH fp AS (
          SELECT doc_id, lang, source,
                 md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
                 CASE WHEN source = 'curated' THEN 0
                      WHEN source = 'web' THEN 1 ELSE 2 END AS priority
          FROM documents),
        kept AS (
          SELECT *, row_number() OVER (PARTITION BY fingerprint
                                       ORDER BY priority, doc_id) AS rn
          FROM fp)
        SELECT source, lang, count(*) AS n_kept, min(doc_id) AS min_doc_id
        FROM kept WHERE rn = 1 GROUP BY source, lang
    """,
    "q_token_histogram": """
        WITH t AS (SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
        SELECT lang, least(n_tokens // 10, 20) AS len_bucket,
               count(*) AS n_docs, round(avg(n_tokens), 4) AS avg_tokens
        FROM t GROUP BY lang, least(n_tokens // 10, 20)
    """,
    "q_quality_filter": """
        WITH s AS (
          SELECT lang, source,
                 len(string_split(text, ' ')) AS n_words,
                 CAST(len(list_filter(string_split(text, ' '),
                                      w -> w = 'the' OR w = 'a' OR w = 'of')) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
          FROM documents)
        SELECT lang, source,
               CASE WHEN n_words < 30 THEN 'dropped_short'
                    WHEN stop_ratio < 0.02 THEN 'dropped_lowq'
                    ELSE 'kept' END AS verdict,
               count(*) AS n
        FROM s GROUP BY 1, 2, 3
    """,
}

ROWS_ONLY = {"q_seq_pack"}
