"""Decode-chain tests: golden fixture envelopes through decode_envelopes
(SURVEY §5 item 2), including the per-record dead-letter paths."""

import base64
import gzip
import json

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators.decode import build_envelopes, decode_envelopes
from kinesis2elastic_spark.schemas import FIREHOSE_ENVELOPE


def _payload(log_events, log_group="/aws/test/group"):
    return {
        "messageType": "DATA_MESSAGE",
        "owner": "111111111111",
        "logGroup": log_group,
        "logStream": "stream-0",
        "subscriptionFilters": ["all"],
        "logEvents": log_events,
    }


def _record(payload: dict) -> dict:
    return {"data": base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()}


def test_golden_flatten(spark):
    env = spark.createDataFrame(
        [
            (
                "req-1",
                1635622518652,
                [
                    _record(
                        _payload(
                            [
                                {"id": "e1", "timestamp": 1635622510000, "message": '{"level":"info","n":1}'},
                                {"id": "e2", "timestamp": 1635622511000, "message": "plain text line"},
                            ]
                        )
                    )
                ],
            )
        ],
        FIREHOSE_ENVELOPE,
    )
    rows = {r.eid: r for r in decode_envelopes(env).select(
        "requestId",
        "timestamp",
        F.col("record.data.logGroup").alias("lg"),
        F.col("record.data.logEvents.id").alias("eid"),
        F.col("record.data.logEvents.timestamp").alias("ets"),
        F.col("record.data.logEvents.message").alias("msg"),
        "error_message",
    ).collect()}
    # cardinality: one row per logEvent (main.go:492)
    assert set(rows) == {"e1", "e2"}
    # envelope time vs event time kept distinct (main.go:515 vs :526)
    assert rows["e1"].timestamp.isoformat().startswith("2021-10-30T19:35:18")
    assert rows["e1"].ets.isoformat().startswith("2021-10-30T19:35:10")
    # JSON message verbatim; text wrapped (main.go:494-510)
    assert json.loads(rows["e1"].msg) == {"level": "info", "n": 1}
    assert json.loads(rows["e2"].msg) == {"text": "plain text line"}
    assert rows["e1"].error_message is None


def test_dead_letter_per_record(spark):
    good = _record(_payload([{"id": "ok", "timestamp": 1, "message": "m"}]))
    cases = [
        good,
        {"data": base64.b64encode(b"not gzip").decode()},
        {"data": "!!!not base64!!!"},
        {"data": base64.b64encode(gzip.compress(b"{broken")).decode()},
        _record(_payload([])),
    ]
    env = spark.createDataFrame([("req-2", 1, cases)], FIREHOSE_ENVELOPE)
    out = decode_envelopes(env).select("error_message").collect()
    errs = sorted(r.error_message or "ok" for r in out)
    assert errs == sorted(
        ["ok", "gzip decompress failed", "base64 decode failed", "json parse failed", "no logEvents"]
    )


def test_build_envelopes_roundtrip(spark, sf_dir):
    env = build_envelopes(spark, sf_dir)
    docs = decode_envelopes(env)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    got = docs.count()
    assert got == n_events  # every synthesized logEvent decodes to one row
    assert docs.filter(F.col("error_message").isNotNull()).count() == 0


def test_row_lineage_multi_file(spark, sf_dir):
    """r8 (VERDICT r7 #6): q_row_lineage must exercise the per-file
    row_index RESTART — >=2 physical files, every event_type's rows
    spread across all of them, and the per-file min-rank check green."""
    from kinesis2elastic_spark.operators.decode import (
        N_LINEAGE_FILES,
        q_row_lineage,
    )

    rows = q_row_lineage(spark, sf_dir).collect()
    assert rows
    assert all(r.lineage_ok for r in rows), rows
    assert N_LINEAGE_FILES >= 2
    # events at any sf are far bigger than N files, so each type should
    # touch every file; at minimum the multi-file shape must be real
    assert max(r.n_files for r in rows) == N_LINEAGE_FILES, rows


def test_jsonl_roundtrip_adversarial_content(spark):
    """B113: the JSONL writer/reader pair must round-trip hostile text —
    embedded quotes, backslashes, real newlines/tabs (escaped in JSON,
    so one logical row stays one physical line), unicode, and the empty
    string — byte-for-byte.  Checked by comparing the operator's
    checksummed aggregate against the same aggregate computed directly
    on the in-memory original (no JSONL hop)."""
    from kinesis2elastic_spark.operators import decode as dc
    from pyspark.sql import functions as F

    texts = [
        'he said "hi" \\ and left',
        "line one\nline two\ttabbed",
        "emoji \U0001f600 and accents éèê",
        "",
        "trailing backslash \\",
        '{"looks": "like json"}',
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s%d" % (i % 2), len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = dc.load
    dc.load = lambda _s, _d, _t: df
    try:
        got = {
            (r.lang, r.source): (r.n, r.n_ids, r.sum_chars, r.text_checksum)
            for r in dc.q_jsonl_roundtrip(spark, "ignored").collect()
        }
    finally:
        dc.load = orig
    want = {
        (r.lang, r.source): (r.n, r.n_ids, r.sum_chars, r.text_checksum)
        for r in df.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").cast("long").alias("n_ids"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10
                ).cast("long")
            )
            .cast("long")
            .alias("text_checksum"),
        )
        .collect()
    }
    assert got == want
    # the physical file must hold exactly one line per logical row
    # (an unescaped newline would split a row and shift every count)
    assert sum(v[0] for v in got.values()) == len(texts)


def test_schema_evolution_null_fill_and_path_agreement(spark, sf_dir):
    """B120: old-vintage rows surface the evolved column as NULL in both
    read paths (mergeSchema and explicit union schema), counts line up
    with the %2 split, and the cross-path agreement flag holds."""
    from kinesis2elastic_spark.operators.decode import q_schema_evolution

    out = q_schema_evolution(spark, sf_dir).collect()
    assert out and all(r.paths_agree_ok for r in out)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {
        r.lang: (r.n, r.old)
        for r in d.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("old"),
        )
        .collect()
    }
    for r in out:
        n, old = per_lang[r.lang]
        assert r.n == n and r.n_old_vintage == old
        # every tagged row is new-vintage: tagged + old == total
        assert r.n_tagged + r.n_old_vintage == r.n


def test_variant_typed_extraction_adversarial(spark, tmp_path):
    """B129: Variant typed access — int extraction, missing path via
    try_variant_get (null, not error), nested object and unicode string
    round-trip through the binary encoding."""
    from kinesis2elastic_spark.operators.decode import q_variant_json

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 0.0, '{"k": 5}'),
        (2, "2024-01-01 00:00:01", 1, "click", 0.0, '{"k": -3, "extra": {"deep": "véry"}}'),
        (3, "2024-01-01 00:00:02", 1, "view", 0.0, '{"other": 1}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.event_type: r for r in q_variant_json(spark, str(tmp_path)).collect()}
    assert out["click"].sum_k == 2 and out["click"].n_k_present == 2
    assert out["view"].sum_k is None and out["view"].n_k_present == 0
    assert out["click"].n_absent_null == 2 and out["view"].n_absent_null == 1
