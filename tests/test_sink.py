"""Bulk-sink tests: byte-capped chunking, retry/backoff, idempotent _id,
partition-parallel write with a fake transport."""

import json

from pyspark.sql import functions as F

from kinesis2elastic_spark.streaming.sink import (
    BulkSink,
    document_id,
    make_bulk_chunks,
    post_with_retry,
)


def test_chunking_respects_byte_cap():
    docs = [(f"id{i}", json.dumps({"x": "a" * 100})) for i in range(100)]
    chunks = list(make_bulk_chunks(iter(docs), flush_bytes=1000))
    assert len(chunks) > 1
    assert all(len(body) <= 1200 for body, _ in chunks)  # cap + one doc tolerance
    # every doc present exactly once across chunks
    assert sum(n for _, n in chunks) == 100
    assert b"".join(body for body, _ in chunks).count(b'{"index"') == 100


def test_single_oversized_doc_still_ships():
    docs = [("big", json.dumps({"x": "a" * 10000}))]
    chunks = list(make_bulk_chunks(iter(docs), flush_bytes=100))
    assert len(chunks) == 1
    assert chunks[0][1] == 1


def test_item_count_ignores_index_substring_in_docs():
    """A document whose own JSON contains {"index" (e.g. a nested object
    whose first field is named "index") must not inflate the per-chunk item
    count — counts come from packing, not body scanning."""
    docs = [("a", json.dumps({"outer": {"index": 1}}, separators=(",", ":")))]
    (body, n_items), = make_bulk_chunks(iter(docs))
    assert body.count(b'{"index"') == 2  # the action line AND the payload
    assert n_items == 1


def test_retry_backoff_on_overload():
    calls = []
    statuses = iter([503, 429, 200])

    def transport(url, body, headers):
        s = next(statuses)
        calls.append(s)
        return s, {"errors": False}

    sleeps = []
    status, _ = post_with_retry(transport, "u", b"", {}, sleep=sleeps.append)
    assert status == 200
    assert calls == [503, 429, 200]
    assert sleeps == [0.1, 0.2]  # exponential


def test_no_retry_on_client_error():
    def transport(url, body, headers):
        return 400, {"errors": True}

    status, _ = post_with_retry(transport, "u", b"", {}, sleep=lambda s: None)
    assert status == 400


def test_write_batch_idempotent_ids(spark, sf_dir):
    from kinesis2elastic_spark.operators.decode import build_envelopes, decode_envelopes

    docs = decode_envelopes(build_envelopes(spark, sf_dir)).limit(50)
    with_id = document_id(docs)
    ids1 = sorted(r._id for r in with_id.select("_id").collect())
    ids2 = sorted(r._id for r in with_id.select("_id").collect())
    assert ids1 == ids2  # deterministic across runs (effectively-once key)
    assert len(set(ids1)) == len(ids1)

    def transport(url, body, headers):
        return 200, {"errors": False}

    sink = BulkSink("http://fake:9200", "logs", transport, auth_b64="dXNlcjpwYXNz")
    results = sink.write_batch(with_id.select("_id", "requestId", "timestamp", "error_message"), 0)
    assert sum(r["n_items"] for r in results) == 50
    assert all(r["status"] == 200 for r in results)


def test_write_partition_wire_format():
    """Driver-side: exact bulk URL, auth header, and NDJSON action lines
    (transport capture can't cross the executor process boundary)."""
    seen = []

    def transport(url, body, headers):
        seen.append((url, body, headers))
        return 200, {"errors": False}

    sink = BulkSink("http://fake:9200", "logs", transport, auth_b64="dXNlcjpwYXNz")
    rows = [{"_id": f"id{i}", "doc_json": json.dumps({"n": i})} for i in range(3)]
    results = list(sink.write_partition(iter(rows)))
    assert sum(r["n_items"] for r in results) == 3
    url, body, headers = seen[0]
    assert url.endswith("/logs/_bulk?pipeline=one-pipeline-to-rule-them-all")  # main.go:437,144
    assert headers["Authorization"] == "Basic dXNlcjpwYXNz"  # main.go:321-323
    first_action = json.loads(body.split(b"\n")[0])
    assert first_action["index"]["_id"] == "id0"


def test_null_fields_stripped_at_serialization(spark):
    """A30: the recursive null-scrub equals to_json's null omission."""
    df = spark.createDataFrame([(1, None, "x")], "a bigint, b string, c string")
    sink_doc = df.select(F.to_json(F.struct("a", "b", "c")).alias("j")).first().j
    assert json.loads(sink_doc) == {"a": 1, "c": "x"}  # b omitted
