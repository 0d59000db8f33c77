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


# ---------------------------------------------------------------------------
# In-sandbox end-to-end (r8, VERDICT r7 #2): HTTP delivery -> spool ->
# decode -> BulkSink -> a REAL localhost _bulk endpoint over the stdlib
# http_transport — the full reference dataflow (main.go:248-584) with no
# fake transport anywhere.
# ---------------------------------------------------------------------------

import base64
import gzip
import threading
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class _BulkStub:
    """Minimal OpenSearch `_bulk` endpoint (same stdlib-server pattern as
    sources/firehose.py:91).  Parses NDJSON action/doc pairs, indexes by
    `_id` into an in-memory store (so a replayed batch OVERWRITES — the
    idempotency the reference lacks, main.go:555-559), and records every
    request's path/query/auth/body for wire-format assertions."""

    def __init__(self, overload_first: int = 0):
        self.requests: list[dict] = []
        self.store: dict[str, dict] = {}
        # pending 503s: the stub plays an overloaded cluster for the first
        # N posts (A6 retry/backoff e2e — the reference's main.go:402-412)
        self.overload_left = overload_first
        self.n_overloads_served = 0
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                import json as _json

                if stub.overload_left > 0:
                    stub.overload_left -= 1
                    stub.n_overloads_served += 1
                    resp = b'{"error": "throttled"}'
                    self.send_response(503)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(resp)))
                    self.end_headers()
                    self.wfile.write(resp)
                    return
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                lines = [l for l in body.split(b"\n") if l]
                items = []
                for i in range(0, len(lines) - 1, 2):
                    action = _json.loads(lines[i])
                    doc = _json.loads(lines[i + 1])
                    _id = action["index"]["_id"]
                    stub.store[_id] = doc
                    items.append({"index": {"_id": _id, "status": 201}})
                stub.requests.append({
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "content_type": self.headers.get("Content-Type"),
                    "n_lines": len(lines),
                    "n_pairs": len(items),
                })
                resp = _json.dumps(
                    {"took": 1, "errors": False, "items": items}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        return self

    @property
    def url(self):
        return f"http://127.0.0.1:{self._server.server_port}"

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


def _unique_envelope(ids):
    payload = {
        "messageType": "DATA_MESSAGE",
        "owner": "1",
        "logGroup": "/aws/test",
        "logStream": "s",
        "subscriptionFilters": [],
        "logEvents": [
            {"id": i, "timestamp": 1635622510000, "message": f"msg {i}"}
            for i in ids
        ],
    }
    data = base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()
    return {"requestId": str(uuid.uuid4()), "timestamp": 1635622518652,
            "records": [{"data": data}]}


@pytest.mark.e2e
def test_e2e_firehose_to_bulk_endpoint(spark, tmp_path):
    from kinesis2elastic_spark.operators.decode import decode_envelopes
    from kinesis2elastic_spark.sources.firehose import FirehoseReceiver
    from kinesis2elastic_spark.sources.spool_source import FirehoseSpoolDataSource
    from kinesis2elastic_spark.streaming.sink import http_transport

    receiver = FirehoseReceiver(str(tmp_path / "spool")).start()
    stub = _BulkStub().start()
    try:
        # upstream at-least-once: envelope B is DELIVERED TWICE (Firehose
        # retry semantics — the reference's buffering contract)
        env_a = _unique_envelope(["ev-a0", "ev-a1", "ev-a2"])
        env_b = _unique_envelope(["ev-b0", "ev-b1"])
        for body in (env_a, env_b, env_b):
            req = urllib.request.Request(
                receiver.url + "/firehose",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 200

        spark.dataSource.register(FirehoseSpoolDataSource)
        envelopes = (
            spark.read.format("firehose_spool")
            .option("path", receiver.spool_dir)
            .load()
        )
        docs = document_id(decode_envelopes(envelopes))
        assert docs.count() == 7  # 3 + 2x2 decoded rows (dupes still present)

        sink = BulkSink(
            stub.url, "logs", http_transport, auth_b64="dXNlcjpwYXNz"
        )
        results = sink.write_batch(docs, epoch_id=0)
        assert results and all(r["status"] == 200 for r in results)
        assert all(not r["errors"] for r in results)

        # wire format: action/doc NDJSON pairs, pipeline param, basic auth
        assert stub.requests
        for r in stub.requests:
            assert r["path"].startswith("/logs/_bulk")
            assert "pipeline=one-pipeline-to-rule-them-all" in r["path"]
            assert r["auth"] == "Basic dXNlcjpwYXNz"
            assert r["content_type"] == "application/x-ndjson"
            assert r["n_lines"] == 2 * r["n_pairs"]
        assert sum(r["n_pairs"] for r in stub.requests) == 7  # at-least-once in

        # effectively-once out: deterministic _id collapses the redelivery
        expected_ids = {"ev-a0", "ev-a1", "ev-a2", "ev-b0", "ev-b1"}
        assert set(stub.store) == expected_ids
        msg = stub.store["ev-a1"]["record"]["data"]["logEvents"]["message"]
        # json-or-text fallback (A12) wraps plain text as {"text": ...}
        assert json.loads(msg) == {"text": "msg ev-a1"}

        # replayed BATCH (sink-side retry after a lost ack): store unchanged
        n_reqs = len(stub.requests)
        sink.write_batch(docs, epoch_id=1)
        assert set(stub.store) == expected_ids
        assert len(stub.requests) > n_reqs  # it really re-posted
    finally:
        stub.stop()
        receiver.stop()


@pytest.mark.e2e
def test_e2e_retry_on_real_overload(spark, sf_dir):
    """A6 over a REAL wire: the stub answers 503 to the first two posts;
    post_with_retry inside the executor-side writer must back off and
    re-post until the store holds every document (no fake transport)."""
    from kinesis2elastic_spark.operators.decode import build_envelopes, decode_envelopes
    from kinesis2elastic_spark.streaming.sink import http_transport

    stub = _BulkStub(overload_first=2).start()
    try:
        docs = document_id(decode_envelopes(build_envelopes(spark, sf_dir)).limit(20))
        n_docs = docs.count()
        sink = BulkSink(stub.url, "logs", http_transport, flush_bytes=10**9)
        results = sink.write_batch(docs.coalesce(1), epoch_id=0)
        assert results and all(r["status"] == 200 for r in results)
        assert stub.n_overloads_served == 2  # the 503s really happened
        assert len(stub.store) == n_docs     # and every doc still landed
    finally:
        stub.stop()
