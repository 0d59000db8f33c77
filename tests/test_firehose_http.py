"""Firehose HTTP receiver tests: the reference's endpoint contract
(content-type guard, magic-byte sniff, encoding-mismatch tolerance, ack and
error bodies) + spool-to-stream integration + observe() metrics."""

import base64
import gzip
import json
import time
import urllib.error
import urllib.request
import uuid

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.metrics import CollectingListener, with_doc_metrics
from kinesis2elastic_spark.sources.firehose import FirehoseReceiver


def _envelope(n_events: int = 2) -> dict:
    payload = {
        "messageType": "DATA_MESSAGE",
        "owner": "1",
        "logGroup": "/aws/test",
        "logStream": "s",
        "subscriptionFilters": [],
        "logEvents": [
            {"id": f"e{i}", "timestamp": 1635622510000 + i, "message": f"msg {i}"}
            for i in range(n_events)
        ],
    }
    data = base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()
    return {"requestId": str(uuid.uuid4()), "timestamp": 1635622518652,
            "records": [{"data": data}]}


def _post(url, body: bytes, headers: dict):
    req = urllib.request.Request(url + "/firehose", data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def receiver(tmp_path):
    r = FirehoseReceiver(str(tmp_path / "spool")).start()
    yield r
    r.stop()


def test_ping(receiver):
    with urllib.request.urlopen(receiver.url + "/ping", timeout=10) as resp:
        assert json.loads(resp.read()) == {"message": "pong"}


def test_plain_json_delivery_acks(receiver):
    env = _envelope()
    status, body = _post(receiver.url, json.dumps(env).encode(),
                         {"Content-Type": "application/json",
                          "X-Amz-Firehose-Request-Id": "req-123"})
    assert status == 200
    assert body["requestId"] == "req-123"
    assert "timestamp" in body


def test_gzip_body_with_mismatched_header_tolerated(receiver):
    """main.go:271-273: body is gzip but Content-Encoding is absent —
    magic-byte sniffing must still decode it."""
    env = _envelope()
    gz = gzip.compress(json.dumps(env).encode())
    status, _ = _post(receiver.url, gz, {"Content-Type": "application/json"})
    assert status == 200


def test_wrong_content_type_rejected(receiver):
    status, body = _post(receiver.url, b"x", {"Content-Type": "text/plain"})
    assert status == 400
    assert "content type" in body["errorMessage"]


def test_corrupt_gzip_rejected_with_error_body(receiver):
    """Valid 0x1f8b magic but corrupt deflate stream: gzip.decompress
    raises zlib.error — the handler must still send the Firehose error
    body (errorMessage) so upstream redelivers, not die silently."""
    bad = b"\x1f\x8b" + b"\x00" * 40
    status, body = _post(receiver.url, bad, {"Content-Type": "application/json"})
    assert status == 400
    assert "requestId" in body and "errorMessage" in body


def test_invalid_envelope_rejected_with_error_body(receiver):
    status, body = _post(receiver.url, json.dumps({"nope": 1}).encode(),
                         {"Content-Type": "application/json"})
    assert status == 400
    assert "requestId" in body and "errorMessage" in body


def test_spool_feeds_stream_with_metrics(spark, receiver):
    """HTTP delivery → spool → file stream → decode → observe() counters."""
    for _ in range(3):
        _post(receiver.url, json.dumps(_envelope()).encode(),
              {"Content-Type": "application/json"})

    from kinesis2elastic_spark.operators.decode import decode_envelopes
    from kinesis2elastic_spark.streaming import windows as sw

    listener = CollectingListener()
    spark.streams.addListener(listener)
    try:
        stream = sw.stream_envelopes(spark, receiver.spool_dir)
        docs = with_doc_metrics(decode_envelopes(stream))
        name = f"fh_{uuid.uuid4().hex[:8]}"
        sw.run_to_memory_sink(docs.select("requestId", "error_message"), name)
        out = spark.sql(f"SELECT * FROM {name}")
        assert out.count() == 6  # 3 envelopes x 2 logEvents
        assert out.filter(F.col("error_message").isNotNull()).count() == 0
        # listener progress events are delivered on an async bus — under
        # a loaded suite they can trail the drain by seconds, so poll
        # with a bounded wait instead of asserting instantly (one
        # observed flake at full-suite load, 2026-08: empty progress)
        deadline = time.time() + 30
        while time.time() < deadline:
            batches = [p for p in listener.progress if p["numInputRows"] > 0]
            if batches:
                break
            time.sleep(0.5)
        assert batches and sum(p["observed"]["n_docs"] for p in batches if p["observed"]) == 6
        assert all(p["observed"]["n_errors"] == 0 for p in batches if p["observed"])
    finally:
        spark.streams.removeListener(listener)


def test_metrics_endpoint_scrapeable(receiver):
    """A32: /metrics serves Prometheus text exposition (main.go:215-217)
    with request + spool counters reflecting the traffic served."""
    _post(receiver.url, json.dumps(_envelope()).encode(),
          {"Content-Type": "application/json"})
    _post(receiver.url, b"x", {"Content-Type": "text/plain"})  # a 400
    with urllib.request.urlopen(receiver.url + "/metrics", timeout=10) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/plain")
        body = resp.read().decode()
    assert '# TYPE k2e_http_requests_total counter' in body
    assert 'k2e_http_requests_total{path="/firehose",status="200"} 1' in body
    assert 'k2e_http_requests_total{path="/firehose",status="400"} 1' in body
    assert 'k2e_records_spooled_total 1' in body


def test_metrics_counts_404_and_scrapes(receiver):
    """Every request is observed (like the reference's gin middleware):
    404s and the /metrics scrape itself appear in the counter."""
    try:
        urllib.request.urlopen(receiver.url + "/nope", timeout=10)
    except urllib.error.HTTPError as e:
        assert e.code == 404
    with urllib.request.urlopen(receiver.url + "/metrics", timeout=10):
        pass
    with urllib.request.urlopen(receiver.url + "/metrics", timeout=10) as resp:
        body = resp.read().decode()
    assert 'k2e_http_requests_total{path="/nope",status="404"} 1' in body
    # the scrape increments before rendering, so the second scrape shows 2
    assert 'k2e_http_requests_total{path="/metrics",status="200"} 2' in body


def test_registry_label_escaping_and_gauge_type():
    """Exposition-format hardening: label values with quotes, backslashes
    and newlines are escaped; set() metrics render as gauge."""
    from kinesis2elastic_spark.metrics import MetricsRegistry

    reg = MetricsRegistry()
    reg.inc("k2e_test_total", {"path": 'a"b\\c\nd'})
    reg.set("k2e_test_level", 3.5)
    body = reg.render()
    assert 'k2e_test_total{path="a\\"b\\\\c\\nd"} 1' in body
    assert "# TYPE k2e_test_level gauge" in body
    assert "# TYPE k2e_test_total counter" in body


def test_listener_publishes_to_registry():
    """CollectingListener + MetricsRegistry: per-batch doc counters land on
    the same scrape surface the receiver serves."""
    from kinesis2elastic_spark.metrics import MetricsRegistry

    reg = MetricsRegistry()
    listener = CollectingListener(registry=reg)

    class _Obs:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return dict(self._d)

    class _Progress:
        batchId = 0
        numInputRows = 4
        observedMetrics = {"doc_metrics": _Obs({"n_docs": 4, "n_ok": 3, "n_errors": 1})}

    class _Event:
        progress = _Progress()

    listener.onQueryProgress(_Event())
    assert reg.value("k2e_docs_total") == 4
    assert reg.value("k2e_docs_ok_total") == 3
    assert reg.value("k2e_doc_errors_total") == 1
    assert "k2e_docs_total 4" in reg.render()
