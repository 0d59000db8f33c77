"""Firehose HTTP endpoint surface (SURVEY §2 A1-A4, A7).

The reference is an HTTP service: Firehose POSTs batched envelopes to
``/firehose`` and expects an ack body (main.go:248-365).  In a Spark-first
architecture the HTTP hop and the processing engine are decoupled: this
receiver validates/decodes exactly like the reference and **spools each
envelope as a JSON file**, which `streaming.windows.stream_envelopes`
consumes as a file stream — mirroring the reference deployment where
Firehose also writes every envelope to S3 (`S3BackupMode: AllData`,
cloudformation-template.yaml:162-171) and a replay reads the backup.

Reference semantics reproduced:

- ``GET /ping`` → ``{"message": "pong"}`` (main.go:220-224);
- Content-Type must be application/json → else 400 (main.go:79-81);
- gzip detection by MAGIC BYTES (0x1f8b), not the header; a wrong/missing
  Content-Encoding with a really-gzipped body is tolerated
  (errEncodingMismatch fallback, main.go:74-121, 271-273);
- envelope must decode as FirehoseRequest {requestId, timestamp, records[]}
  → else 400 with a Firehose error body;
- ack = ``{"requestId": ..., "timestamp": <epoch-ms>}`` on 200; error body
  carries ``errorMessage`` so Firehose redelivers (main.go:56-69);
- ``X-Amz-Firehose-Request-Id`` (lineage) and ``X-Amz-Firehose-Access-Key``
  (sink auth passthrough) headers are captured per request
  (main.go:260-266, 321-323).

At scale the spool directory is object storage; receivers are stateless and
scale horizontally exactly like the reference's k8s Deployment (replicas,
deploy/manifest.yaml:53); the Spark streaming job is the single consumer.
"""

from __future__ import annotations

import gzip
import json
import os
import threading
import time
import uuid
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

GZIP_MAGIC = b"\x1f\x8b"


def detect_and_decode(body: bytes, content_type: str | None) -> bytes:
    """A3: content-type guard + magic-byte sniff (main.go:74-121)."""
    if content_type is None or "application/json" not in content_type:
        raise ValueError(f"unsupported content type {content_type!r}")
    if body[:2] == GZIP_MAGIC:  # trust the bytes, not the header
        return gzip.decompress(body)
    return body


def validate_envelope(payload: bytes) -> dict:
    """A4: JSON decode + shape validation (gzipbinding/binding.go:38-62)."""
    env = json.loads(payload)
    if not isinstance(env, dict):
        raise ValueError("envelope is not an object")
    for field in ("requestId", "timestamp", "records"):
        if field not in env:
            raise ValueError(f"envelope missing field {field!r}")
    if not isinstance(env["records"], list):
        raise ValueError("records is not an array")
    for r in env["records"]:
        if "data" not in r:
            raise ValueError("record missing field 'data'")
    return env


class FirehoseReceiver:
    """Threaded HTTP receiver spooling validated envelopes to JSON files."""

    def __init__(self, spool_dir: str, port: int = 0, logger=None, registry=None):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.logger = logger  # A33: StructuredLogger or None
        if registry is None:
            from kinesis2elastic_spark.metrics import MetricsRegistry

            registry = MetricsRegistry()
        self.registry = registry  # A32: /metrics scrape surface
        registry.describe(
            "k2e_http_requests_total", "HTTP requests by path and status"
        )
        registry.describe(
            "k2e_records_spooled_total", "Firehose records accepted and spooled"
        )
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _respond(self, status: int, body: dict):
                data = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/ping":  # A2 (main.go:220-224)
                    receiver.registry.inc(
                        "k2e_http_requests_total", {"path": "/ping", "status": "200"}
                    )
                    self._respond(200, {"message": "pong"})
                elif self.path == "/metrics":  # A32 (main.go:215-217)
                    # the scrape itself is observed too — the reference's
                    # gin middleware records every request, not just the
                    # ingestion endpoints
                    receiver.registry.inc(
                        "k2e_http_requests_total",
                        {"path": "/metrics", "status": "200"},
                    )
                    body = receiver.registry.render().encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    receiver.registry.inc(
                        "k2e_http_requests_total",
                        {"path": self.path, "status": "404"},
                    )
                    self._respond(404, {"errorMessage": "not found"})

            def do_POST(self):
                req_id = self.headers.get("X-Amz-Firehose-Request-Id", str(uuid.uuid4()))
                now_ms = int(time.time() * 1000)
                # A33: request-scoped structured logger (main.go:151-197)
                log = receiver.logger.bind(requestId=req_id) if receiver.logger else None
                if self.path != "/firehose":
                    receiver.registry.inc(
                        "k2e_http_requests_total",
                        {"path": self.path, "status": "404"},
                    )
                    self._respond(404, {"requestId": req_id, "timestamp": now_ms,
                                        "errorMessage": "not found"})
                    return
                body = b""
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n)
                    payload = detect_and_decode(body, self.headers.get("Content-Type"))
                    env = validate_envelope(payload)
                except (ValueError, json.JSONDecodeError, OSError, EOFError, zlib.error) as e:
                    # EOFError: truncated gzip stream; zlib.error: valid gzip
                    # magic but corrupt deflate data (gzip.decompress)
                    # Firehose error body → upstream retry (main.go:56-69)
                    if log:
                        log.error("request_rejected", reason=str(e), n_bytes=len(body))
                    receiver.registry.inc(
                        "k2e_http_requests_total", {"path": "/firehose", "status": "400"}
                    )
                    self._respond(400, {"requestId": req_id, "timestamp": now_ms,
                                        "errorMessage": str(e)})
                    return
                env["_receiver"] = {
                    "firehoseRequestId": req_id,
                    "accessKey": self.headers.get("X-Amz-Firehose-Access-Key"),
                }
                receiver._spool(env)
                if log:
                    log.info("request_spooled", n_records=len(env["records"]))
                receiver.registry.inc(
                    "k2e_http_requests_total", {"path": "/firehose", "status": "200"}
                )
                receiver.registry.inc(
                    "k2e_records_spooled_total", amount=len(env["records"])
                )
                self._respond(200, {"requestId": req_id, "timestamp": now_ms})

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_port
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def _spool(self, env: dict) -> None:
        """One envelope per file, atomic rename so the file stream never
        sees partial writes (micro-batch boundary = file boundary)."""
        name = f"{env.get('requestId', uuid.uuid4())}-{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(env, f)
        os.replace(tmp, os.path.join(self.spool_dir, name))

    def start(self) -> "FirehoseReceiver":
        self._thread.start()
        return self

    def stop(self) -> None:
        """A34: graceful shutdown — stop accepting, drain handler threads
        (the reference drains for 30 s, main.go:380-396)."""
        self._server.shutdown()
        self._server.server_close()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"
