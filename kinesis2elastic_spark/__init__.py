"""kinesis2elastic_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Moulick/kinesis2elastic, rebuilt
Spark-first (not ported).

The reference (/root/reference, ~900 LoC Go + OpenSearch ingest pipelines) is
a Kinesis Firehose HTTP endpoint that decodes base64+gzip CloudWatch Logs
envelopes, explodes logEvents into documents, and bulk-indexes them into
OpenSearch where ingest pipelines (grok / uri_parts / set / rename / date /
geoip / painless) do field-level parsing.  Here that becomes:

- ``schemas``            envelope/payload/document StructTypes (SURVEY §1)
- ``operators.decode``   unbase64 → gunzip → from_json → explode chain (A8-A15)
- ``operators.pipeline`` ingest-pipeline DSL interpreter (A17-A31)
- ``operators.grok``     grok-pattern → Java-regex compiler (A18)
- ``operators.relational`` general relational query surface (B1-B26)
- ``operators.llmops``   dedup / similarity / text analysis (B32-B35 + extras)
- ``operators.multimodal`` binary-column (image/audio) plumbing, stubbed codecs
- ``sources.firehose``   batch + streaming envelope readers
- ``sources.geoip``      broadcastable CIDR-range dimension (A28)
- ``streaming.windows``  watermark / tumble / slide / session / dedup (B27-B31)
- ``streaming.sink``     byte-capped, retrying, idempotent bulk writer (A5-A7)
- ``session``            tuned SparkSession factory

Everything is a pure ``DataFrame -> DataFrame`` transform so Catalyst can
optimize end-to-end; Python UDFs appear only where Spark has no built-in
(scalar gunzip, multimodal codecs) and are Arrow-vectorized.
"""

__version__ = "0.1.0"
