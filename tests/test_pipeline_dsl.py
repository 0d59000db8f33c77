"""Pipeline-DSL interpreter tests: an independently-authored spec with the
same processor semantics as the reference chain, plus (when the read-only
reference checkout is present) the reference's literal JSON configs."""

import json
import os

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.operators.pipeline_dsl import PipelineInterpreter, parse_condition
from kinesis2elastic_spark.sources.geoip import synthetic_geoip_dim

GOOD = (
    'gw01.example.com - jdoe [13/Aug/2026:10:15:32 +0000]  '
    '"GET /api/v1/items.json?q=x HTTP/1.1" 200 512 42 "10.50.1.1,10.0.0.1" '
    "client-42 txn-9f2 corr-77a1"
)
BAD_STATUS = GOOD.replace(" 200 ", " 503 ")
GARBAGE = "GARBAGE NOT A LOG LINE"

# Same semantics as ingest/axway-ingest.json, written from the operator
# inventory (SURVEY §2 A17-A31), not copied.
SPEC = {
    "route": {
        "processors": [
            {
                "pipeline": {
                    "name": "enrich",
                    "if": "ctx.records?.data?.logGroup =~ /axway/",
                }
            }
        ]
    },
    "enrich": {
        "processors": [
            {
                "grok": {
                    "field": "records.data.logEvents.message.text",
                    "patterns": [
                        "%{HOSTNAME:remote.host} - %{HTTPDUSER:user.name} "
                        "\\[%{HTTPDATE:apache.access.time}\\]  "
                        '"(?:%{WORD:http.request.method} %{DATA:_tmp.url_orig} '
                        'HTTP/%{NUMBER:http.version}|-)?" '
                        "%{NUMBER:http.response.status_code:long} "
                        "(?:%{NUMBER:http.response.body.bytes:long}|-) "
                        '%{NUMBER:http.response.time:long} '
                        '"(?<x_forwarded_for>%{IP:source.address}(?:,[^,]+)*)" '
                        "%{DATA:hc.request.clientid} (%{DATA:hc.transactionid}|-) "
                        "%{GREEDYDATA:hc.correlationid}"
                    ],
                    "ignore_missing": True,
                }
            },
            {"uri_parts": {"field": "_tmp.url_orig"}},
            {"remove": {"field": ["_tmp.url_orig"], "ignore_missing": True}},
            {"set": {"field": "event.kind", "value": "event"}},
            {
                "set": {
                    "field": "event.outcome",
                    "value": "success",
                    "if": "ctx?.http?.response?.status_code != null && ctx.http.response.status_code < 400",
                }
            },
            {
                "set": {
                    "field": "event.outcome",
                    "value": "failure",
                    "if": "ctx?.http?.response?.status_code != null && ctx.http.response.status_code > 399",
                }
            },
            {"set": {"copy_from": "@timestamp", "field": "event.created"}},
            {
                "date": {
                    "field": "apache.access.time",
                    "target_field": "@timestamp",
                    "formats": ["dd/MMM/yyyy:H:m:s Z"],
                    "ignore_failure": True,
                }
            },
            {"remove": {"field": "apache.access.time", "ignore_failure": True}},
            {"grok": {"field": "source.address", "ignore_missing": True,
                      "patterns": ["^(%{IP:source.ip}|%{HOSTNAME:source.domain})$"]}},
            {"geoip": {"field": "source.ip", "target_field": "source.geo", "ignore_missing": True}},
            {"geoip": {"field": "source.ip", "target_field": "source.as",
                       "properties": ["asn", "organization_name"], "ignore_missing": True}},
            {"rename": {"field": "source.as.asn", "target_field": "source.as.number",
                        "ignore_missing": True}},
        ],
        "on_failure": [
            {"set": {"field": "error.message", "value": "{{ _ingest.on_failure_message }}"}}
        ],
    },
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "/aws/axway/gateway", GOOD, "2021-10-30 19:35:18"),
        (2, "/aws/axway/gateway", BAD_STATUS, "2021-10-30 19:35:18"),
        (3, "/aws/axway/gateway", GARBAGE, "2021-10-30 19:35:18"),
        (4, "/aws/other/app", GOOD, "2021-10-30 19:35:18"),
    ]
    df = spark.createDataFrame(rows, "id bigint, lg string, msg string, ts string")
    return df.select(
        "id",
        F.col("lg").alias("records.data.logGroup"),
        F.col("msg").alias("records.data.logEvents.message.text"),
        F.col("ts").cast("timestamp").alias("@timestamp"),
    )


@pytest.fixture(scope="module")
def result(spark, docs):
    interp = PipelineInterpreter(SPEC, geoip_dim=synthetic_geoip_dim(spark))
    out = interp.run(docs, "route")
    return {r.id: r.asDict() for r in out.collect()}


def test_enriched_good_line(result):
    r = result[1]
    assert r["http.response.status_code"] == 200
    assert r["event.outcome"] == "success"
    assert r["url.path"] == "/api/v1/items.json"
    assert r["url.extension"] == "json"
    assert r["source.ip"] == "10.50.1.1"
    assert r["source.geo.country_iso_code"] == "US"
    assert r["source.as.number"] == 64500
    assert r["event.created"].year == 2021   # copied BEFORE promotion
    assert r["@timestamp"].year == 2026      # promoted to access time
    assert r["error.message"] is None


def test_failure_branch(result):
    r = result[2]
    assert r["event.outcome"] == "failure"


def test_grok_miss_dead_letters_and_skips_rest(result):
    r = result[3]
    assert r["error.message"] and "grok" in r["error.message"]
    assert r["http.response.status_code"] is None
    assert r["event.outcome"] is None
    assert r["@timestamp"].year == 2021      # not promoted on failure


def test_non_axway_passthrough(result):
    r = result[4]
    assert r["records.data.logGroup"] == "/aws/other/app"
    assert r["http.response.status_code"] is None
    assert r["event.kind"] is None
    assert r["@timestamp"].year == 2021


def test_condition_parser_rejects_unknown():
    with pytest.raises(ValueError):
        parse_condition("ctx.x ** 2 == 4", ["x"])


REF_DIR = "/root/reference/ingest"


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference checkout not present")
def test_reference_literal_configs_execute(spark, docs):
    """The interpreter must run the reference's UNMODIFIED pipeline JSON
    (loaded at test time from the read-only checkout — never copied into
    this repo)."""
    with open(f"{REF_DIR}/one-pipeline-to-rule-them-all.json") as f:
        route = json.load(f)
    with open(f"{REF_DIR}/axway-ingest.json") as f:
        axway = json.load(f)
    interp = PipelineInterpreter(
        {"one-pipeline-to-rule-them-all": route, "axway-ingest": axway},
        geoip_dim=synthetic_geoip_dim(spark),
    )
    out = {r.id: r.asDict() for r in interp.run(docs, "one-pipeline-to-rule-them-all").collect()}
    assert out[1]["http.response.status_code"] == 200
    assert out[1]["event.outcome"] == "success"
    assert out[1]["source.as.number"] == 64500
    assert out[2]["event.outcome"] == "failure"
    assert out[3]["error.message"] is not None
    assert out[4]["event.kind"] is None  # non-axway untouched


def test_non_axway_pipeline_with_standard_patterns(spark):
    """A user-authored syslog pipeline (not the reference's Axway chain)
    compiles and runs through the interpreter using the standard grok
    base-pattern table added in r3 — the breadth the reference gets for
    free from OpenSearch's stock pattern library."""
    spec = {
        "syslog": {
            "processors": [
                {
                    "grok": {
                        "field": "message",
                        "patterns": [
                            "%{SYSLOGTIMESTAMP:system.timestamp} "
                            "%{IPORHOST:host.name} "
                            "%{PROG:process.name}(?:\\[%{POSINT:process.pid:long}\\])?: "
                            "%{GREEDYDATA:system.message}"
                        ],
                    }
                },
                {
                    "set": {
                        "field": "event.kind",
                        "value": "event",
                        "if": "ctx.process?.pid != null",
                    }
                },
            ],
            "on_failure": [
                {"set": {"field": "error.message", "value": "syslog grok failed"}}
            ],
        }
    }
    rows = [
        ("Oct 11 22:14:15 web01.example.com sshd[4721]: Failed password for root",),
        ("Oct 12 03:02:09 10.1.2.3 cron[88]: (root) CMD (run-parts /etc/cron.hourly)",),
        ("not even close to a syslog line",),
    ]
    df = spark.createDataFrame(rows, "message string")
    out = PipelineInterpreter(spec).run(df, "syslog")
    got = out.collect()
    by_msg = {r["message"]: r for r in got}
    ok1 = by_msg[rows[0][0]]
    assert ok1["process.name"] == "sshd" and ok1["process.pid"] == 4721
    assert ok1["host.name"] == "web01.example.com"
    assert ok1["event.kind"] == "event"
    assert ok1["error.message"] is None
    ok2 = by_msg[rows[1][0]]
    assert ok2["process.name"] == "cron" and ok2["process.pid"] == 88
    bad = by_msg[rows[2][0]]
    assert bad["error.message"] == "syslog grok failed"
    assert bad["process.name"] is None
