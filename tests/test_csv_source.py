"""CSV source surface (B95): the committed-fixture query runs under the
oracle harness; these tests cover the legs typed read_csv can't express —
PERMISSIVE malformed-row tolerance (the decode chain's never-fail-the-
batch discipline applied to CSV) — plus the fixture's RFC-4180 parse
facts a silent option regression would break."""

from __future__ import annotations

from kinesis2elastic_spark.operators.decode import q_csv_source


def test_fixture_parses_rfc4180_edges(spark):
    rows = {r.id: r for r in q_csv_source(spark, "unused").collect()}
    assert len(rows) == 8
    assert rows[1].customer == "Acme, Inc."          # quoted delimiter
    assert rows[2].note == 'says "urgent" twice'      # "" escape
    assert rows[3].note == "line one\nline two"       # embedded newline
    assert rows[4].customer is None                   # empty -> NULL
    assert rows[5].price == -42.50
    assert rows[6].note.endswith("   ")               # trailing spaces kept
    assert rows[7].customer == 'Wayne, "Bruce"'
    assert rows[8].note is None and rows[8].price is None


def test_permissive_mode_dead_letters_malformed_rows(spark, tmp_path):
    """One poison row yields one corrupt-record row (raw line preserved
    for the DLQ), never a failed read — the A15 discipline on CSV."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "id,qty\n"
        "1,2\n"
        "not_a_number,3\n"   # type mismatch -> corrupt
        "4,5\n"
    )
    df = (
        spark.read.schema("id bigint, qty bigint, _corrupt_record string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()  # SPARK-21610: corrupt-record col needs materialization
    )
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert {r.id for r in good.collect()} == {1, 4}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0]._corrupt_record
