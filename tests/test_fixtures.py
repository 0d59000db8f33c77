"""The committed ingest fixtures must be byte-reproducible from their
generators — the property that lets both engines (and the next round's
builder) trust that `fixtures/` and `tools/gen_*_fixture.py` describe the
same bytes.  A drifted generator would silently decouple the oracle SQL
(which reads the committed files) from the documented provenance."""

from __future__ import annotations

import os

import tools.gen_csv_fixture as gen_csv
import tools.gen_spool_fixture as gen_spool


def _read_tree(root: str) -> dict[str, bytes]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def test_spool_fixture_matches_generator(tmp_path, monkeypatch):
    committed = os.path.normpath(gen_spool.OUT_DIR)
    regen = str(tmp_path / "spool")
    monkeypatch.setattr(gen_spool, "OUT_DIR", regen)
    gen_spool.main()
    assert _read_tree(regen) == _read_tree(committed)


def test_csv_fixture_matches_generator(tmp_path, monkeypatch):
    committed = gen_csv.OUT
    regen = str(tmp_path / "orders_extract.csv")
    monkeypatch.setattr(gen_csv, "OUT", regen)
    gen_csv.main()
    assert open(regen, "rb").read() == open(committed, "rb").read()


def test_blob_fixture_matches_generator(tmp_path, monkeypatch):
    import tools.gen_blob_fixture as gen_blob

    committed = os.path.normpath(gen_blob.OUT_DIR)
    regen = str(tmp_path / "blobs")
    monkeypatch.setattr(gen_blob, "OUT_DIR", regen)
    gen_blob.main()
    assert _read_tree(regen) == _read_tree(committed)
