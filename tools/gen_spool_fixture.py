"""Generate the committed Firehose spool fixture for q_spool_flatten.

Deterministic (no RNG, no clock): re-running produces byte-identical files,
so the fixture can live in git and both engines (Spark via the
``firehose_spool`` DataSource, DuckDB via ``read_json``) read the SAME
committed bytes.  Wire format per the reference (main.go:236-247 /
incoming/firehose.go:21-29): one JSON envelope per line, records[].data =
base64(payload).

Edge rows exercised (all VALID JSON, so DuckDB's typed read_json parses
them too — cross-engine malformed-line tolerance is covered by pytest on
the Spark side only):
- an envelope with an empty records list;
- an envelope with no records field at all (→ NULL list);
- an envelope with no requestId (→ NULL id).

Usage: python tools/gen_spool_fixture.py   (rewrites the fixture in place)
"""

from __future__ import annotations

import base64
import json
import os

OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "kinesis2elastic_spark",
    "fixtures",
    "spool",
)

N_FILES = 3
ENV_PER_FILE = 5
BASE_TS = 1635622518652


def _payload(i: int, j: int) -> str:
    return json.dumps(
        {"messageType": "DATA_MESSAGE", "group": f"g-{i % 4}", "seq": i * 100 + j},
        separators=(",", ":"),
        sort_keys=True,
    )


def main() -> None:
    out = os.path.normpath(OUT_DIR)
    os.makedirs(out, exist_ok=True)
    n = 0
    for f_idx in range(N_FILES):
        lines = []
        for e_idx in range(ENV_PER_FILE):
            i = f_idx * ENV_PER_FILE + e_idx
            env: dict = {
                "requestId": f"req-{i:03d}",
                "timestamp": BASE_TS + i * 1000,
                "records": [
                    {
                        "data": base64.b64encode(_payload(i, j).encode()).decode()
                    }
                    for j in range(1 + i % 4)
                ],
            }
            if i == 4:
                env["records"] = []
            elif i == 9:
                del env["records"]
            elif i == 13:
                del env["requestId"]
            lines.append(json.dumps(env, separators=(",", ":"), sort_keys=True))
            n += 1
        path = os.path.join(out, f"spool-{f_idx:03d}.jsonl")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    print(f"wrote {N_FILES} files / {n} envelopes under {out}")


if __name__ == "__main__":
    main()
