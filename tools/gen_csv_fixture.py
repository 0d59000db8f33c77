"""Generate the committed CSV fixture for q_csv_source.

Deterministic, byte-stable (fixed content, LF endings) so both engines
read the SAME committed bytes.  The rows exercise the RFC-4180 surface
where naive parsers break and engines could disagree:

- quoted fields containing the delimiter;
- escaped double quotes ("" inside a quoted field);
- embedded newlines inside a quoted field (Spark needs multiLine=true);
- empty fields as NULLs (string and numeric);
- negative / zero / high-precision-but-2dp numerics.

Malformed-row tolerance (PERMISSIVE + _corrupt_record) is deliberately
NOT in this fixture — DuckDB's typed read_csv has no equivalent of a
corrupt-record column, so that leg is pytest-only (test_csv_source).

Usage: python tools/gen_csv_fixture.py   (rewrites the fixture in place)
"""

from __future__ import annotations

import os

OUT = os.path.normpath(
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "kinesis2elastic_spark",
        "fixtures",
        "csv",
        "orders_extract.csv",
    )
)

ROWS = [
    'id,customer,note,qty,price',
    '1,"Acme, Inc.","plain note",3,19.99',
    '2,Globex,"says ""urgent"" twice",1,5.00',
    '3,"Initech","line one\nline two",0,0.00',
    '4,,"empty customer",7,123.45',
    '5,"Umbrella Corp",,2,-42.50',
    '6,"Stark Industries","trailing spaces   ",10,999.99',
    '7,"Wayne, ""Bruce""","comma and quotes",4,1.25',
    '8,Hooli,"",5,',
]


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as f:
        f.write("\n".join(ROWS) + "\n")
    print(f"wrote {len(ROWS) - 1} records -> {OUT}")


if __name__ == "__main__":
    main()
