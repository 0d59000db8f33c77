"""Generate the committed binary-ingest fixture (fixtures/blobs/).

Six small opaque payload files standing in for multimodal assets
(image/audio bytes are opaque ``binary`` columns to the engine — the
B42 data model): an 8-byte fake magic header + a deterministic LCG byte
stream keyed by the file index.  Pure integer arithmetic — byte-for-byte
reproducible with no RNG/module/platform dependence, so
``tests/test_fixtures.py`` can pin the committed bytes to this
generator.
"""

from __future__ import annotations

import os

OUT_DIR = os.path.normpath(
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "kinesis2elastic_spark",
        "fixtures",
        "blobs",
    )
)

N_FILES = 6
MAGIC = b"\x89FAKEIMG"  # 8-byte fake container magic


def payload(idx: int) -> bytes:
    """MAGIC + 64 + 32*idx LCG bytes (x -> x*1103515245 + 12345 mod 2^31,
    seeded 1000003*idx + 17; low byte emitted)."""
    n = 64 + 32 * idx
    x = 1000003 * idx + 17
    out = bytearray(MAGIC)
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(x & 0xFF)
    return bytes(out)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for i in range(N_FILES):
        with open(os.path.join(OUT_DIR, f"img_{i:03d}.bin"), "wb") as f:
            f.write(payload(i))


if __name__ == "__main__":
    main()
