"""Delta Lake deletion-vector codec (B198).

Row-level deletes in the open Delta protocol are DELETION VECTORS: a
per-data-file bitmap of deleted row indexes, referenced from the add
action's ``deletionVector`` descriptor and stored either inline in the
log or in a ``deletion_vector_<uuid>.bin`` sidecar.  Modern Delta
writers enable them BY DEFAULT, so an interop reader that refuses the
``deletionVectors`` table feature cannot read most real tables.

Everything here is implemented from the published specifications —
no delta-spark, no roaring library:

- **Z85** (ZeroMQ base-85, the alphabet Delta PROTOCOL.md mandates for
  encoding DV UUIDs and inline DV bytes): 4 bytes <-> 5 chars,
  big-endian base 85.
- **32-bit RoaringBitmap "portable" serialization** (the public
  RoaringFormatSpec): cookie 12346 (no run containers, followed by a
  4-byte container count) or 12347 (run containers present, count-1 in
  the cookie's upper 16 bits, then a run-container bitset); a
  descriptive header of (key u16, cardinality-1 u16) pairs; an offset
  header when the cookie is 12346 or >= 4 containers; then container
  payloads — array (sorted u16s), bitmap (1024 u64s), or run
  (n_runs u16, then (start u16, length-1 u16) pairs).  All integers
  little-endian.  Container choice follows the spec's size rule:
  min(2*cardinality, 8192, 2 + 4*n_runs) bytes.
- **RoaringBitmapArray** (Delta's 64-bit extension, PROTOCOL.md
  "Deletion Vector Format"): magic number 1681511377 (4 bytes LE),
  then the number of 32-bit bitmaps as an 8-byte LE long, then each
  bitmap's portable serialization; bitmap i covers row indexes
  [i * 2^32, (i+1) * 2^32).
- **DV file layout** (PROTOCOL.md): the sidecar starts with a single
  format-version byte (1); each stored DV is a 4-byte BIG-endian data
  size, the serialized bitmap bytes, then a 4-byte BIG-endian CRC-32
  of those bytes.  The descriptor's ``offset`` points at the size
  field; ``sizeInBytes`` is the bitmap byte count (size and checksum
  excluded).  Several DVs may share one sidecar at increasing offsets.

Scale note: a DV is metadata-rate by construction (a compressed bitmap
whose size is bounded by runs/containers, not by table rows), which is
exactly why the format scales to 100 TB tables — the reader in
``delta_log.read_delta`` decodes descriptors driver-side and pushes
only (file, row_index) anti-join keys into the plan.

Cite: reference repo (Moulick/kinesis2elastic main.go) has no table
format; this closes the r13 B190 reader's documented deletionVectors
refusal with a real read path.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}

MAGIC = 1681511377  # RoaringBitmapArray portable magic (PROTOCOL.md)
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
DV_FORMAT_VERSION = 1


# ----------------------------------------------------------------- Z85


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"z85 input must be 5-char aligned, got {len(s)}")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------- 32-bit roaring codec


def _split_runs(vals: list[int]) -> list[tuple[int, int]]:
    """Consecutive-value runs of a sorted u16 list as (start, len)."""
    runs: list[tuple[int, int]] = []
    start = prev = vals[0]
    for v in vals[1:]:
        if v == prev + 1:
            prev = v
        else:
            runs.append((start, prev - start + 1))
            start = prev = v
    runs.append((start, prev - start + 1))
    return runs


def serialize_roaring32(values) -> bytes:
    """Portable serialization of a sorted, deduplicated iterable of
    u32s.  Container per 16-bit high chunk; type chosen by the spec's
    size rule so array/bitmap/run payloads are all reachable."""
    vals = list(values)
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("roaring32 values must be u32")
    if vals != sorted(set(vals)):
        raise ValueError("roaring32 input must be sorted and deduplicated")
    chunks: dict[int, list[int]] = {}
    for v in vals:
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(chunks)
    size = len(keys)
    payloads: list[bytes] = []
    is_run: list[bool] = []
    cards: list[int] = []
    for k in keys:
        low = chunks[k]
        card = len(low)
        cards.append(card)
        runs = _split_runs(low)
        sz_arr = 2 * card if card <= 4096 else None
        sz_bmp = 8192
        sz_run = 2 + 4 * len(runs)
        best = min(x for x in (sz_arr, sz_bmp, sz_run) if x is not None)
        if best == sz_run and sz_run < (sz_arr or sz_bmp) and sz_run < sz_bmp:
            is_run.append(True)
            body = struct.pack("<H", len(runs))
            for s, n in runs:
                body += struct.pack("<HH", s, n - 1)
            payloads.append(body)
        elif sz_arr is not None and sz_arr <= sz_bmp:
            is_run.append(False)
            payloads.append(struct.pack(f"<{card}H", *low))
        else:
            is_run.append(False)
            words = [0] * 1024
            for x in low:
                words[x >> 6] |= 1 << (x & 63)
            payloads.append(struct.pack("<1024Q", *words))
    has_runs = any(is_run)
    out = bytearray()
    if has_runs:
        out += struct.pack("<I", _COOKIE_RUN | ((size - 1) << 16))
        bitset = bytearray((size + 7) // 8)
        for i, r in enumerate(is_run):
            if r:
                bitset[i >> 3] |= 1 << (i & 7)
        out += bitset
    else:
        out += struct.pack("<II", _COOKIE_NO_RUN, size)
    for k, card in zip(keys, cards):
        out += struct.pack("<HH", k, card - 1)
    if not has_runs or size >= _NO_OFFSET_THRESHOLD:
        # offset header: byte position of each container payload from
        # the START of this bitmap's serialization
        pos = len(out) + 4 * size
        for p in payloads:
            out += struct.pack("<I", pos)
            pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Decode one portable 32-bit roaring bitmap starting at ``pos``;
    returns (sorted values, position after the bitmap).  Reads
    containers sequentially (the offset header, when present, is
    validated-by-construction in round-trip tests, not required)."""
    start = pos
    (cookie_word,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    cookie = cookie_word & 0xFFFF
    if cookie == _COOKIE_RUN:
        size = (cookie_word >> 16) + 1
        nbytes = (size + 7) // 8
        bitset = buf[pos : pos + nbytes]
        pos += nbytes
        run_flags = [bool(bitset[i >> 3] & (1 << (i & 7))) for i in range(size)]
    elif cookie == _COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = [False] * size
    else:
        raise ValueError(f"bad roaring cookie {cookie} at byte {start}")
    header = []
    for _ in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        header.append((k, cm1 + 1))
    if cookie == _COOKIE_NO_RUN or size >= _NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offset header — sequential read doesn't need it
    out: list[int] = []
    for (k, card), rflag in zip(header, run_flags):
        hi = k << 16
        if rflag:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(hi | s, (hi | s) + lm1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & (-w)
                    out.append(hi | (wi << 6) | (b.bit_length() - 1))
                    w ^= b
    return out, pos


# --------------------------------------- 64-bit RoaringBitmapArray wrap


def serialize_positions(positions) -> bytes:
    """Sorted deduplicated int64 row indexes -> Delta's portable
    RoaringBitmapArray bytes (magic + count + dense 32-bit bitmaps)."""
    pos = sorted(set(int(p) for p in positions))
    if pos and pos[0] < 0:
        raise ValueError("row indexes must be non-negative")
    n_maps = (pos[-1] >> 32) + 1 if pos else 0
    by_hi: list[list[int]] = [[] for _ in range(n_maps)]
    for p in pos:
        by_hi[p >> 32].append(p & 0xFFFFFFFF)
    out = struct.pack("<Iq", MAGIC, n_maps)
    for vals in by_hi:
        out += serialize_roaring32(vals)
    return out


def deserialize_positions(data: bytes) -> list[int]:
    magic, n_maps = struct.unpack_from("<Iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for hi in range(n_maps):
        vals, pos = deserialize_roaring32(data, pos)
        out.extend((hi << 32) | v for v in vals)
    return out


# --------------------------------------------------- DV sidecar file IO


def write_dv_file(path: str, dv_payloads: list[bytes]) -> list[tuple[int, int]]:
    """Write one sidecar holding every payload; returns the
    (offset, sizeInBytes) descriptor fields per payload, in order."""
    spans: list[tuple[int, int]] = []
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes([DV_FORMAT_VERSION]))
        off = 1
        for data in dv_payloads:
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            spans.append((off, len(data)))
            off += 4 + len(data) + 4
    os.replace(tmp, path)
    return spans


def read_dv_file(path: str, offset: int, size_in_bytes: int) -> bytes:
    with open(path, "rb") as f:
        ver = f.read(1)
        if not ver or ver[0] != DV_FORMAT_VERSION:
            raise ValueError(f"unsupported DV file format version in {path}")
        f.seek(offset)
        (stored,) = struct.unpack(">i", f.read(4))
        if stored != size_in_bytes:
            raise ValueError(
                f"DV size mismatch in {path}@{offset}: descriptor says "
                f"{size_in_bytes}, file says {stored}"
            )
        data = f.read(stored)
        (crc,) = struct.unpack(">I", f.read(4))
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError(f"DV checksum mismatch in {path}@{offset}")
    return data


# ------------------------------------------------ descriptor resolution


def dv_uuid_path(table_dir: str, path_or_inline: str) -> str:
    """storageType 'u': the last 20 chars are the Z85 of the DV file's
    UUID; anything before them is an optional directory prefix."""
    if len(path_or_inline) < 20:
        raise ValueError(f"malformed DV uuid field: {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_dir, prefix, name) if prefix else os.path.join(
        table_dir, name
    )


def decode_descriptor(table_dir: str, dv: dict) -> list[int]:
    """deletionVector descriptor dict -> sorted deleted row indexes."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        data = data[: dv["sizeInBytes"]]  # z85 pads to 4-byte alignment
    elif st == "u":
        p = dv_uuid_path(table_dir, dv["pathOrInlineDv"])
        data = read_dv_file(p, int(dv["offset"]), int(dv["sizeInBytes"]))
    elif st == "p":
        data = read_dv_file(
            dv["pathOrInlineDv"], int(dv["offset"]), int(dv["sizeInBytes"])
        )
    else:
        raise NotImplementedError(f"DV storageType {st!r}")
    out = deserialize_positions(data)
    card = dv.get("cardinality")
    if card is not None and int(card) != len(out):
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, bitmap {len(out)}"
        )
    return out


def make_descriptor(
    table_dir: str,
    positions,
    inline_max_bytes: int = 512,
    sidecar: tuple[str, list[bytes], list[dict]] | None = None,
) -> dict:
    """Build a deletionVector descriptor for ``positions``.  Small
    bitmaps inline ('i', Z85 in the log); larger ones append to the
    shared per-commit ``sidecar`` accumulator (path, payloads, descs)
    which the caller flushes with :func:`flush_sidecar`."""
    data = serialize_positions(positions)
    card = len(set(int(p) for p in positions))
    if len(data) <= inline_max_bytes:
        pad = (-len(data)) % 4
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data),
            "cardinality": card,
        }
    if sidecar is None:
        raise ValueError("on-disk DV requested but no sidecar accumulator")
    _, payloads, descs = sidecar
    d = {
        "storageType": "u",
        "pathOrInlineDv": None,  # filled by flush_sidecar
        "offset": None,
        "sizeInBytes": len(data),
        "cardinality": card,
    }
    payloads.append(data)
    descs.append(d)
    return d


def new_sidecar(table_dir: str) -> tuple[str, list[bytes], list[dict]]:
    u = _uuid.uuid4()
    return (
        os.path.join(table_dir, f"deletion_vector_{u}.bin"),
        [],
        [],
    )


def flush_sidecar(sidecar: tuple[str, list[bytes], list[dict]]) -> None:
    path, payloads, descs = sidecar
    if not payloads:
        return
    name = os.path.basename(path)
    u = name[len("deletion_vector_") : -len(".bin")]
    enc = z85_encode(_uuid.UUID(u).bytes)
    spans = write_dv_file(path, payloads)
    for d, (off, size) in zip(descs, spans):
        assert size == d["sizeInBytes"]
        d["pathOrInlineDv"] = enc
        d["offset"] = off
