"""MaxMind DB (.mmdb) binary-format reader + fixture writer (A28's
missing half — r11 VERDICT #8).

The reference attaches real GeoLite2 City/ASN databases to its geoip
processors (ingest/axway-ingest.json:90-108); no MaxMind data can ship
here, but the FORMAT is an open spec (maxmind.github.io/MaxMind-DB —
"MaxMind DB File Format Specification 2.0"), so this module implements
it from the spec: a binary search tree over IP bits, a typed data
section, and a metadata map behind the ``\\xab\\xcd\\xefMaxMind.com``
marker.  ``read_mmdb_ranges`` walks the whole tree and returns
(ip_lo, ip_hi, record) rows — the CIDR dimension table
``sources/geoip.py`` broadcast-range-joins; a real GeoLite2 file and
the test fixture read through the same code path.

Spark-first posture: the .mmdb is DRIVER-side metadata (a GeoLite2
City db is ~60 MB, ~4M ranges) — parse once, create a DataFrame,
broadcast it into the enrichment join.  The 100 TB corpus never sees
the binary format; only the dim build does.

The writer half exists for FIXTURES only (no public .mmdb may ship in
the repo): it emits a spec-conformant IPv4 database (record_size 24,
binary format 2.0) that this reader — or any off-the-shelf mmdb
library — can open.
"""

from __future__ import annotations

import struct
import time

# ---------------------------------------------------------------------------
# data-section type tags (spec §"Data types")
_T_PTR, _T_STR, _T_DOUBLE, _T_BYTES = 1, 2, 3, 4
_T_U16, _T_U32, _T_MAP, _T_I32, _T_U64, _T_U128 = 5, 6, 7, 8, 9, 10
_T_ARRAY, _T_CONTAINER, _T_END, _T_BOOL, _T_FLOAT = 11, 12, 13, 14, 15

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


# ---------------------------------------------------------------------------
# encoder (fixture writer)


def _enc_ctrl(type_id: int, size: int) -> bytes:
    """Control byte(s): top 3 bits = type (0 = extended, next byte holds
    type-7), bottom 5 = size (<29 direct; 29/30/31 add 1/2/3 bytes)."""
    if size < 29:
        size_bits, extra = size, b""
    elif size < 29 + 256:
        size_bits, extra = 29, bytes([size - 29])
    elif size < 285 + 65536:
        size_bits, extra = 30, struct.pack(">H", size - 285)
    else:
        size_bits, extra = 31, struct.pack(">I", size - 65821)[1:]
    if type_id <= 7:
        return bytes([(type_id << 5) | size_bits]) + extra
    return bytes([size_bits, type_id - 7]) + extra


def _enc_uint(type_id: int, v: int) -> bytes:
    b = b""
    while v:
        b = bytes([v & 0xFF]) + b
        v >>= 8
    return _enc_ctrl(type_id, len(b)) + b


def encode_value(v) -> bytes:
    """Encode a python value into MaxMind-DB data-section bytes.
    Covers the types a GeoIP record needs (str/int/float/bool/map/
    array); ints pick the smallest spec uint type."""
    if isinstance(v, bool):
        return _enc_ctrl(_T_BOOL, 1 if v else 0)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _enc_ctrl(_T_STR, len(b)) + b
    if isinstance(v, float):
        return _enc_ctrl(_T_DOUBLE, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            return _enc_ctrl(_T_I32, 4) + struct.pack(">i", v)
        if v < 1 << 16:
            return _enc_uint(_T_U16, v)
        if v < 1 << 32:
            return _enc_uint(_T_U32, v)
        return _enc_uint(_T_U64, v)
    if isinstance(v, dict):
        out = _enc_ctrl(_T_MAP, len(v))
        for k, val in v.items():
            out += encode_value(str(k)) + encode_value(val)
        return out
    if isinstance(v, (list, tuple)):
        out = _enc_ctrl(_T_ARRAY, len(v))
        for item in v:
            out += encode_value(item)
        return out
    raise TypeError(f"mmdb encoder: unsupported type {type(v).__name__}")


def range_to_cidrs(lo: int, hi: int) -> list[tuple[int, int]]:
    """Split an inclusive IPv4 integer range into minimal CIDR blocks
    → [(network_int, prefix_len)] (standard greedy largest-block-first)."""
    out = []
    while lo <= hi:
        # largest block starting at lo: limited by alignment and span
        max_align = (lo & -lo).bit_length() - 1 if lo else 32
        max_span = (hi - lo + 1).bit_length() - 1
        bits = min(max_align, max_span)
        out.append((lo, 32 - bits))
        lo += 1 << bits
    return out


def build_mmdb(
    path: str,
    networks: list[tuple[int, int, dict]],
    database_type: str = "K2E-GeoIP-Fixture",
) -> None:
    """Write a spec-conformant IPv4 .mmdb: ``networks`` is
    [(ip_lo, ip_hi, record_dict)] with DISJOINT inclusive ranges.
    Each range splits into CIDR blocks; blocks of one range share one
    encoded data record (tree records point at the same offset — the
    dedup the spec's pointer machinery exists for, done at the
    tree-record level so the writer needs no pointer encoding)."""
    # --- data section: one record per input range, offsets remembered
    data = b""
    offsets: list[int] = []
    for _, _, rec in networks:
        offsets.append(len(data))
        data += encode_value(rec)

    # --- binary trie over IPv4 bits (depth 32)
    # node = [left, right]; values: None (empty), ("node", idx), ("data", i)
    nodes: list[list] = [[None, None]]
    for net_i, (lo, hi, _) in enumerate(networks):
        for net, plen in range_to_cidrs(lo, hi):
            cur = 0
            for depth in range(plen):
                bit = (net >> (31 - depth)) & 1
                if depth == plen - 1:
                    nodes[cur][bit] = ("data", net_i)
                else:
                    nxt = nodes[cur][bit]
                    if nxt is None:
                        nodes.append([None, None])
                        nodes[cur][bit] = ("node", len(nodes) - 1)
                        cur = len(nodes) - 1
                    elif nxt[0] == "node":
                        cur = nxt[1]
                    else:
                        raise ValueError("overlapping networks in fixture")

    node_count = len(nodes)

    def record(v) -> int:
        if v is None:
            return node_count  # "no data" sentinel
        if v[0] == "node":
            return v[1]
        # data: record > node_count; reader seeks (record - node_count
        # - 16) into the data section
        return node_count + 16 + offsets[v[1]]

    tree = b"".join(
        struct.pack(">I", record(n[0]))[1:] + struct.pack(">I", record(n[1]))[1:]
        for n in nodes
    )  # record_size 24: 3 bytes per record, 6 per node

    meta = {
        "node_count": node_count,
        "record_size": 24,
        "ip_version": 4,
        "database_type": database_type,
        "languages": ["en"],
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": int(time.time()),
        "description": {"en": "deterministic test fixture"},
    }
    with open(path, "wb") as f:
        f.write(tree + b"\x00" * 16 + data + _METADATA_MARKER + encode_value(meta))


# ---------------------------------------------------------------------------
# decoder (the real reader — works on any spec-2.0 file)


def _decode(buf: bytes, pos: int):
    """Decode one value at ``pos`` → (value, next_pos).  Handles every
    spec type including pointers (which real GeoLite2 files use heavily
    to dedup shared sub-maps)."""
    ctrl = buf[pos]
    pos += 1
    type_id = ctrl >> 5
    if type_id == 0:  # extended type
        type_id = buf[pos] + 7
        pos += 1
    size = ctrl & 0x1F
    if type_id == _T_PTR:
        ss = (ctrl >> 3) & 0x3
        vvv = ctrl & 0x7
        if ss == 0:
            ptr = (vvv << 8) | buf[pos]
            pos += 1
        elif ss == 1:
            ptr = ((vvv << 16) | (buf[pos] << 8) | buf[pos + 1]) + 2048
            pos += 2
        elif ss == 2:
            ptr = (
                (vvv << 24) | (buf[pos] << 16) | (buf[pos + 1] << 8) | buf[pos + 2]
            ) + 526336
            pos += 3
        else:
            ptr = struct.unpack(">I", buf[pos : pos + 4])[0]
            pos += 4
        val, _ = _decode(buf, ptr)
        return val, pos
    if size == 29:
        size = 29 + buf[pos]
        pos += 1
    elif size == 30:
        size = 285 + struct.unpack(">H", buf[pos : pos + 2])[0]
        pos += 2
    elif size == 31:
        size = 65821 + struct.unpack(">I", b"\x00" + buf[pos : pos + 3])[0]
        pos += 3
    if type_id == _T_STR:
        return buf[pos : pos + size].decode("utf-8"), pos + size
    if type_id == _T_DOUBLE:
        return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    if type_id == _T_FLOAT:
        return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if type_id == _T_BYTES:
        return buf[pos : pos + size], pos + size
    if type_id in (_T_U16, _T_U32, _T_U64, _T_U128):
        return int.from_bytes(buf[pos : pos + size], "big"), pos + size
    if type_id == _T_I32:
        return int.from_bytes(buf[pos : pos + size], "big", signed=True), pos + size
    if type_id == _T_MAP:
        out = {}
        for _ in range(size):
            k, pos = _decode(buf, pos)
            v, pos = _decode(buf, pos)
            out[k] = v
        return out, pos
    if type_id == _T_ARRAY:
        items = []
        for _ in range(size):
            v, pos = _decode(buf, pos)
            items.append(v)
        return items, pos
    if type_id == _T_BOOL:
        return bool(size), pos
    raise ValueError(f"mmdb decoder: unsupported type {type_id} at {pos}")


def read_metadata(path: str) -> dict:
    """Parse the metadata map (last marker occurrence, per spec the
    search starts from the file's end)."""
    with open(path, "rb") as f:
        buf = f.read()
    idx = buf.rfind(_METADATA_MARKER)
    if idx < 0:
        raise ValueError(f"{path}: no MaxMind.com metadata marker")
    meta, _ = _decode(buf, idx + len(_METADATA_MARKER))
    return meta


def read_mmdb_ranges(path: str) -> list[tuple[int, int, dict]]:
    """Full dump: walk the search tree and return every stored network
    as (ip_lo, ip_hi, record) with inclusive integer bounds — the rows
    the GeoIP dim table is built from.  IPv4 databases walk depth 32;
    IPv6 databases (ip_version 6) surface only the IPv4-mapped subtree
    (::ffff:0:0/96 — where GeoLite2 stores IPv4), since the enrichment
    joins on IPv4 int64 keys."""
    with open(path, "rb") as f:
        buf = f.read()
    meta = read_metadata(path)
    node_count = meta["node_count"]
    record_size = meta["record_size"]
    node_bytes = record_size * 2 // 8
    data_start = node_count * node_bytes + 16

    def rec(node: int, side: int) -> int:
        base = node * node_bytes
        if record_size == 24:
            off = base + 3 * side
            return int.from_bytes(buf[off : off + 3], "big")
        if record_size == 28:
            mid = buf[base + 3]
            if side == 0:
                return ((mid >> 4) << 24) | int.from_bytes(buf[base : base + 3], "big")
            return ((mid & 0xF) << 24) | int.from_bytes(
                buf[base + 4 : base + 7], "big"
            )
        if record_size == 32:
            off = base + 4 * side
            return int.from_bytes(buf[off : off + 4], "big")
        raise ValueError(f"unsupported record_size {record_size}")

    # ip_version 6: descend 96 zero/one bits to the ::ffff:0:0/96 node
    start, depth0 = 0, 0
    if meta.get("ip_version") == 6:
        prefix = [0] * 80 + [1] * 16
        for bit in prefix:
            start = rec(start, bit)
            if start >= node_count:
                return []  # no IPv4-mapped data
        depth0 = 0

    out: list[tuple[int, int, dict]] = []
    # iterative DFS: (node, prefix, depth)
    stack = [(start, 0, depth0)]
    decoded: dict[int, dict] = {}
    while stack:
        node, prefix, depth = stack.pop()
        for bit in (0, 1):
            r = rec(node, bit)
            child_prefix = prefix | (bit << (31 - depth))
            if r < node_count:
                if depth + 1 <= 31:
                    stack.append((r, child_prefix, depth + 1))
            elif r == node_count:
                continue  # empty
            else:
                off = data_start + (r - node_count - 16)
                if off not in decoded:
                    decoded[off], _ = _decode(buf, off)
                span = 1 << (31 - depth)
                out.append((child_prefix, child_prefix + span - 1, decoded[off]))
    out.sort(key=lambda t: t[0])
    return out
