"""Minimal Avro Object Container File codec (pure Python, public spec).

Iceberg's manifest lists and manifest files are Avro OCF — and this
container ships no Python avro/fastavro and no spark-avro jar (the
documented env-absence, SURVEY B105).  This module implements the
subset of the Avro 1.11 specification (avro.apache.org/docs — binary
encoding + object container files) that Iceberg metadata needs:

- types: null, boolean, int, long, float, double, bytes, string,
  fixed, enum, record, array, map, and unions;
- container: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema``/``avro.codec``, 16-byte sync marker, data blocks of
  (count, byte-size, payload); codecs ``null`` and ``deflate``;
- encoding: zigzag-varint ints/longs, length-prefixed strings/bytes,
  little-endian IEEE floats/doubles, block-encoded arrays/maps
  (negative block counts with byte sizes are honored on read).

The READER is generic — it decodes any file whose writer schema uses
the above types (schema evolution/resolution is out of scope: Iceberg
readers always use the embedded writer schema, which is what we do).
The WRITER emits single-block, null-codec files for fixture/manifest
generation.  Like sources/mmdb.py, everything here derives from the
open specification; no vendored code or data.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------- decode
class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise ValueError("avro: truncated input")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def _resolve(schema, names: dict):
    """Inline named-type references ({"type": "name"} or bare strings)."""
    if isinstance(schema, str):
        return names.get(schema, schema)
    return schema


def _register(schema, names: dict) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and schema.get("name"):
            names[schema["name"]] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _register(f["type"], names)
        elif t == "array":
            _register(schema.get("items"), names)
        elif t == "map":
            _register(schema.get("values"), names)
    elif isinstance(schema, list):
        for s in schema:
            _register(s, names)


def _decode(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        return _decode(r, schema[r.read_long()], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):  # {"type": {...nested...}}
        return _decode(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_string()
    if t == "fixed":
        return r.read(int(schema["size"]))
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "record":
        return {
            f["name"]: _decode(r, f["type"], names)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()  # block byte size (skippable hint)
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_string()
                out[k] = _decode(r, schema["values"], names)
        return out
    raise NotImplementedError(f"avro type {t!r}")


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != _MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_string()
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    names: dict = {}
    _register(schema, names)
    records: list = []
    while r.pos < len(r.b):
        count = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if r.read(16) != sync:
            raise ValueError(f"avro sync marker mismatch in {path}")
    return schema, records


# --------------------------------------------------------------- encode
def _zigzag(v: int) -> bytes:
    v = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _encode(v, schema, names: dict) -> bytes:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: first branch whose type fits
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if v is None and bt == "null":
                return _zigzag(i)
            if v is not None and bt != "null":
                return _zigzag(i) + _encode(v, branch, names)
        raise ValueError(f"no union branch for {v!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        return _encode(v, t, names)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "bytes":
        return _enc_bytes(bytes(v))
    if t == "string":
        return _enc_str(str(v))
    if t == "fixed":
        b = bytes(v)
        if len(b) != int(schema["size"]):
            raise ValueError("fixed size mismatch")
        return b
    if t == "enum":
        return _zigzag(schema["symbols"].index(v))
    if t == "record":
        return b"".join(
            _encode(v.get(f["name"]), f["type"], names)
            for f in schema["fields"]
        )
    if t == "array":
        items = list(v or [])
        if not items:
            return _zigzag(0)
        body = b"".join(_encode(x, schema["items"], names) for x in items)
        return _zigzag(len(items)) + body + _zigzag(0)
    if t == "map":
        entries = dict(v or {})
        if not entries:
            return _zigzag(0)
        body = b"".join(
            _enc_str(k) + _encode(val, schema["values"], names)
            for k, val in entries.items()
        )
        return _zigzag(len(entries)) + body + _zigzag(0)
    raise NotImplementedError(f"avro type {t!r}")


def write_ocf(path: str, schema: dict, records: list) -> None:
    """Write records as a single-block, null-codec container file."""
    names: dict = {}
    _register(schema, names)
    payload = b"".join(_encode(rec, schema, names) for rec in records)
    # deterministic sync marker derived from content (no RNG needed —
    # single-writer fixture files; uniqueness across files is irrelevant
    # to correctness, the marker only delimits blocks within ONE file)
    import hashlib

    sync = hashlib.md5(payload + json.dumps(schema).encode()).digest()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    buf.write(_zigzag(len(meta)))
    for k, val in meta.items():
        buf.write(_enc_str(k))
        buf.write(_enc_bytes(val))
    buf.write(_zigzag(0))
    buf.write(sync)
    if records:
        buf.write(_zigzag(len(records)))
        buf.write(_zigzag(len(payload)))
        buf.write(payload)
        buf.write(sync)
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
