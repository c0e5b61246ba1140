"""Minimal pure-Python Apache Avro Object Container File writer/reader.

Iceberg's manifest lists and manifest files are Avro OCF by spec
(iceberg.apache.org/spec — "Manifests"), and no Avro library is baked
into this environment, so the Iceberg mirror (``iceberg.py``) carries
its own encoder for exactly the subset the Iceberg file schemas need:

  null  boolean  int  long  float  double  bytes  string
  record  array  map  union  fixed

Encoding follows the public Avro 1.11 specification
(avro.apache.org/docs/current/specification): zig-zag varint ints and
longs, length-prefixed bytes/strings, unions as a long branch index
followed by the branch value, arrays/maps as counted blocks terminated
by a zero count, records as their fields in declared order.  The OCF
layout is the spec's: ``Obj\\x01`` magic, a file-metadata map carrying
``avro.schema`` (JSON) and ``avro.codec``, a random 16-byte sync
marker, then data blocks of ``(count, byte-length, payload, sync)``.

Schema JSON may carry arbitrary extra attributes (Iceberg stores its
``field-id`` annotations there) — they ride along untouched because
the binary encoding depends only on the type shapes.

The writer emits codec ``null`` (Iceberg readers accept it; manifests
are small metadata files).  The reader additionally understands
``deflate`` (raw DEFLATE per the Avro spec) so externally-produced
manifests remain inspectable.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# -- binary primitives -------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf) -> bytes:
    return buf.read(_read_long(buf))


# -- schema-driven value encoding --------------------------------------------

def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch(schema: list, value) -> int:
    """Pick the union branch for a Python value — sufficient for the
    Iceberg schemas, whose unions are all ``["null", T]``."""
    for i, s in enumerate(schema):
        if _type_name(s) == "null" and value is None:
            return i
    for i, s in enumerate(schema):
        if _type_name(s) != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _encode(buf: io.BytesIO, schema, value) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(value))
    elif t == "union":
        i = _union_branch(schema, value)
        _write_long(buf, i)
        _encode(buf, schema[i], value)
    elif t == "record":
        for f in schema["fields"]:
            try:
                v = value[f["name"]] if f["name"] in value \
                    else f.get("default")
            except TypeError:
                v = getattr(value, f["name"])
            _encode(buf, f["type"], v)
    elif t == "array":
        items = list(value or ())
        if items:
            _write_long(buf, len(items))
            for it in items:
                _encode(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _decode(buf, schema):
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "union":
        return _decode(buf, schema[_read_long(buf)])
    if t == "record":
        return {f["name"]: _decode(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:           # block with byte-length prefix
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


# -- object container files --------------------------------------------------

def write_ocf(path: str, schema: dict, records: list,
              metadata: dict[str, str] | None = None,
              codec: str = "null") -> int:
    """Write an Avro OCF of ``records`` under ``schema`` with optional
    extra file-metadata strings (Iceberg stores the table schema,
    partition spec and format-version there).  Returns the file's byte
    length (Iceberg manifest-list entries record it).  Atomic via
    temp-file + rename.  ``codec``: ``null`` or ``deflate`` (raw
    DEFLATE per the Avro spec — what real Iceberg writers emit)."""
    body = io.BytesIO()
    for r in records:
        _encode(body, schema, r)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode("utf-8")
    sync = os.urandom(16)
    buf = io.BytesIO()
    buf.write(MAGIC)
    _encode(buf, {"type": "map", "values": "bytes"}, meta)
    buf.write(sync)
    if records:
        payload = body.getvalue()
        if codec == "deflate":
            z = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = z.compress(payload) + z.flush()
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        _write_long(buf, len(records))
        _write_bytes(buf, payload)
        buf.write(sync)
    payload = buf.getvalue()
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return len(payload)


def read_ocf(path: str) -> tuple[dict, dict[str, bytes], list]:
    """Read an Avro OCF → (writer schema, file metadata, records)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path} is not an Avro object container file")
    meta = _decode(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while buf.tell() < len(raw):
        n = _read_long(buf)
        block = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: bad sync marker")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(bbuf, schema))
    return schema, meta, records
