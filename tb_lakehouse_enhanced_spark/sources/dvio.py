"""Delta deletion-vector codec — the public DV storage format.

Implements the on-disk format Delta Lake's deletion vectors use
(delta-io/delta PROTOCOL.md, "Deletion Vectors" + "Deletion Vector
Descriptor Schema" + RoaringBitmap's RoaringFormatSpec), with no
Delta/RoaringBitmap library in this environment:

- **RoaringBitmapArray (64-bit) portable serialization**: magic number
  ``1681511377`` (int32 LE), number of 32-bit bitmaps (int64 LE), then
  per bitmap its high-32-bit key (int32 LE) followed by the standard
  32-bit RoaringBitmap portable serialization (RoaringFormatSpec:
  no-run cookie ``12346``, container count, descriptive header of
  ``(key: uint16, cardinality-1: uint16)`` pairs, offset header, then
  array containers — sorted uint16 values for cardinality <= 4096 —
  or 8 KiB bitmap containers). All little-endian.
- **DV file framing**: a DV file (``deletion_vector_<uuid>.bin``)
  starts with a 1-byte format version (1); each stored vector is
  ``<dataSize: int32 BE><bitmap bytes><CRC-32 of bitmap bytes: int32
  BE>`` and the descriptor's ``offset`` points at the dataSize word.
- **Descriptors**: ``{storageType, pathOrInlineDv, offset,
  sizeInBytes, cardinality}``.  ``u`` = UUID-relative file
  (``pathOrInlineDv`` is ``<random prefix><Z85-encoded uuid>``),
  ``i`` = inline (``pathOrInlineDv`` is the Z85-encoded bitmap),
  ``p`` = absolute path.  Z85 is the ZeroMQ base-85 alphabet, 4 bytes
  -> 5 chars big-endian.

Reference parity: the reference platform's Delta tables keep DML
readable through merge-on-read via exactly these vectors
(notebooks/22_ETL_Silver_PySpark.py MERGE on a Databricks runtime);
this module lets the engine's Delta mirror express the same state.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377
_NO_RUN_COOKIE = 12346

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            n = n * 85 + _Z85_INV[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


# -- 32-bit RoaringBitmap portable serialization ----------------------------

def _serialize_rb32(values: list[int]) -> bytes:
    """Portable no-run serialization of a 32-bit roaring bitmap over
    sorted ``values`` (uint32)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    head = struct.pack("<ii", _NO_RUN_COOKIE, n)
    desc = b"".join(struct.pack("<HH", k, len(containers[k]) - 1)
                    for k in keys)
    # container payloads + offsets (from the start of this bitmap's
    # serialization, per RoaringFormatSpec)
    payloads = []
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= 4096:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:                       # bitmap container: 1024 uint64 words
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
    base = len(head) + len(desc) + 4 * n
    offsets, pos = [], base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    return (head + desc
            + struct.pack(f"<{n}i", *offsets) + b"".join(payloads))


def _deserialize_rb32(buf: bytes, at: int) -> tuple[list[int], int]:
    """Parse one 32-bit bitmap starting at ``at``; returns (values,
    next offset)."""
    cookie = struct.unpack_from("<i", buf, at)[0]
    if cookie & 0xFFFF == 12347:        # run-container variant
        raise NotImplementedError(
            "run containers not implemented (this engine never writes "
            "them); re-encode the DV without runs")
    if cookie != _NO_RUN_COOKIE:
        raise ValueError(f"bad roaring cookie {cookie}")
    n = struct.unpack_from("<i", buf, at + 4)[0]
    desc = struct.unpack_from(f"<{2 * n}H", buf, at + 8)
    offsets = struct.unpack_from(f"<{n}i", buf, at + 8 + 4 * n)
    values = []
    end = at + 8 + 8 * n
    for i in range(n):
        key, card = desc[2 * i], desc[2 * i + 1] + 1
        pos = at + offsets[i]
        if card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            end = max(end, pos + 2 * card)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            vals = []
            for wi, word in enumerate(words):
                while word:
                    b = (word & -word).bit_length() - 1
                    vals.append(wi * 64 + b)
                    word &= word - 1
            end = max(end, pos + 8192)
        values.extend((key << 16) | v for v in vals)
    return values, end


def serialize_roaring64(positions) -> bytes:
    """RoaringBitmapArray portable serialization of sorted row
    indexes (uint64)."""
    buckets: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError(f"negative row index {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<iq", MAGIC, len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<i", key))
        out.append(_serialize_rb32(sorted(buckets[key])))
    return b"".join(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    at, out = 12, []
    for _ in range(n):
        key = struct.unpack_from("<i", data, at)[0]
        vals, at = _deserialize_rb32(data, at + 4)
        out.extend((key << 32) | v for v in vals)
    return out


# -- DV file framing ---------------------------------------------------------

def write_dv_file(path: str, bitmaps: list[bytes]) -> list[tuple[int, int]]:
    """Write serialized bitmaps into one DV file; returns per-bitmap
    (offset, sizeInBytes) for the descriptors."""
    spans = []
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"\x01")                        # format version
        for data in bitmaps:
            spans.append((f.tell(), len(data)))
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">i", zlib.crc32(data) & 0x7FFFFFFF))
    os.replace(tmp, path)
    return spans


def read_dv_span(path: str, offset: int, size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        (n,) = struct.unpack(">i", f.read(4))
        if n != size:
            raise ValueError(
                f"DV at {path}:{offset} declares {n} bytes, descriptor "
                f"says {size}")
        data = f.read(n)
        (crc,) = struct.unpack(">i", f.read(4))
    if zlib.crc32(data) & 0x7FFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    return data


def dv_relative_path(descriptor: dict) -> str:
    """Table-relative path of a ``u``-storage DV file: the final 20
    chars of ``pathOrInlineDv`` are the Z85-encoded UUID, anything
    before is a random prefix directory."""
    enc = descriptor["pathOrInlineDv"]
    prefix, z = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=z85_decode(z))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(prefix, name) if prefix else name


def load_dv(table_path: str, descriptor: dict) -> list[int]:
    """Row indexes deleted by a descriptor (any storage type)."""
    st = descriptor["storageType"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
    elif st == "u":
        data = read_dv_span(
            os.path.join(table_path, dv_relative_path(descriptor)),
            descriptor["offset"], descriptor["sizeInBytes"])
    elif st == "p":
        data = read_dv_span(descriptor["pathOrInlineDv"],
                            descriptor["offset"],
                            descriptor["sizeInBytes"])
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    out = deserialize_roaring64(data)
    if len(out) != descriptor["cardinality"]:
        raise ValueError(
            f"DV cardinality mismatch: bitmap has {len(out)}, "
            f"descriptor says {descriptor['cardinality']}")
    return out


def make_dv_descriptor(table_path: str,
                       positions_by_file: dict[str, list[int]]
                       ) -> dict[str, dict]:
    """Write ONE ``u``-storage DV file holding a vector per data file
    and return ``{data file rel path: deletionVector descriptor}``."""
    if not positions_by_file:
        return {}
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    files = sorted(positions_by_file)
    bitmaps = [serialize_roaring64(sorted(positions_by_file[f]))
               for f in files]
    spans = write_dv_file(os.path.join(table_path, name), bitmaps)
    enc = z85_encode(u.bytes)
    return {f: {"storageType": "u", "pathOrInlineDv": enc,
                "offset": off, "sizeInBytes": size,
                "cardinality": len(positions_by_file[f])}
            for f, (off, size) in zip(files, spans)}
