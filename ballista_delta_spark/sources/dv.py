"""Deletion-vector reading and writing (Delta protocol "Deletion Vectors").

A deletion vector (DV) marks individual rows of one parquet data file as
deleted without rewriting the file — the merge-on-read half of Delta's DML
story (delta-spark writes DVs by default for DELETE/UPDATE/MERGE since 3.x;
the reference has no DV support at all, its write surface errors). This
module implements both directions — parsing for scans, serialization for
the DV-writing DELETE path (delta_dml.delete_delta mode="dv"):

- the Z85 decoding the descriptor uses for UUIDs and inline bitmaps,
- the portable 64-bit RoaringBitmapArray format the bitmap data uses
  (magic 1681511377; per-bitmap standard 32-bit roaring serialization per
  RoaringFormatSpec: array / bitmap / run containers, cookies 12346/12347),
- the on-disk framing (`[size:int32 BE][data][crc32 BE]` at `offset`) for
  storageType "u" (UUID-named file) / "p" (absolute path), and the inline
  form "i".

Scale note: a DV is metadata — a compressed bitmap, loaded whole per file
by every engine (delta-spark holds it in task memory the same way). The
driver parses descriptors; the row-index ANTI-JOIN that applies them runs
distributed (see delta.DeltaTable.to_df).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Any

# ZeroMQ Z85 alphabet (the Delta spec's encoding for pathOrInlineDv).
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

_MAGIC = 1681511377  # portable RoaringBitmapArray magic number


def z85_decode(s: str) -> bytes:
    """Z85 (ZeroMQ) decode — NOT Python's base64.b85decode, which uses the
    RFC 1924 alphabet."""
    if len(s) % 5:
        raise ValueError(f"Z85 length must be a multiple of 5, got {len(s)}")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for ch in s[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid Z85 character {ch!r}") from None
        if acc > 0xFFFFFFFF:
            # Z85 spec: a 5-char group encodes at most 2^32-1; letting
            # .to_bytes raise would leak OverflowError past the module's
            # ValueError contract.
            raise ValueError(f"Z85 group overflows 32 bits: {s[i:i+5]!r}")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input must be a multiple of 4 bytes, got {len(b)}")
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_CHARS[rem])
        out += reversed(chunk)
    return "".join(out)


def _parse_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard-serialized 32-bit roaring bitmap starting at
    ``pos``; return (values, new_pos). RoaringFormatSpec layouts:

    cookie 12347 (has run containers): size = (cookie >> 16) + 1, then a
    run-flag bitset of (size+7)//8 bytes; offset header present only when
    size >= 4. cookie 12346: size in the next 4 bytes, no run containers,
    offset header always present. Containers follow in key order: run
    (n_runs × [start, length-1]), array (cardinality × uint16) when
    cardinality <= 4096, else a 8192-byte bitmap.
    """
    (cookie,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if (cookie & 0xFFFF) == 12347:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = data[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = size >= 4
    elif cookie == 12346:
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"invalid roaring bitmap cookie {cookie}")

    keys_cards = []
    for i in range(size):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # sequential read; offsets are redundant

    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                # Pair (v, l) encodes the inclusive interval [v, v+l]
                # (RoaringFormatSpec "run containers").
                start, run_len = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(range(base + start, base + start + run_len + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            chunk = data[pos : pos + 8192]
            pos += 8192
            for word_i in range(1024):
                (word,) = struct.unpack_from("<Q", chunk, word_i * 8)
                while word:
                    low = word & -word
                    values.append(base + word_i * 64 + low.bit_length() - 1)
                    word ^= low
    return values, pos


def parse_roaring_bitmap_array(data: bytes) -> list[int]:
    """Portable-format 64-bit RoaringBitmapArray -> sorted row indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {magic} (expected {_MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        values, pos = _parse_roaring32(data, pos)
        out.extend((key << 32) | v for v in values)
    return out


def dv_file_path(table_path: str, descriptor: dict[str, Any]) -> str:
    """Resolve the on-disk file for a file-backed DV descriptor.

    storageType='u': ``pathOrInlineDv = <optional random prefix><20-char
    Z85 uuid>``; the file is ``<prefix>/deletion_vector_<uuid>.bin``
    under the table root, and the resolved path is CONTAINMENT-checked —
    a crafted prefix ('..' or absolute) must not escape the root, since
    deep clone uses the result as a WRITE destination. storageType='p':
    ``pathOrInlineDv`` IS the path, verbatim (shallow clones point at
    the SOURCE table's bins — legitimately outside this root); z85-
    decoding its tail would fabricate a garbage path (any 20 hex/dash
    chars are valid Z85), which silently corrupted VACUUM's keep-set."""
    st = descriptor.get("storageType")
    pod = descriptor["pathOrInlineDv"]
    if st == "p":
        return _strip_file_scheme(pod)
    if st != "u":
        raise ValueError(f"no file path for DV storageType {st!r}")
    prefix, enc_uuid = pod[:-20], pod[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc_uuid))
    name = f"deletion_vector_{u}.bin"
    out = os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )
    # realpath, not abspath: a lexical check passes when the prefix names
    # a symlink inside the table dir pointing outside it — read/WRITE
    # (deep clone) would then follow the link out of the root.
    root = os.path.realpath(table_path)
    if not os.path.realpath(out).startswith(root + os.sep):
        raise ValueError(
            f"DV prefix escapes the table root: {pod!r}"
        )
    return out


def _strip_file_scheme(path: str) -> str:
    """file:-scheme URI -> plain path (authority-form and Hadoop's
    single-slash ``file:/x`` both normalize; everything else verbatim)."""
    if not path.startswith("file:"):
        return path
    from urllib.parse import urlparse

    parsed = urlparse(path)
    return parsed.path or path


def read_dv_bytes(table_path: str, descriptor: dict[str, Any]) -> bytes:
    """The serialized RoaringBitmapArray bytes for one DV descriptor
    (storage u/i/p), framing and checksum verified. Metadata-sized: this is
    the compressed bitmap, NOT the expanded row indexes — safe to hold (and
    ship to executors) per file."""
    st = descriptor.get("storageType")
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        decoded = z85_decode(descriptor["pathOrInlineDv"])
        if len(decoded) < size:
            raise ValueError(
                f"inline DV shorter than its declared sizeInBytes: "
                f"{len(decoded)} < {size}"
            )
        return decoded[:size]
    if st in ("u", "p"):
        path = dv_file_path(table_path, descriptor)
        offset = int(descriptor.get("offset") or 0)
        with open(path, "rb") as fh:
            fh.seek(offset)
            (stored_size,) = struct.unpack(">i", fh.read(4))
            if stored_size != size:
                raise ValueError(
                    f"DV size mismatch at {path}:{offset}: descriptor says "
                    f"{size}, file says {stored_size}"
                )
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
            if crc != (zlib.crc32(data) & 0xFFFFFFFF):
                raise ValueError(f"DV checksum mismatch at {path}:{offset}")
        return data
    raise ValueError(f"unsupported DV storageType {st!r}")


def read_deletion_vector(table_path: str, descriptor: dict[str, Any]) -> list[int]:
    """Deleted row indexes for one file's DV descriptor (storage u/i/p)."""
    data = read_dv_bytes(table_path, descriptor)
    idx = parse_roaring_bitmap_array(data)
    card = int(descriptor.get("cardinality") or 0)
    if card and card != len(idx):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap has "
            f"{len(idx)}"
        )
    return idx


# ------------------------------------------------------------- write side
def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard 32-bit roaring serialization (RoaringFormatSpec), writer
    side: array containers for cardinality <= 4096, bitmap containers
    above. Run containers are parsed but never emitted (matches common
    writer behavior; they are an optional optimization)."""
    chunks: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
    # chunks was built from sorted input: keys ascend, values per key are
    # sorted-unique — iterate one snapshot, no re-sorting on the
    # O(deleted rows) DML write path.
    items = list(chunks.items())
    size = len(items)
    out = bytearray()
    out += struct.pack("<I", 12346)
    out += struct.pack("<I", size)
    for key, vals in items:
        out += struct.pack("<HH", key, len(vals) - 1)
    pos = len(out) + 4 * size
    for _key, vals in items:
        out += struct.pack("<I", pos)
        pos += 2 * len(vals) if len(vals) <= 4096 else 8192
    for _key, vals in items:
        if len(vals) <= 4096:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v // 8] |= 1 << (v % 8)
            out += bits
    return bytes(out)


def serialize_roaring_bitmap_array(indexes: list[int]) -> bytes:
    """Portable 64-bit RoaringBitmapArray bytes for sorted row indexes."""
    by_high: dict[int, list[int]] = {}
    for i in sorted(set(indexes)):
        by_high.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _MAGIC, len(by_high)))
    for high, vals in sorted(by_high.items()):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(vals)
    return bytes(out)


def write_deletion_vectors(
    table_path: str, per_file_indexes: dict[str, list[int]]
) -> dict[str, dict[str, Any]]:
    """Write ONE UUID-named .bin holding a DV per file (the delta-spark
    layout: many DVs share a file, distinguished by offset) and return
    rel_data_path -> descriptor.

    Empty inputs never touch disk: a DV must mark at least one row (the
    protocol forbids cardinality 0), so empty index lists are skipped
    and an all-empty call returns {} without creating an orphan bin."""
    per_file_indexes = {
        rel: idxs for rel, idxs in per_file_indexes.items() if idxs
    }
    if not per_file_indexes:
        return {}
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    descriptors: dict[str, dict[str, Any]] = {}
    with open(os.path.join(table_path, name), "wb") as fh:
        fh.write(b"\x01")  # format version byte
        offset = 1
        for rel, idxs in sorted(per_file_indexes.items()):
            data = serialize_roaring_bitmap_array(idxs)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descriptors[rel] = {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": len(set(idxs)),
            }
            offset += 4 + len(data) + 4
    return descriptors
