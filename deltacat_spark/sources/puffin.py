"""Jar-free Apache Puffin file codec — the Iceberg v3 carrier for
DELETION VECTORS (blob type `deletion-vector-v1`).

Everything here is determined by the two public specs:

- Puffin spec (iceberg.apache.org/puffin-spec): a file is
  `Magic Blob₁ … Blobₙ Footer`; Magic is the 4 bytes 0x50 0x46 0x41
  0x31 ("PFA1"). Footer is `Magic FooterPayload FooterPayloadSize
  (i32 LE) Flags (4 bytes) Magic`; FooterPayload is UTF-8 JSON
  (`{"blobs": [...], "properties": {...}}`), LZ4-compressed when
  footer flag bit 0 is set (refused here — no lz4 in this
  environment, and engines write uncompressed by default). Each blob
  entry carries `type`, `fields`, `snapshot-id`, `sequence-number`,
  `offset`, `length`, and a string `properties` map.

- Iceberg v3 spec (§Deletion vectors): a `deletion-vector-v1` blob is
  `[u32 BE length of magic+vector][magic D1 D3 39 64][vector][u32 BE
  CRC-32 of magic+vector]` where the vector is a 64-bit roaring
  bitmap in the PORTABLE format (the same serialization
  `sources/deltadv.py` implements for Delta DVs — shared here). The
  blob's `properties` carry `referenced-data-file` and
  `cardinality`; the manifest entry stores `content_offset` /
  `content_size_in_bytes` (data_file fields 144/145) pointing at the
  blob, so a reader can skip the footer entirely.

Reference surface: the reference reaches Iceberg via pyiceberg
(`deltacat/experimental/storage/iceberg/`); v3 DV reads are where
external tables are heading (VERDICT r13 gap #1).
"""

from __future__ import annotations

import binascii
import json
import os
import struct
from typing import Any

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
DV_BLOB_TYPE = "deletion-vector-v1"

FLAG_FOOTER_COMPRESSED = 1  # footer flags byte 0, bit 0


# ---------------------------------------------------------------------------
# deletion-vector blob codec
# ---------------------------------------------------------------------------


def dv_blob_encode(positions: list[int]) -> bytes:
    """Spec deletion-vector-v1 blob bytes for sorted/unique u64 row
    positions."""
    from deltacat_spark.sources.deltadv import roaring64_serialize

    body = DV_MAGIC + roaring64_serialize(sorted(set(positions)))
    crc = binascii.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + body + struct.pack(">I", crc)


def dv_blob_encode_serialized(bitmap: bytes) -> bytes:
    """deletion-vector-v1 blob bytes for an ALREADY-SERIALIZED portable
    roaring64 bitmap — the executor-side aggregation path hands the
    driver bitmaps, never position lists."""
    body = DV_MAGIC + bitmap
    crc = binascii.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + body + struct.pack(">I", crc)


def dv_blob_decode(blob: bytes) -> list[int]:
    """Row positions of one deletion-vector-v1 blob (magic + CRC
    validated)."""
    from deltacat_spark.sources.deltadv import roaring64_deserialize

    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + length]
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4].hex()} "
            f"(want {DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    actual = binascii.crc32(body) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"deletion-vector CRC mismatch: stored {crc:#x}, "
            f"computed {actual:#x}"
        )
    return roaring64_deserialize(body[4:])


# ---------------------------------------------------------------------------
# file layout
# ---------------------------------------------------------------------------


def write_puffin(
    path: str,
    blobs: list[tuple[bytes, dict]],
    properties: dict[str, str] | None = None,
) -> list[dict]:
    """Write a Puffin file; `blobs` is [(blob_bytes, blob_meta)] where
    blob_meta fills the footer entry (type/fields/snapshot-id/
    sequence-number/properties — offset+length are computed). Returns
    the footer blob entries (what a manifest's content_offset /
    content_size_in_bytes point at)."""
    entries: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        off = 4
        for blob, meta in blobs:
            entry = {
                "type": meta.get("type", DV_BLOB_TYPE),
                "fields": meta.get("fields", []),
                "snapshot-id": meta.get("snapshot-id", 0),
                "sequence-number": meta.get("sequence-number", 0),
                "offset": off,
                "length": len(blob),
            }
            if meta.get("properties"):
                entry["properties"] = {
                    str(k): str(v) for k, v in meta["properties"].items()
                }
            entries.append(entry)
            f.write(blob)
            off += len(blob)
        payload = json.dumps(
            {"blobs": entries, "properties": dict(properties or {})}
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        f.write(MAGIC)
    return entries


def read_footer(path: str) -> dict:
    """The footer payload JSON ({"blobs": [...], "properties": ...})."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path} is not a Puffin file (no PFA1 magic)")
        f.seek(size - 12)
        tail = f.read(12)
        (payload_size,) = struct.unpack_from("<i", tail, 0)
        flags = tail[4:8]
        if tail[8:12] != MAGIC:
            raise ValueError(f"{path}: corrupt Puffin footer (no end magic)")
        if flags[0] & FLAG_FOOTER_COMPRESSED:
            raise NotImplementedError(
                f"{path}: LZ4-compressed Puffin footer is not supported "
                "in this environment (no lz4 codec); rewrite with an "
                "uncompressed footer"
            )
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != MAGIC:
            raise ValueError(
                f"{path}: corrupt Puffin footer (no payload magic)"
            )
        return json.loads(f.read(payload_size).decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    """One blob's bytes by footer/manifest coordinates."""
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def dv_positions(path: str, offset: int, length: int) -> list[int]:
    """Deleted row positions of the DV blob at (offset, length) — the
    coordinates a v3 manifest entry's content_offset /
    content_size_in_bytes carry."""
    return dv_blob_decode(read_blob(path, offset, length))


def dv_entries(path: str) -> list[dict[str, Any]]:
    """All deletion-vector-v1 footer entries of a Puffin file, each
    with `referenced-data-file` surfaced from blob properties."""
    out = []
    for b in read_footer(path).get("blobs", []):
        if b.get("type") == DV_BLOB_TYPE:
            entry = dict(b)
            entry["referenced-data-file"] = (b.get("properties") or {}).get(
                "referenced-data-file"
            )
            out.append(entry)
    return out
