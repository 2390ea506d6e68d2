"""Jar-free Apache Hudi HoodieLogFormat (`#HUDI#` block framing) codec.

Every real Hudi MERGE_ON_READ writer lands updates as block-framed log
files; until this module, `sources/hudi.py` refused them outright (the
r12 guard) and wrote parquet-payload logs only. This implements the
published 0.x log wire format — the framing is fully determined by the
Apache Hudi sources (`HoodieLogFormatWriter.appendBlock`,
`HoodieLogFileReader`, `HoodieLogBlock`, all ASF-licensed public code)
— so external Hudi MoR tables read AND blocks this module frames are
consumable by real Hudi readers.

Reference surface: DatastoreType HUDI (`deltacat/types/media.py:353-420`)
ingests real Hudi tables through the datastore registry
(`deltacat/api.py:97-480`); MoR log handling is the part the parquet
deviation couldn't cover.

Block layout (Java DataOutputStream = big-endian; one log file is a
concatenation of blocks):

    magic           6B   b"#HUDI#"
    blocksize       i64  bytes from the next field through the reverse
                         pointer inclusive (= 4 + 4 + len(header) + 8 +
                         len(content) + len(footer) + 8)
    format version  i32  log format version (1)
    block type      i32  HoodieLogBlockType ordinal (table below)
    header          map  i32 count, then per entry:
                         i32 HeaderMetadataType ordinal, i32 len, utf8
    content length  i64
    content         …    type-specific (below)
    footer          map  same encoding as header (usually count=0)
    reverse pointer i64  total block length INCLUDING magic
                         (= 6 + 8 + blocksize)

Block type ordinals: 0 COMMAND, 1 DELETE, 2 CORRUPT, 3 AVRO_DATA,
4 HFILE_DATA, 5 PARQUET_DATA, 6 CDC_DATA.
Header key ordinals: 0 INSTANT_TIME, 1 TARGET_INSTANT_TIME, 2 SCHEMA,
3 COMMAND_BLOCK_TYPE, 4 COMPACTED_BLOCK_TIMES (+ newer ones tolerated
numerically).

AVRO_DATA content: i32 content-format version, i32 record count, then
per record i32 length + Avro binary body (writer schema = the block's
SCHEMA header; decoded with the stdlib codec in `avrofile.py`).
PARQUET_DATA content: a complete parquet file (footer included) —
pyarrow reads it from the bytes directly.
COMMAND content: empty; COMMAND_BLOCK_TYPE "0" = ROLLBACK_PREVIOUS_BLOCK:
scanners drop earlier blocks whose INSTANT_TIME equals the command's
TARGET_INSTANT_TIME (failed-write cleanup, Hudi's
`AbstractHoodieLogRecordReader` semantics). Scanners also skip data
blocks whose INSTANT_TIME is not in the completed timeline
(uncommitted appends are invisible until their deltacommit lands).
DELETE content (r14 — hard deletes): `[i32 content version][i32
payload length][payload]`. Version 3+ payloads are Avro-binary
`HoodieDeleteRecordList` (the public avsc in hudi-common:
deleteRecordList = array of {recordKey, partitionPath, orderingVal},
all nullable) and decode here; the scanner surfaces each delete as a
marker row (`_hoodie_is_deleted=true`, data columns null) so the
existing latest-wins merge + soft-delete filter hard-delete the key.
Version 1/2 payloads are Kryo-serialized (HoodieKey[] /
DeleteRecord[]) and refuse loudly — no jar-free Kryo. This writer
emits version 3 with null orderingVal (union index 0 — unambiguous
regardless of union member order).

CDC_DATA blocks (r14) share the AVRO_DATA wire layout; their records
are supplemental CHANGE EVENTS (op/ts/before/after per the block's
schema header) that `cdc_records()` surfaces instant-filtered and
rollback-aware — data scans skip them, since the rows they describe
also land through regular data blocks. HFILE blocks still refuse by
name (no jar-free HBase HFile codec).

Scale shape: log files decode PER FILE on executors (`scan_framed_logs`
maps paths through Arrow-batched `mapInPandas`) — per-file parallelism
is exactly Hudi's own log-scanner unit of work (one file group's logs
are one scanner). Only block HEADERS are read driver-side (seek-based,
content skipped) to derive the union read schema.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

from deltacat_spark.localdf import local_df

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5
CDC_DATA_BLOCK = 6

_BLOCK_NAMES = {
    0: "COMMAND_BLOCK",
    1: "DELETE_BLOCK",
    2: "CORRUPT_BLOCK",
    3: "AVRO_DATA_BLOCK",
    4: "HFILE_DATA_BLOCK",
    5: "PARQUET_DATA_BLOCK",
    6: "CDC_DATA_BLOCK",
}

# HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

ROLLBACK_PREVIOUS_BLOCK = "0"  # HoodieCommandBlockTypeEnum ordinal string


# ---------------------------------------------------------------------------
# low-level framing
# ---------------------------------------------------------------------------


def _encode_meta(meta: dict[int, str]) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(meta)))
    for k in sorted(meta):
        v = meta[k].encode("utf-8")
        out.write(struct.pack(">i", k))
        out.write(struct.pack(">i", len(v)))
        out.write(v)
    return out.getvalue()


def _decode_meta(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (count,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    out: dict[int, str] = {}
    for _ in range(count):
        key, vlen = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out[key] = buf[pos : pos + vlen].decode("utf-8")
        pos += vlen
    return out, pos


def frame_block(
    block_type: int,
    content: bytes,
    header: dict[int, str],
    footer: dict[int, str] | None = None,
) -> bytes:
    """One spec-framed log block (`HoodieLogFormatWriter.appendBlock`
    byte-for-byte: magic, blocksize, version, type, header, content
    length, content, footer, reverse pointer)."""
    hb = _encode_meta(header)
    fb = _encode_meta(footer or {})
    blocksize = 4 + 4 + len(hb) + 8 + len(content) + len(fb) + 8
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(struct.pack(">q", blocksize))
    out.write(struct.pack(">i", LOG_FORMAT_VERSION))
    out.write(struct.pack(">i", block_type))
    out.write(hb)
    out.write(struct.pack(">q", len(content)))
    out.write(content)
    out.write(fb)
    out.write(struct.pack(">q", 6 + 8 + blocksize))
    return out.getvalue()


def read_blocks(path_or_bytes: str | bytes) -> list[dict[str, Any]]:
    """Parse a framed log file into blocks:
    [{type, type_name, version, header, footer, content}]. A span that
    does not start with the magic (torn/partial write) is scanned
    forward to the next magic and surfaced as a CORRUPT_BLOCK entry —
    the `HoodieLogFileReader` recovery behavior, so one bad append
    doesn't hide the valid blocks after it."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    blocks: list[dict[str, Any]] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 6] != MAGIC:
            nxt = data.find(MAGIC, pos + 1)
            end = nxt if nxt != -1 else n
            blocks.append(
                {
                    "type": CORRUPT_BLOCK,
                    "type_name": "CORRUPT_BLOCK",
                    "version": None,
                    "header": {},
                    "footer": {},
                    "content": data[pos:end],
                }
            )
            pos = end
            continue
        start = pos
        pos += 6
        try:
            (blocksize,) = struct.unpack_from(">q", data, pos)
            pos += 8
            block_end = pos + blocksize
            if block_end > n:
                raise ValueError("truncated block")
            version, btype = struct.unpack_from(">ii", data, pos)
            pos += 8
            header, pos = _decode_meta(data, pos)
            (clen,) = struct.unpack_from(">q", data, pos)
            pos += 8
            content = data[pos : pos + clen]
            if len(content) != clen:
                raise ValueError("truncated content")
            pos += clen
            footer, pos = _decode_meta(data, pos)
            (reverse,) = struct.unpack_from(">q", data, pos)
            pos += 8
            if pos != block_end or reverse != pos - start:
                raise ValueError("block length bookkeeping mismatch")
        except (struct.error, ValueError):
            # torn append: everything to the next magic is corrupt
            nxt = data.find(MAGIC, start + 6)
            end = nxt if nxt != -1 else n
            blocks.append(
                {
                    "type": CORRUPT_BLOCK,
                    "type_name": "CORRUPT_BLOCK",
                    "version": None,
                    "header": {},
                    "footer": {},
                    "content": data[start:end],
                }
            )
            pos = end
            continue
        blocks.append(
            {
                "type": btype,
                "type_name": _BLOCK_NAMES.get(btype, str(btype)),
                "version": version,
                "header": header,
                "footer": footer,
                "content": content,
            }
        )
    return blocks


def iter_block_headers(path: str) -> Iterator[dict[str, Any]]:
    """Headers only — seeks past content, so deriving the read schema
    of a large log file costs O(blocks) small reads, not a full scan."""
    with open(path, "rb") as f:
        while True:
            magic = f.read(6)
            if not magic:
                return
            if magic != MAGIC:
                # stop at the first unframed span; header peek is
                # best-effort (read_blocks does the full corrupt-block
                # recovery, file_records the fail-loudly check)
                return
            try:
                (blocksize,) = struct.unpack(">q", f.read(8))
                body_start = f.tell()
                version, btype = struct.unpack(">ii", f.read(8))
                # header map is small; read it field-wise
                (count,) = struct.unpack(">i", f.read(4))
                header: dict[int, str] = {}
                for _ in range(count):
                    key, vlen = struct.unpack(">ii", f.read(8))
                    if vlen < 0 or vlen > 1 << 30:
                        raise ValueError("implausible header length")
                    header[key] = f.read(vlen).decode("utf-8")
            except (struct.error, ValueError, UnicodeDecodeError):
                return  # torn block: best-effort peek ends here
            yield {"type": btype, "version": version, "header": header}
            f.seek(body_start + blocksize)


# ---------------------------------------------------------------------------
# content codecs
# ---------------------------------------------------------------------------


def encode_avro_content(rows: list[dict], avro_schema: dict) -> bytes:
    """AVRO_DATA_BLOCK content: i32 content version, i32 record count,
    then per record i32 length + Avro binary body."""
    from deltacat_spark.sources import avrofile

    env: dict[str, Any] = {}
    avrofile._collect_names(avro_schema, env)
    out = io.BytesIO()
    out.write(struct.pack(">i", 2))  # content-format version
    out.write(struct.pack(">i", len(rows)))
    for row in rows:
        enc = avrofile._Encoder()
        avrofile.write_value(avro_schema, row, enc, env)
        body = enc.getvalue()
        out.write(struct.pack(">i", len(body)))
        out.write(body)
    return out.getvalue()


def decode_avro_content(content: bytes, avro_schema: dict) -> list[dict]:
    from deltacat_spark.sources import avrofile

    env: dict[str, Any] = {}
    avrofile._collect_names(avro_schema, env)
    pos = 0
    (_version,) = struct.unpack_from(">i", content, pos)
    pos += 4
    (count,) = struct.unpack_from(">i", content, pos)
    pos += 4
    rows: list[dict] = []
    for _ in range(count):
        (rlen,) = struct.unpack_from(">i", content, pos)
        pos += 4
        dec = avrofile._Decoder(content[pos : pos + rlen])
        pos += rlen
        rows.append(avrofile.read_value(avro_schema, dec, env))
    return rows


# public avsc shape (hudi-common HoodieDeleteRecordList.avsc): the
# writer side only ever encodes null orderingVal (union index 0), so
# interop does not hinge on the non-null member order
DELETE_RECORD_LIST_SCHEMA: dict = {
    "namespace": "org.apache.hudi.avro.model",
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {
                            "name": "recordKey",
                            "type": ["null", "string"],
                            "default": None,
                        },
                        {
                            "name": "partitionPath",
                            "type": ["null", "string"],
                            "default": None,
                        },
                        {
                            "name": "orderingVal",
                            "type": [
                                "null",
                                "boolean",
                                "int",
                                "long",
                                "float",
                                "double",
                                "bytes",
                                "string",
                            ],
                            "default": None,
                        },
                    ],
                },
            },
            "default": [],
        }
    ],
}

DELETE_CONTENT_VERSION = 3  # first avro-serialized HoodieDeleteBlock version


def encode_delete_content(deletes: list[dict]) -> bytes:
    """DELETE_BLOCK content: i32 version(3), i32 payload length, then
    Avro-binary HoodieDeleteRecordList. `deletes` entries:
    {recordKey, partitionPath} (orderingVal always null here)."""
    from deltacat_spark.sources import avrofile

    env: dict[str, Any] = {}
    avrofile._collect_names(DELETE_RECORD_LIST_SCHEMA, env)
    enc = avrofile._Encoder()
    avrofile.write_value(
        DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {
                    "recordKey": d.get("recordKey"),
                    "partitionPath": d.get("partitionPath"),
                    "orderingVal": None,
                }
                for d in deletes
            ]
        },
        enc,
        env,
    )
    body = enc.getvalue()
    return struct.pack(">ii", DELETE_CONTENT_VERSION, len(body)) + body


def decode_delete_content(content: bytes) -> list[dict]:
    """[{recordKey, partitionPath, orderingVal}] of a DELETE_BLOCK.
    Kryo payload versions (1/2) refuse loudly."""
    from deltacat_spark.sources import avrofile

    version, length = struct.unpack_from(">ii", content, 0)
    if version < DELETE_CONTENT_VERSION:
        raise NotImplementedError(
            f"Hudi DELETE_BLOCK content version {version} is "
            "Kryo-serialized (HoodieKey[]/DeleteRecord[]) — no jar-free "
            "Kryo; rewrite the table with a Hudi release that emits the "
            "avro delete payload (version 3+), or compact with a real "
            "Hudi writer"
        )
    env: dict[str, Any] = {}
    avrofile._collect_names(DELETE_RECORD_LIST_SCHEMA, env)
    dec = avrofile._Decoder(content[8 : 8 + length])
    rec = avrofile.read_value(DELETE_RECORD_LIST_SCHEMA, dec, env)
    return list(rec.get("deleteRecordList") or [])


def block_records(block: dict[str, Any]) -> list[dict]:
    """Decode one data block's records to python dicts. DELETE blocks
    come back as MARKER rows — meta key/partition/commit-time plus
    `_hoodie_is_deleted=true`, data columns absent — so the standard
    latest-wins merge + soft-delete filter applies the hard delete."""
    btype = block["type"]
    if btype == AVRO_DATA_BLOCK:
        schema_json = block["header"].get(H_SCHEMA)
        if not schema_json:
            raise ValueError("AVRO_DATA_BLOCK without a SCHEMA header")
        schema = json.loads(schema_json)
        rows = decode_avro_content(block["content"], schema)
        _decode_logical_columns(rows, schema)
        return rows
    if btype == PARQUET_DATA_BLOCK:
        import pyarrow.parquet as pq

        return pq.read_table(io.BytesIO(block["content"])).to_pylist()
    if btype == DELETE_BLOCK:
        inst = block["header"].get(H_INSTANT_TIME)
        return [
            {
                "_hoodie_record_key": d.get("recordKey"),
                "_hoodie_partition_path": d.get("partitionPath") or "",
                "_hoodie_commit_time": inst,
                "_hoodie_is_deleted": True,
            }
            for d in decode_delete_content(block["content"])
        ]
    if btype == CDC_DATA_BLOCK:
        # HoodieCDCDataBlock shares the AVRO_DATA wire layout; its
        # records are CHANGE EVENTS (op/ts/before/after per the
        # block's schema header), not table rows — data scans skip
        # these (valid_data_blocks), cdc_records() surfaces them
        schema_json = block["header"].get(H_SCHEMA)
        if not schema_json:
            raise ValueError("CDC_DATA_BLOCK without a SCHEMA header")
        schema = json.loads(schema_json)
        rows = decode_avro_content(block["content"], schema)
        _decode_logical_columns(rows, schema)
        return rows
    if btype == HFILE_DATA_BLOCK:
        raise NotImplementedError(
            "Hudi HFILE_DATA_BLOCK payloads are not supported by this "
            "jar-free reader (they need the HBase HFile codec) — "
            "compact with a real Hudi writer"
        )
    raise ValueError(f"block type {btype} carries no records")


# ---------------------------------------------------------------------------
# writers (spec-shaped external framing; also what tests plant)
# ---------------------------------------------------------------------------


def append_avro_data_block(
    path: str, rows: list[dict], avro_schema: dict, instant: str
) -> None:
    rows = [dict(r) for r in rows]
    encode_logical_values(rows, avro_schema)
    blk = frame_block(
        AVRO_DATA_BLOCK,
        encode_avro_content(rows, avro_schema),
        {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(avro_schema)},
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "ab") as f:
        f.write(blk)


def append_parquet_data_block(path: str, table, instant: str) -> None:
    """`table` is a pyarrow Table; content is a complete parquet file."""
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf)
    from deltacat_spark.sources.avrofile import avro_schema_for
    from pyspark.sql.pandas.types import from_arrow_schema

    header = {H_INSTANT_TIME: instant}
    try:
        header[H_SCHEMA] = json.dumps(
            avro_schema_for(from_arrow_schema(table.schema))
        )
    except Exception:
        pass  # schema header is advisory for parquet blocks
    blk = frame_block(PARQUET_DATA_BLOCK, buf.getvalue(), header)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "ab") as f:
        f.write(blk)


def append_delete_block(
    path: str, deletes: list[dict], instant: str
) -> None:
    """Append one spec-framed DELETE block (avro v3 payload).
    `deletes` entries: {recordKey, partitionPath}."""
    blk = frame_block(
        DELETE_BLOCK,
        encode_delete_content(deletes),
        {H_INSTANT_TIME: instant},
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "ab") as f:
        f.write(blk)


def append_cdc_block(
    path: str, rows: list[dict], avro_schema: dict, instant: str
) -> None:
    """Append one spec-framed CDC_DATA block (same avro wire as
    AVRO_DATA; `rows` are change events in the caller's CDC schema —
    e.g. {op, ts_ms, before, after})."""
    rows = [dict(r) for r in rows]
    encode_logical_values(rows, avro_schema)
    blk = frame_block(
        CDC_DATA_BLOCK,
        encode_avro_content(rows, avro_schema),
        {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(avro_schema)},
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "ab") as f:
        f.write(blk)


def cdc_records(
    path: str, valid_instants: set[str] | None = None
) -> list[dict]:
    """All change events of one framed CDC log file, each stamped
    `_cdc_instant` — instant-filtered and rollback-aware like data
    blocks (a rolled-back write's CDC never surfaces)."""
    blocks = read_blocks(path)
    ensure_decodable(blocks, path)
    alive: list[dict] = []
    for b in blocks:
        if b["type"] == CORRUPT_BLOCK:
            continue
        if b["type"] == COMMAND_BLOCK:
            cmd = b["header"].get(H_COMMAND_BLOCK_TYPE, ROLLBACK_PREVIOUS_BLOCK)
            if cmd == ROLLBACK_PREVIOUS_BLOCK:
                target = b["header"].get(H_TARGET_INSTANT_TIME)
                alive = [
                    a
                    for a in alive
                    if a["header"].get(H_INSTANT_TIME) != target
                ]
            continue
        if b["type"] == CDC_DATA_BLOCK:
            inst = b["header"].get(H_INSTANT_TIME)
            if valid_instants is not None and inst not in valid_instants:
                continue
            alive.append(b)
    out: list[dict] = []
    for b in alive:
        inst = b["header"].get(H_INSTANT_TIME)
        for r in block_records(b):
            out.append(dict(r, _cdc_instant=inst))
    return out


def append_rollback_block(path: str, target_instant: str, instant: str) -> None:
    blk = frame_block(
        COMMAND_BLOCK,
        b"",
        {
            H_INSTANT_TIME: instant,
            H_TARGET_INSTANT_TIME: target_instant,
            H_COMMAND_BLOCK_TYPE: ROLLBACK_PREVIOUS_BLOCK,
        },
    )
    with open(path, "ab") as f:
        f.write(blk)


# ---------------------------------------------------------------------------
# scanning (rollback-aware record extraction)
# ---------------------------------------------------------------------------


def is_framed(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(6) == MAGIC
    except OSError:
        return False


def ensure_decodable(blocks: list[dict], path: str) -> None:
    """A TRAILING corrupt span after valid blocks is a torn append and
    is skipped (Hudi's recovery behavior); a file with corrupt spans
    and NO decodable block at all is refused — silently reading it as
    empty would drop data."""
    decodable = [
        b
        for b in blocks
        if b["type"]
        in (
            AVRO_DATA_BLOCK,
            PARQUET_DATA_BLOCK,
            COMMAND_BLOCK,
            DELETE_BLOCK,
            CDC_DATA_BLOCK,
        )
    ]
    if not decodable and any(b["type"] == CORRUPT_BLOCK for b in blocks):
        raise ValueError(
            f"Hudi log file {os.path.basename(path)} opens with the "
            "#HUDI# magic but contains no decodable HoodieLogFormat "
            "block — corrupt file, refusing to read it as empty"
        )


def valid_data_blocks(
    blocks: list[dict], valid_instants: set[str] | None
) -> list[dict]:
    """Data blocks that survive COMMAND rollbacks and (when the
    timeline is given) belong to completed instants — the
    `AbstractHoodieLogRecordReader` visibility rules. Corrupt blocks
    are skipped (a torn append is invisible, same as Hudi)."""
    alive: list[dict] = []
    for b in blocks:
        if b["type"] == CORRUPT_BLOCK:
            continue
        if b["type"] == COMMAND_BLOCK:
            cmd = b["header"].get(H_COMMAND_BLOCK_TYPE, ROLLBACK_PREVIOUS_BLOCK)
            if cmd == ROLLBACK_PREVIOUS_BLOCK:
                target = b["header"].get(H_TARGET_INSTANT_TIME)
                alive = [
                    a
                    for a in alive
                    if a["header"].get(H_INSTANT_TIME) != target
                ]
            continue
        if b["type"] in (AVRO_DATA_BLOCK, PARQUET_DATA_BLOCK, DELETE_BLOCK):
            # DELETE blocks follow the same visibility rules as data:
            # instant-filtered, rollback-able (a rolled-back delete
            # never applies)
            inst = b["header"].get(H_INSTANT_TIME)
            if valid_instants is not None and inst not in valid_instants:
                continue
            alive.append(b)
            continue
        if b["type"] == CDC_DATA_BLOCK:
            # CDC blocks are SUPPLEMENTAL change events — the rows they
            # describe also land through the regular data blocks, so a
            # data scan must skip them (r14; cdc_records() reads them)
            continue
        # HFILE: refuse loudly rather than silently misread
        block_records(b)
    return alive


def file_records(
    path: str, valid_instants: set[str] | None = None
) -> list[dict]:
    """All visible records of one framed log file (driver-side; the
    distributed path is `scan_framed_logs`); `ensure_decodable`
    semantics for corrupt spans."""
    blocks = read_blocks(path)
    ensure_decodable(blocks, path)
    out: list[dict] = []
    for b in valid_data_blocks(blocks, valid_instants):
        out.extend(block_records(b))
    return out


def _logical_of(avro_type: Any) -> str | None:
    """logicalType of a top-level field type (unions of [null, T]
    looked through)."""
    t = avro_type
    if isinstance(t, list):
        nn = [b for b in t if b != "null"]
        t = nn[0] if len(nn) == 1 else None
    if isinstance(t, dict):
        return t.get("logicalType")
    return None


def _spark_schema_with_logical(avro_schema: dict):
    """`avrofile.spark_schema_for`, upgraded for TOP-LEVEL
    timestamp-micros/date logical types (the shapes Hudi meta/data
    columns use) — the binary codec decodes them at base type, so the
    scan generator converts (`_decode_logical_columns`)."""
    from pyspark.sql import types as T

    from deltacat_spark.sources.avrofile import spark_schema_for

    st = spark_schema_for(avro_schema)
    fields = list(st.fields)
    for i, af in enumerate(avro_schema.get("fields", [])):
        lt = _logical_of(af["type"])
        if lt == "timestamp-micros":
            fields[i] = T.StructField(
                fields[i].name, T.TimestampType(), fields[i].nullable
            )
        elif lt == "date":
            fields[i] = T.StructField(
                fields[i].name, T.DateType(), fields[i].nullable
            )
    return T.StructType(fields)


def _decode_logical_columns(rows: list[dict], avro_schema: dict) -> None:
    """In place: long epoch-micros → datetime, int days → date for
    top-level logical fields (the base types the codec decoded at)."""
    import datetime as _dt

    conv: list[tuple[str, Any]] = []
    for af in avro_schema.get("fields", []):
        lt = _logical_of(af["type"])
        if lt == "timestamp-micros":
            conv.append(
                (
                    af["name"],
                    lambda v: _dt.datetime.fromtimestamp(
                        v / 1_000_000, _dt.timezone.utc
                    ).replace(tzinfo=None),
                )
            )
        elif lt == "date":
            conv.append(
                (
                    af["name"],
                    lambda v: _dt.date(1970, 1, 1) + _dt.timedelta(days=v),
                )
            )
    if not conv:
        return
    for r in rows:
        for name, fn in conv:
            if r.get(name) is not None and not isinstance(
                r[name], (_dt.datetime, _dt.date)
            ):
                r[name] = fn(r[name])


def encode_logical_values(rows: list[dict], avro_schema: dict) -> None:
    """In place, the write-side inverse: datetime → epoch micros,
    date → epoch days, so `avrofile.write_value` sees base types."""
    import datetime as _dt

    names: list[tuple[str, str]] = []
    for af in avro_schema.get("fields", []):
        lt = _logical_of(af["type"])
        if lt in ("timestamp-micros", "date"):
            names.append((af["name"], lt))
    if not names:
        return
    epoch = _dt.date(1970, 1, 1)
    for r in rows:
        for name, lt in names:
            v = r.get(name)
            if v is None:
                continue
            if lt == "timestamp-micros" and isinstance(v, _dt.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                r[name] = int(v.timestamp() * 1_000_000)
            elif lt == "date" and isinstance(v, _dt.date) and not isinstance(
                v, _dt.datetime
            ):
                r[name] = (v - epoch).days


def _merge_struct_fields(schemas: list) -> "Any":
    """Union of StructTypes by field name; conflicting types refuse."""
    from pyspark.sql import types as T

    fields: dict[str, Any] = {}
    order: list[str] = []
    for st in schemas:
        for f in st.fields:
            if f.name not in fields:
                fields[f.name] = f.dataType
                order.append(f.name)
            elif fields[f.name] != f.dataType:
                raise NotImplementedError(
                    f"log files disagree on column {f.name!r}: "
                    f"{fields[f.name]} vs {f.dataType}"
                )
    return T.StructType(
        [T.StructField(n, fields[n], True) for n in order]
    )


def framed_spark_schema(paths: list[str]):
    """Union Spark schema over the data-block schemas of `paths` —
    header-only peeks, no content decode. DELETE blocks contribute the
    marker-row columns (meta strings + `_hoodie_is_deleted` boolean)."""
    from pyspark.sql import types as T

    schemas = []
    saw_delete = False
    for p in paths:
        for h in iter_block_headers(p):
            if h["type"] == DELETE_BLOCK:
                saw_delete = True
                continue
            if h["type"] not in (AVRO_DATA_BLOCK, PARQUET_DATA_BLOCK):
                continue
            sj = h["header"].get(H_SCHEMA)
            if sj:
                schemas.append(_spark_schema_with_logical(json.loads(sj)))
    if saw_delete:
        schemas.append(
            T.StructType(
                [
                    T.StructField("_hoodie_record_key", T.StringType()),
                    T.StructField("_hoodie_partition_path", T.StringType()),
                    T.StructField("_hoodie_commit_time", T.StringType()),
                    T.StructField("_hoodie_is_deleted", T.BooleanType()),
                ]
            )
        )
    if not schemas:
        raise ValueError(
            f"no data-block schemas found in framed logs {paths}"
        )
    return _merge_struct_fields(schemas)


def scan_framed_logs(
    spark: SparkSession,
    paths: list[str],
    valid_instants: set[str] | None = None,
    with_fname: bool = False,
) -> DataFrame:
    """Distributed decode of framed log files: one task per file
    (Hudi's own scanner granularity), Arrow-batched via mapInPandas —
    no per-row Python in the Spark plan, no driver materialization."""
    from pyspark.sql import types as T

    schema = framed_spark_schema(paths)
    if with_fname:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("__fname", T.StringType(), False)]
        )
    cols = [f.name for f in schema.fields]
    valid = sorted(valid_instants) if valid_instants is not None else None

    paths_df = local_df(spark,
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def gen(batches):
        import pandas as pd

        vset = set(valid) if valid is not None else None
        for pdf in batches:
            for p in pdf["path"]:
                rows = file_records(p, vset)
                if not rows:
                    continue
                data = {
                    c: [r.get(c) for r in rows]
                    for c in cols
                    if c != "__fname"
                }
                if with_fname:
                    data["__fname"] = [os.path.basename(p)] * len(rows)
                yield pd.DataFrame(data, columns=cols)

    return paths_df.mapInPandas(gen, schema)
