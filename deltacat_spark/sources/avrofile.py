"""Pure-stdlib Avro Object Container File codec.

The sandbox has no `spark-avro` jar (Avro has been an *external* Spark
module since 2.4), so the `avro` content type in `sources/formats.py`
was registry-documented but not runnable. This module implements the
published Avro 1.11 specification directly — binary encoding (zigzag
varints, length-prefixed bytes/strings, block-encoded arrays/maps,
union index + value) and the object container file layout (magic
`Obj\\x01`, metadata map with `avro.schema`/`avro.codec`, 16-byte sync
marker between data blocks; `null` and `deflate` codecs, where deflate
is a raw DEFLATE stream, wbits=-15) — so `.avro` read/write works
jar-free and, downstream, `sources/iceberg.py` can emit/read real
Iceberg manifest files.

Reference parity: deltacat reads/writes Avro through PyArrow/Daft
(`utils/pyarrow.py:232-484`, content type AVRO) and commits Iceberg
manifests through pyiceberg. Both are environment-blocked here; this
codec supplies the same capability from the spec alone.

Scale shape: container files are decoded *per file* on executors
(`formats.py:read_avro` maps whole files through Arrow batches). Avro
blocks are sync-marker-splittable in principle, but per-file
parallelism is what Spark's own avro source defaults to for the
file sizes a manifest/landing zone produces; files are the unit of
parallelism, so writers emit one container per partition.

Supported schema subset (everything Iceberg manifests and typical data
files use): null, boolean, int, long, float, double, bytes, string,
fixed, enum, record, array, map, unions, named-type references, and
logical-type passthrough (decoded at the base type).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable, Iterator

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


class _Encoder:
    def __init__(self) -> None:
        self._buf = io.BytesIO()

    def long(self, n: int) -> None:
        z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        self._buf.write(bytes(out))

    def raw(self, b: bytes) -> None:
        self._buf.write(b)

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self._buf.write(b)

    def string(self, s: str) -> None:
        self.bytes_(s.encode("utf-8"))

    def getvalue(self) -> bytes:
        return self._buf.getvalue()


class _Decoder:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self._data[self._pos]
            self._pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return _zigzag_decode(acc)

    def raw(self, n: int) -> bytes:
        b = self._data[self._pos : self._pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self._pos += n
        return b

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def eof(self) -> bool:
        return self._pos >= len(self._data)


# ---------------------------------------------------------------------------
# schema walk
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


def _named(schema: Any) -> str | None:
    if isinstance(schema, dict) and schema.get("type") in (
        "record",
        "enum",
        "fixed",
    ):
        ns = schema.get("namespace")
        name = schema["name"]
        return f"{ns}.{name}" if ns and "." not in name else name
    return None


def _collect_names(schema: Any, env: dict[str, Any]) -> None:
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, env)
    elif isinstance(schema, dict):
        n = _named(schema)
        if n:
            env[n] = schema
            env[schema["name"]] = schema
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], env)
        elif t == "array":
            _collect_names(schema["items"], env)
        elif t == "map":
            _collect_names(schema["values"], env)
        elif isinstance(t, (dict, list)):
            _collect_names(t, env)


def _resolve(schema: Any, env: dict[str, Any]) -> Any:
    """Dereference named-type references and `{"type": <primitive>}`
    wrappers (keeps logical-type dicts intact for their base type)."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        return env[schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in _PRIMITIVES and "logicalType" in schema:
            return t
        if t in _PRIMITIVES and len(schema) == 1:
            return t
        if isinstance(t, (dict, list)) and not _named(schema):
            # {"type": {...}} wrapper
            return _resolve(t, env)
    return schema


def _admits_null(schema: Any, env: dict) -> bool:
    """True iff the resolved type can encode a null value."""
    resolved = _resolve(schema, env)
    if resolved == "null":
        return True
    if isinstance(resolved, list):  # union
        return any(_resolve(b, env) == "null" for b in resolved)
    return False


def write_value(schema: Any, value: Any, enc: _Encoder, env: dict) -> None:
    schema = _resolve(schema, env)
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            enc.raw(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            enc.long(int(value))
        elif schema == "float":
            enc.raw(struct.pack("<f", float(value)))
        elif schema == "double":
            enc.raw(struct.pack("<d", float(value)))
        elif schema == "bytes":
            enc.bytes_(bytes(value))
        elif schema == "string":
            enc.string(str(value))
        else:
            raise ValueError(f"unknown avro primitive {schema!r}")
        return
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if _matches(branch, value, env):
                enc.long(i)
                write_value(branch, value, enc, env)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            name = f["name"]
            if isinstance(value, dict) and name in value:
                v = value[name]
            elif "default" in f:
                v = f["default"]
            elif _admits_null(f["type"], env):
                v = None
            else:
                raise ValueError(
                    f"record {schema.get('name', '<anonymous>')!r} field "
                    f"{name!r} is missing, has no default, and its type "
                    f"{f['type']!r} does not admit null"
                )
            write_value(f["type"], v, enc, env)
    elif t == "array":
        items = list(value or [])
        if items:
            enc.long(len(items))
            for it in items:
                write_value(schema["items"], it, enc, env)
        enc.long(0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            enc.long(len(entries))
            for k, v in entries.items():
                enc.string(str(k))
                write_value(schema["values"], v, enc, env)
        enc.long(0)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(
                f"fixed {schema['name']} wants {schema['size']} bytes,"
                f" got {len(b)}"
            )
        enc.raw(b)
    elif t == "enum":
        enc.long(schema["symbols"].index(value))
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _matches(schema: Any, value: Any, env: dict) -> bool:
    schema = _resolve(schema, env)
    if schema == "null":
        return value is None
    if value is None:
        return False
    if isinstance(schema, str):
        if schema == "boolean":
            return isinstance(value, bool)
        if schema in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if schema in ("float", "double"):
            return isinstance(value, (int, float)) and not isinstance(
                value, bool
            )
        if schema == "bytes":
            return isinstance(value, (bytes, bytearray))
        if schema == "string":
            return isinstance(value, str)
        return False
    t = schema.get("type")
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    if t == "fixed":
        return isinstance(value, (bytes, bytearray))
    if t == "enum":
        return isinstance(value, str)
    return False


def read_value(schema: Any, dec: _Decoder, env: dict) -> Any:
    schema = _resolve(schema, env)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return dec.raw(1) == b"\x01"
        if schema in ("int", "long"):
            return dec.long()
        if schema == "float":
            return struct.unpack("<f", dec.raw(4))[0]
        if schema == "double":
            return struct.unpack("<d", dec.raw(8))[0]
        if schema == "bytes":
            return dec.bytes_()
        if schema == "string":
            return dec.string()
        raise ValueError(f"unknown avro primitive {schema!r}")
    if isinstance(schema, list):  # union
        return read_value(schema[dec.long()], dec, env)
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: read_value(f["type"], dec, env)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = dec.long()
            if n == 0:
                break
            if n < 0:
                dec.long()  # block byte size — skippable, unused here
                n = -n
            for _ in range(n):
                out.append(read_value(schema["items"], dec, env))
        return out
    if t == "map":
        out = {}
        while True:
            n = dec.long()
            if n == 0:
                break
            if n < 0:
                dec.long()
                n = -n
            for _ in range(n):
                k = dec.string()
                out[k] = read_value(schema["values"], dec, env)
        return out
    if t == "fixed":
        return dec.raw(schema["size"])
    if t == "enum":
        return schema["symbols"][dec.long()]
    raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(
    path_or_buf: str | io.BytesIO,
    schema: dict | str | list,
    records: Iterable[dict],
    codec: str = "deflate",
    block_records: int = 4096,
    metadata: dict[str, bytes] | None = None,
) -> int:
    """Write an Avro object container file; returns record count.

    The sync marker is derived deterministically from the schema JSON
    (any 16 bytes are spec-legal) so identical writes are
    byte-identical — the property the commit-log layer's idempotence
    tests rely on everywhere else in this repo.
    """
    import hashlib

    schema_json = (
        schema if isinstance(schema, str) else json.dumps(schema)
    )
    env: dict[str, Any] = {}
    parsed = json.loads(schema_json)
    _collect_names(parsed, env)
    sync = hashlib.md5(schema_json.encode()).digest()

    header = _Encoder()
    header.raw(MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
        **(metadata or {}),
    }
    header.long(len(meta))
    for k, v in meta.items():
        header.string(k)
        header.bytes_(v)
    header.long(0)
    header.raw(sync)

    own = isinstance(path_or_buf, str)
    f = open(path_or_buf, "wb") if own else path_or_buf
    total = 0
    try:
        f.write(header.getvalue())
        block: list[dict] = []

        def _flush() -> None:
            if not block:
                return
            enc = _Encoder()
            for r in block:
                write_value(parsed, r, enc, env)
            payload = enc.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            head = _Encoder()
            head.long(len(block))
            head.long(len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
            block.clear()

        for rec in records:
            block.append(rec)
            total += 1
            if len(block) >= block_records:
                _flush()
        _flush()
    finally:
        if own:
            f.close()
    return total


def read_container(
    path_or_bytes: str | bytes,
) -> tuple[dict | str | list, list[dict]]:
    """Read a container file; returns (schema, records)."""
    schema, it = iter_container(path_or_bytes)
    return schema, list(it)


def iter_container(
    path_or_bytes: str | bytes,
) -> tuple[Any, Iterator[dict]]:
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    else:
        data = bytes(path_or_bytes)
    dec = _Decoder(data)
    if dec.raw(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = dec.long()
        if n == 0:
            break
        if n < 0:
            dec.long()
            n = -n
        for _ in range(n):
            k = dec.string()
            meta[k] = dec.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = dec.raw(16)
    env: dict[str, Any] = {}
    _collect_names(schema, env)

    def _gen() -> Iterator[dict]:
        while not dec.eof():
            count = dec.long()
            size = dec.long()
            payload = dec.raw(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            block = _Decoder(payload)
            for _ in range(count):
                yield read_value(schema, block, env)
            if dec.raw(16) != sync:
                raise ValueError("sync marker mismatch (corrupt file)")

    return schema, _gen()


# ---------------------------------------------------------------------------
# Spark schema <-> Avro schema
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}


def avro_schema_for(spark_schema, name: str = "topLevelRecord") -> dict:
    """Spark StructType → Avro record schema (nullable → union with
    null), mirroring spark-avro's mapping so files interop."""
    from pyspark.sql import types as T

    def conv(dt, field_name: str):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": field_name,
                "fields": [
                    {
                        "name": f.name,
                        "type": _nullable(conv(f.dataType, f.name), f.nullable),
                    }
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": _nullable(
                    conv(dt.elementType, field_name + "_item"),
                    dt.containsNull,
                ),
            }
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "values": _nullable(
                    conv(dt.valueType, field_name + "_value"),
                    dt.valueContainsNull,
                ),
            }
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        key = dt.typeName()
        if key in _SPARK_TO_AVRO:
            return _SPARK_TO_AVRO[key]
        raise ValueError(f"no avro mapping for spark type {dt}")

    def _nullable(avro_t, nullable: bool):
        return ["null", avro_t] if nullable else avro_t

    out = conv(spark_schema, name)
    out["namespace"] = "deltacat_spark.avro"
    return out


def spark_schema_for(avro_schema: Any):
    """Avro schema → Spark StructType (top level must be a record)."""
    from pyspark.sql import types as T

    env: dict[str, Any] = {}
    _collect_names(avro_schema, env)

    def conv(s) -> tuple[Any, bool]:
        s = _resolve(s, env)
        if isinstance(s, list):
            nn = [b for b in s if _resolve(b, env) != "null"]
            if len(nn) != 1:
                raise ValueError("only unions of [null, T] are supported")
            dt, _ = conv(nn[0])
            return dt, True
        if isinstance(s, str):
            m = {
                "boolean": T.BooleanType(),
                "int": T.IntegerType(),
                "long": T.LongType(),
                "float": T.FloatType(),
                "double": T.DoubleType(),
                "bytes": T.BinaryType(),
                "string": T.StringType(),
                "null": T.NullType(),
            }
            return m[s], False
        t = s["type"]
        if t == "record":
            fields = []
            for f in s["fields"]:
                dt, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if t == "array":
            dt, n = conv(s["items"])
            return T.ArrayType(dt, n), False
        if t == "map":
            dt, n = conv(s["values"])
            return T.MapType(T.StringType(), dt, n), False
        if t == "fixed":
            return T.BinaryType(), False
        if t == "enum":
            return T.StringType(), False
        raise ValueError(f"unsupported avro type {t!r}")

    dt, _ = conv(avro_schema)
    return dt


def list_avro_files(url: str) -> list[str]:
    if os.path.isfile(url):
        return [url]
    return sorted(
        os.path.join(url, f)
        for f in os.listdir(url)
        if f.endswith(".avro")
    )
