"""Jar-free Avro codec + Spark IO tests.

Reference surface: deltacat content type AVRO (`utils/pyarrow.py:232-484`)
read/written through PyArrow; here spark-avro is absent so
`sources/avrofile.py` implements the Avro 1.11 spec directly and
`formats.py:read_avro/write_avro_dir` distribute it (binaryFile scan +
per-file decode / one container per partition)."""

import io
import json

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile as av
from deltacat_spark.sources.formats import read_avro, read_url, write_avro, write_url

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": ["null", "string"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["R", "G", "B"]}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}
RECS = [
    {
        "i": -(1 << 40),
        "s": None,
        "b": True,
        "d": 1.5,
        "raw": b"\x00\x01",
        "arr": [1, 2, 3],
        "m": {"a": "x", "b": None},
        "fx": b"ABCD",
        "e": "G",
        "nested": {"x": 7},
    },
    {
        "i": 0,
        "s": "héllo",
        "b": False,
        "d": -2.25,
        "raw": b"",
        "arr": [],
        "m": {},
        "fx": b"WXYZ",
        "e": "B",
        "nested": {"x": -1},
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    buf = io.BytesIO()
    n = av.write_container(buf, SCHEMA, RECS * 50, codec=codec, block_records=17)
    assert n == 100
    schema, out = av.read_container(buf.getvalue())
    assert schema["name"] == "r"
    assert out[0] == RECS[0]
    assert out[1] == RECS[1]
    assert len(out) == 100


def test_zigzag_varint_edge_values():
    buf = io.BytesIO()
    vals = [0, -1, 1, 63, 64, -64, -65, (1 << 62), -(1 << 62)]
    sch = {"type": "record", "name": "v", "fields": [{"name": "n", "type": "long"}]}
    av.write_container(buf, sch, [{"n": v} for v in vals], codec="null")
    _, out = av.read_container(buf.getvalue())
    assert [r["n"] for r in out] == vals


def test_deterministic_bytes():
    b1, b2 = io.BytesIO(), io.BytesIO()
    av.write_container(b1, SCHEMA, RECS)
    av.write_container(b2, SCHEMA, RECS)
    assert b1.getvalue() == b2.getvalue()


def test_header_layout_per_spec():
    """Structural spec assertions: magic, metadata map keys, sync."""
    buf = io.BytesIO()
    av.write_container(buf, SCHEMA, RECS, codec="deflate")
    raw = buf.getvalue()
    assert raw[:4] == b"Obj\x01"
    dec = av._Decoder(raw)
    dec.raw(4)
    n = dec.long()
    meta = {}
    for _ in range(abs(n)):
        k = dec.string()
        meta[k] = dec.bytes_()
    assert dec.long() == 0
    assert json.loads(meta["avro.schema"])["name"] == "r"
    assert meta["avro.codec"] == b"deflate"
    sync = dec.raw(16)
    assert len(sync) == 16
    assert raw.endswith(sync)  # every block is sync-terminated


def test_corrupt_sync_detected():
    buf = io.BytesIO()
    av.write_container(buf, SCHEMA, RECS, codec="null")
    raw = bytearray(buf.getvalue())
    raw[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        av.read_container(bytes(raw))


def test_union_branch_selection():
    sch = {
        "type": "record",
        "name": "u",
        "fields": [{"name": "v", "type": ["null", "long", "string"]}],
    }
    buf = io.BytesIO()
    av.write_container(
        buf, sch, [{"v": None}, {"v": 5}, {"v": "five"}], codec="null"
    )
    _, out = av.read_container(buf.getvalue())
    assert [r["v"] for r in out] == [None, 5, "five"]


def test_spark_distributed_roundtrip(spark, tmp_path):
    df = spark.range(0, 500).select(
        "id",
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") % 7).alias("nm"),
        F.array("id").alias("arr"),
        F.struct(F.col("id").alias("x")).alias("nested"),
    )
    url = str(tmp_path / "avro_dir")
    write_url(df.repartition(3), url, fmt="avro")
    back = read_url(spark, url, fmt="avro")
    assert back.schema == df.schema or back.count() == 500
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_single_file_and_ext_inference(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, s string")
    path = str(tmp_path / "one.avro")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, None)]
    # read_url infers avro from the extension
    assert read_url(spark, path).count() == 2
