"""Spec-exact Iceberg column bounds (`sources/iceberg.py`).

The manifest's `lower_bounds`/`upper_bounds` are the spec's
field-id → single-value-serialized-bytes map (Avro array of key/value
records), binary per the spec's Appendix D. These tests:
- round-trip the single-value serializer for every supported type,
- HAND-decode the committed binary map per spec (independent of the
  module's own deserializer) and compare with true column min/max,
- prove bounds-based file pruning equals predicate truth on randomized
  tables (a pruned file never holds a matching row),
- keep reading legacy pre-r11 name→string bound maps.

Reference capability: converter commits real snapshots consumable by
external Iceberg readers (`compute/converter/converter_session.py`).
"""

import datetime
import decimal
import os
import random
import struct

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    deserialize_single_value,
    parse_bounds,
    read_iceberg,
    serialize_single_value,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# serializer round-trip
# ---------------------------------------------------------------------------

CASES = [
    ("boolean", True),
    ("boolean", False),
    ("int", -2**31),
    ("int", 2**31 - 1),
    ("long", -2**63),
    ("long", 2**63 - 1),
    ("float", 1.5),
    ("double", -3.25e100),
    ("date", datetime.date(2026, 8, 16)),
    ("timestamp", datetime.datetime(2026, 8, 16, 12, 30, 15, 123456)),
    ("string", "héllo✓"),
    ("binary", b"\x00\xff\x01"),
    ("uuid", "12345678-1234-5678-1234-567812345678"),
    ("decimal(10, 2)", decimal.Decimal("-12345.67")),
    ("decimal(38, 10)", decimal.Decimal("99999999999999999999.9999999999")),
]


@pytest.mark.parametrize("ice_type,value", CASES)
def test_single_value_roundtrip(ice_type, value):
    b = serialize_single_value(ice_type, value)
    assert isinstance(b, bytes)
    back = deserialize_single_value(ice_type, b)
    if ice_type == "date":
        assert back == value
    elif ice_type == "timestamp":
        micros = int(
            (value - datetime.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        )
        assert back == micros
    else:
        assert back == value


def test_fixed_width_encodings_per_spec():
    # spec Appendix D: little-endian fixed width
    assert serialize_single_value("int", 1) == b"\x01\x00\x00\x00"
    assert serialize_single_value("long", 1) == bytes([1] + [0] * 7)
    assert serialize_single_value("float", 1.0) == struct.pack("<f", 1.0)
    assert serialize_single_value("boolean", True) == b"\x01"
    # decimal: minimal two's-complement big-endian unscaled value
    assert serialize_single_value(
        "decimal(9, 2)", decimal.Decimal("1.00")
    ) == b"\x64"
    assert serialize_single_value(
        "decimal(9, 2)", decimal.Decimal("-1.00")
    ) == b"\x9c"


# ---------------------------------------------------------------------------
# committed manifests: hand-decoded binary map matches true min/max
# ---------------------------------------------------------------------------


def _raw_entries(root):
    tbl = IcebergTable(root)
    meta = tbl.metadata()
    snap = tbl.snapshot(meta)
    out = []
    for mf in tbl.manifests(snap):
        if mf["content"] != 0:
            continue
        _, rows = avrofile.read_container(
            os.path.join(root, mf["manifest_path"])
        )
        out.extend(rows)
    return out


def test_bounds_binary_map_hand_decoded(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("int").alias("small"),
        (F.col("id") * 0.5).alias("v"),
        F.concat(F.lit("doc-"), F.format_string("%04d", "id")).alias("s"),
        F.date_add(F.lit("2026-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("d"),
    )
    write_iceberg(df, root)

    meta = IcebergTable(root).metadata()
    ice_schema = meta["schemas"][meta["current-schema-id"]]
    fid = {f["name"]: f["id"] for f in ice_schema["fields"]}
    ftype = {f["name"]: f["type"] for f in ice_schema["fields"]}

    entries = _raw_entries(root)
    assert entries
    for e in entries:
        d = e["data_file"]
        lo = {kv["key"]: kv["value"] for kv in d["lower_bounds"]}
        hi = {kv["key"]: kv["value"] for kv in d["upper_bounds"]}
        assert all(isinstance(v, bytes) for v in lo.values())
        # hand-decode per spec, independent of the module's helper
        file_df = spark.read.parquet(os.path.join(root, d["file_path"]))
        mm = file_df.agg(
            F.min("id"), F.max("id"),
            F.min("small"), F.max("small"),
            F.min("v"), F.max("v"),
            F.min("s"), F.max("s"),
            F.min("d"), F.max("d"),
        ).collect()[0]
        assert struct.unpack("<q", lo[fid["id"]])[0] == mm[0]
        assert struct.unpack("<q", hi[fid["id"]])[0] == mm[1]
        assert ftype["small"] == "int"
        assert struct.unpack("<i", lo[fid["small"]])[0] == mm[2]
        assert struct.unpack("<i", hi[fid["small"]])[0] == mm[3]
        assert struct.unpack("<d", lo[fid["v"]])[0] == mm[4]
        assert struct.unpack("<d", hi[fid["v"]])[0] == mm[5]
        assert lo[fid["s"]].decode("utf-8") == mm[6]
        assert hi[fid["s"]].decode("utf-8") == mm[7]
        epoch = datetime.date(1970, 1, 1)
        assert struct.unpack("<i", lo[fid["d"]])[0] == (mm[8] - epoch).days
        assert struct.unpack("<i", hi[fid["d"]])[0] == (mm[9] - epoch).days


def test_parse_bounds_typed(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(10, 20).select("id", F.lit("x").alias("s")), root
    )
    meta = IcebergTable(root).metadata()
    ice_schema = meta["schemas"][meta["current-schema-id"]]
    e = _raw_entries(root)
    merged_lo = min(parse_bounds(d["data_file"], ice_schema)["id"][0] for d in e)
    merged_hi = max(parse_bounds(d["data_file"], ice_schema)["id"][1] for d in e)
    assert (merged_lo, merged_hi) == (10, 19)


def test_legacy_string_bounds_still_parse(spark, tmp_path):
    """Pre-r11 manifests carried name→string bound maps; parse_bounds
    and bounds_filter must tolerate them (no pruning, no crash)."""
    root = str(tmp_path / "t")
    write_iceberg(spark.range(0, 50).select("id"), root)
    tbl = IcebergTable(root)
    meta = tbl.metadata()
    snap = tbl.snapshot(meta)
    mf = tbl.manifests(snap)[0]
    mpath = os.path.join(root, mf["manifest_path"])
    schema, rows = avrofile.read_container(mpath)
    # rewrite the manifest in the legacy shape
    legacy_schema = __import__("json").loads(
        __import__("json").dumps(schema)
    )
    for f in legacy_schema["fields"]:
        if f["name"] == "data_file":
            for g in f["type"]["fields"]:
                if g["name"] in ("lower_bounds", "upper_bounds"):
                    g["type"] = [
                        "null", {"type": "map", "values": "string"}
                    ]
    for r in rows:
        r["data_file"]["lower_bounds"] = {"id": "0"}
        r["data_file"]["upper_bounds"] = {"id": "49"}
    avrofile.write_container(mpath, legacy_schema, rows)

    ice_schema = meta["schemas"][meta["current-schema-id"]]
    d = _raw_entries(root)[0]["data_file"]
    assert parse_bounds(d, ice_schema)["id"] == ("0", "49")
    # typed predicate vs legacy string bounds: keep everything
    out = read_iceberg(spark, root, bounds_filter={"id": (5, 7)})
    assert out.count() == 50


# ---------------------------------------------------------------------------
# bounds pruning == predicate truth (randomized model check)
# ---------------------------------------------------------------------------


def test_bounds_filter_prunes_and_matches_truth(spark, tmp_path):
    rng = random.Random(4711)
    root = str(tmp_path / "t")
    # several appends → several files with distinct id ranges
    for base in (0, 1000, 2000, 3000):
        rows = [
            (base + j, float(base + j) * 0.25)
            for j in range(rng.randint(50, 120))
        ]
        write_iceberg(
            spark.createDataFrame(rows, "id long, v double").coalesce(1),
            root,
            mode="append" if base else "overwrite",
        )
    full = read_iceberg(spark, root)
    for _ in range(8):
        lo = rng.randint(-100, 3300)
        hi = lo + rng.randint(0, 800)
        pruned = read_iceberg(
            spark, root, bounds_filter={"id": (lo, hi)}
        ).where(F.col("id").between(lo, hi))
        truth = full.where(F.col("id").between(lo, hi))
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, truth.collect())
        )
    # and the pruning has teeth: a window inside one batch's range
    # scans fewer files than the table holds
    tbl = IcebergTable(root)
    data, _ = tbl.live_files()
    assert len(data) >= 4
    one = read_iceberg(spark, root, bounds_filter={"id": (1010, 1020)})
    n_in = len(one.inputFiles())
    assert 0 < n_in < len(data)
