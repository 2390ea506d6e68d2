"""HoodieLogFormat (`#HUDI#` block framing) — `sources/hudi_log.py`.

Codec round trips, rollback/visibility semantics, torn-append
recovery, and end-to-end MoR reads over framed logs both PLANTED in
the external shape (dotted names, hand-framed blocks — the way
`commit_equality_deletes` plants the Iceberg equality-delete shape)
and WRITTEN by `write_hudi(log_format="hoodie")`.

Reference surface: DatastoreType HUDI ingests real Hudi MoR tables
(`deltacat/api.py:97-480`, `deltacat/types/media.py:353-420`); the
framing is from Apache Hudi's public HoodieLogFormatWriter/Reader.
"""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import hudi_log
from deltacat_spark.sources.hudi import (
    _finish_commit,
    _next_instant,
    compact_hudi,
    file_slices,
    read_hudi,
    read_hudi_incremental,
    write_hudi,
)

SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "_hoodie_file_name", "type": ["null", "string"]},
        {"name": "id", "type": "long"},
        {"name": "cat", "type": ["null", "string"]},
    ],
}


def _rows(instant, ids, cat="upd", partition="default"):
    return [
        {
            "_hoodie_commit_time": instant,
            "_hoodie_commit_seqno": f"{instant}_{i}",
            "_hoodie_record_key": str(i),
            "_hoodie_partition_path": partition,
            "_hoodie_file_name": "log",
            "id": i,
            "cat": cat,
        }
        for i in ids
    ]


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_avro_block_round_trip(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1, 2, 3]), SCHEMA, "002")
    blocks = hudi_log.read_blocks(p)
    assert len(blocks) == 1
    b = blocks[0]
    assert b["type"] == hudi_log.AVRO_DATA_BLOCK
    assert b["version"] == hudi_log.LOG_FORMAT_VERSION
    assert b["header"][hudi_log.H_INSTANT_TIME] == "002"
    assert json.loads(b["header"][hudi_log.H_SCHEMA]) == SCHEMA
    rows = hudi_log.block_records(b)
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[0]["cat"] == "upd"


def test_framing_byte_layout(tmp_path):
    """Pin the wire layout (magic, BE sizes, reverse pointer) so a real
    HoodieLogFileReader could parse the bytes."""
    import struct

    blk = hudi_log.frame_block(
        hudi_log.AVRO_DATA_BLOCK,
        b"CONTENT",
        {hudi_log.H_INSTANT_TIME: "42"},
    )
    assert blk[:6] == b"#HUDI#"
    (blocksize,) = struct.unpack_from(">q", blk, 6)
    version, btype = struct.unpack_from(">ii", blk, 14)
    assert version == 1 and btype == 3
    (reverse,) = struct.unpack_from(">q", blk, len(blk) - 8)
    assert reverse == len(blk)
    assert blocksize == len(blk) - 6 - 8
    assert b"CONTENT" in blk


def test_multi_block_append_and_parquet_block(tmp_path):
    import pyarrow as pa

    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1]), SCHEMA, "002")
    t = pa.table({"id": [7, 8], "cat": ["p", "q"]})
    hudi_log.append_parquet_data_block(p, t, "003")
    blocks = hudi_log.read_blocks(p)
    assert [b["type"] for b in blocks] == [
        hudi_log.AVRO_DATA_BLOCK,
        hudi_log.PARQUET_DATA_BLOCK,
    ]
    rows = hudi_log.block_records(blocks[1])
    assert [r["id"] for r in rows] == [7, 8]


def test_rollback_command_block(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1]), SCHEMA, "002")
    hudi_log.append_avro_data_block(p, _rows("003", [2]), SCHEMA, "003")
    hudi_log.append_rollback_block(p, target_instant="003", instant="004")
    rows = hudi_log.file_records(p)
    assert [r["id"] for r in rows] == [1]  # instant 003 rolled back


def test_uncommitted_instant_invisible(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1]), SCHEMA, "002")
    hudi_log.append_avro_data_block(p, _rows("009", [2]), SCHEMA, "009")
    rows = hudi_log.file_records(p, valid_instants={"002"})
    assert [r["id"] for r in rows] == [1]
    assert len(hudi_log.file_records(p)) == 2  # no timeline = all


def test_torn_trailing_append_recovered(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1, 2]), SCHEMA, "002")
    with open(p, "ab") as f:
        f.write(b"#HUDI#\x00\x00\x00")  # torn mid-append
    rows = hudi_log.file_records(p)
    assert [r["id"] for r in rows] == [1, 2]


def test_wholly_corrupt_file_refused(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    with open(p, "wb") as f:
        f.write(b"#HUDI#" + b"garbage-that-is-not-a-block" * 4)
    assert hudi_log.is_framed(p)
    with pytest.raises(ValueError, match="no decodable"):
        hudi_log.file_records(p)


def test_header_peek_skips_content(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(p, _rows("002", [1]), SCHEMA, "002")
    hudi_log.append_rollback_block(p, target_instant="000", instant="003")
    heads = list(hudi_log.iter_block_headers(p))
    assert [h["type"] for h in heads] == [
        hudi_log.AVRO_DATA_BLOCK,
        hudi_log.COMMAND_BLOCK,
    ]
    assert heads[0]["header"][hudi_log.H_INSTANT_TIME] == "002"
    st = hudi_log.framed_spark_schema([p])
    assert "id" in st.fieldNames() and "cat" in st.fieldNames()


def test_logical_timestamp_round_trip(tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "ts",
                "type": [
                    "null",
                    {"type": "long", "logicalType": "timestamp-micros"},
                ],
            },
            {
                "name": "d",
                "type": ["null", {"type": "int", "logicalType": "date"}],
            },
        ],
    }
    ts = datetime.datetime(2024, 3, 5, 10, 30, 0, 123456)
    d = datetime.date(2024, 3, 5)
    p = str(tmp_path / ".f1_001.log.1_tok")
    hudi_log.append_avro_data_block(
        p, [{"id": 1, "ts": ts, "d": d}], schema, "002"
    )
    rows = hudi_log.file_records(p)
    assert rows[0]["ts"] == ts and rows[0]["d"] == d
    st = hudi_log.framed_spark_schema([p])
    assert st["ts"].dataType.typeName() == "timestamp"
    assert st["d"].dataType.typeName() == "date"


# ---------------------------------------------------------------------------
# end-to-end: planted external shape
# ---------------------------------------------------------------------------


def _mor_table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_hudi(
        spark.range(10).select(
            "id", F.lit("base").alias("cat")
        ),
        root,
        record_key_field="id",
        operation="insert",
        table_type="MERGE_ON_READ",
    )
    return root


def test_planted_external_framed_log(spark, tmp_path):
    """Hand-frame a spec-shaped AVRO_DATA block under Hudi's dotted log
    name against an existing file group; the merged MoR view serves the
    framed updates."""
    root = _mor_table(spark, tmp_path)
    base = [s for s in file_slices(root) if s["path"]][0]
    instant = _next_instant(root)
    log_name = f".{base['file_id']}_{base['instant']}.log.1_{instant}"
    rel = (
        f"{base['partition']}/{log_name}"
        if base["partition"]
        else log_name
    )
    hudi_log.append_avro_data_block(
        os.path.join(root, rel),
        _rows(instant, [3, 5], cat="framed", partition=base["partition"]),
        SCHEMA,
        instant,
    )
    _finish_commit(
        root,
        instant,
        {
            "partitionToWriteStats": {
                base["partition"]: [
                    {"fileId": base["file_id"], "path": rel, "numWrites": 2}
                ]
            },
            "compacted": False,
            "operationType": "UPSERT",
        },
        kind="deltacommit",
    )
    got = {
        r.id: r.cat for r in read_hudi(spark, root).collect()
    }
    assert got == {
        i: ("framed" if i in (3, 5) else "base") for i in range(10)
    }
    # time travel BEFORE the framed log still sees base rows only
    before = {
        r.id: r.cat
        for r in read_hudi(spark, root, as_of=base["instant"]).collect()
    }
    assert set(before.values()) == {"base"}
    # incremental pull over the framed deltacommit: exactly the updates
    inc = read_hudi_incremental(spark, root, begin_instant=base["instant"])
    assert sorted(r.id for r in inc.collect()) == [3, 5]


def test_planted_log_rollback_invisible(spark, tmp_path):
    """A rollback command block makes the rolled-back instant's rows
    invisible to the merged view even though the deltacommit data
    preceded it in the same file."""
    root = _mor_table(spark, tmp_path)
    base = [s for s in file_slices(root) if s["path"]][0]
    instant = _next_instant(root)
    log_name = f".{base['file_id']}_{base['instant']}.log.1_{instant}"
    rel = f"{base['partition']}/{log_name}"
    path = os.path.join(root, rel)
    hudi_log.append_avro_data_block(
        path,
        _rows(instant, [4], cat="good", partition=base["partition"]),
        SCHEMA,
        instant,
    )
    # a failed write's blocks + its rollback, all in the same file
    hudi_log.append_avro_data_block(
        path,
        _rows("99999999999999999", [6], cat="failed",
              partition=base["partition"]),
        SCHEMA,
        "99999999999999999",
    )
    hudi_log.append_rollback_block(
        path, target_instant="99999999999999999", instant=instant
    )
    _finish_commit(
        root,
        instant,
        {
            "partitionToWriteStats": {
                base["partition"]: [
                    {"fileId": base["file_id"], "path": rel, "numWrites": 1}
                ]
            },
            "compacted": False,
            "operationType": "UPSERT",
        },
        kind="deltacommit",
    )
    got = {r.id: r.cat for r in read_hudi(spark, root).collect()}
    assert got[4] == "good"
    assert got[6] == "base"  # failed write invisible


# ---------------------------------------------------------------------------
# end-to-end: our writer's framed logs (log_format="hoodie")
# ---------------------------------------------------------------------------


def _hoodie_log_table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_hudi(
        spark.range(20).select(
            "id",
            (F.col("id") % 2).cast("string").alias("part"),
            F.lit("base").alias("cat"),
        ),
        root,
        record_key_field="id",
        operation="insert",
        partition_by=["part"],
        table_type="MERGE_ON_READ",
    )
    write_hudi(
        spark.createDataFrame(
            [(3, "1", "upd"), (8, "0", "upd"), (100, "0", "new")],
            "id long, part string, cat string",
        ),
        root,
        record_key_field="id",
        log_format="hoodie",
    )
    return root


def test_write_hudi_hoodie_log_format(spark, tmp_path):
    root = _hoodie_log_table(spark, tmp_path)
    framed = [
        lp
        for s in file_slices(root)
        for lp in s["log_paths"]
        if hudi_log.is_framed(os.path.join(root, lp))
    ]
    assert framed, "expected #HUDI#-framed log files on disk"
    assert all(os.path.basename(p).startswith(".") for p in framed)
    assert all(not p.endswith(".parquet") for p in framed)
    got = {r.id: r.cat for r in read_hudi(spark, root).collect()}
    assert got[3] == "upd" and got[8] == "upd" and got[100] == "new"
    assert got[0] == "base" and len(got) == 21


def test_hoodie_log_compaction_and_incremental(spark, tmp_path):
    root = _hoodie_log_table(spark, tmp_path)
    instants = [
        i for i in sorted(os.listdir(os.path.join(root, ".hoodie")))
    ]
    first = instants[0].split(".")[0]
    inc = read_hudi_incremental(spark, root, begin_instant=first)
    assert sorted(r.id for r in inc.collect()) == [3, 8, 100]
    assert compact_hudi(spark, root) is not None
    assert not any(s["log_paths"] for s in file_slices(root))
    got = {r.id: r.cat for r in read_hudi(spark, root).collect()}
    assert got[3] == "upd" and got[100] == "new" and len(got) == 21


def test_hoodie_log_second_upsert_appends_new_log(spark, tmp_path):
    root = _hoodie_log_table(spark, tmp_path)
    write_hudi(
        spark.createDataFrame([(3, "1", "upd2")], "id long, part string, cat string"),
        root,
        record_key_field="id",
        log_format="hoodie",
    )
    got = {r.id: r.cat for r in read_hudi(spark, root).collect()}
    assert got[3] == "upd2" and got[8] == "upd"


def test_hoodie_log_streaming_source(spark, tmp_path):
    """The incremental streaming source delivers framed-log rows
    exactly once per instant."""
    from deltacat_spark.streaming.lakehouse_source import (
        HudiIncrementalStreamReader,
    )

    root = _hoodie_log_table(spark, tmp_path)
    reader = HudiIncrementalStreamReader({"root": root})
    parts = reader.partitions(
        reader.initialOffset(), reader.latestOffset()
    )
    framed = [p for p in parts if p.framed]
    assert framed
    ids = []
    for p in parts:
        for batch in reader.read(p):
            ids.extend(batch.to_pydict()["id"])
    assert sorted(ids) == sorted(list(range(20)) + [3, 8, 100])
