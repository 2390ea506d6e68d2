"""Fail-loudly guards for external lakehouse tables carrying features
this jar-free implementation would otherwise SILENTLY misread — the
same defect class as the r10-ADVICE Iceberg equality-delete misread:

* Delta deletion vectors (deleted rows would reappear), column
  mapping (physical names differ), unknown v3 readerFeatures;
* Iceberg format-version != 2 (v1 manifests lack sequence numbers,
  v3 adds deletion vectors);
* Hudi 1.x table layouts (table version > 6 renames timeline files).

Each guard must raise NotImplementedError at read time, batch and
(for Delta DVs) streaming.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    read_delta,
    read_delta_changes,
    write_delta,
)
from deltacat_spark.sources.hudi import read_hudi, write_hudi
from deltacat_spark.sources.iceberg import read_iceberg, write_iceberg


def _append_action(root, action):
    from deltacat_spark.sources.deltalake import _list_versions

    v = _list_versions(root)[-1] + 1
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
    ) as f:
        f.write(json.dumps(action) + "\n")


def _delta_table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(10).select("id"), root)
    return root


def test_delta_deletion_vector_guard_to_green(spark, tmp_path):
    """r12 flip: BATCH read_delta APPLIES deletion vectors and the
    change feed replays them as exact position-diff deletes
    (tests/test_delta_deletion_vectors.py covers the semantics); the
    streaming source still refuses loudly — an append stream cannot
    represent row-level deletes."""
    from deltacat_spark.sources.deltalake import delete_rows_with_dv

    root = _delta_table(spark, tmp_path)
    assert delete_rows_with_dv(spark, root, "id % 2 = 0") is not None
    assert sorted(
        r.id for r in read_delta(spark, root).collect()
    ) == [1, 3, 5, 7, 9]
    ch = read_delta_changes(spark, root, from_version=1).collect()
    assert sorted(r.id for r in ch) == [0, 2, 4, 6, 8]
    assert {r._change_type for r in ch} == {"delete"}
    # streaming planner refuses (ensure_readable at construction)
    from deltacat_spark.streaming.lakehouse_source import (
        DeltaAppendsStreamReader,
    )

    with pytest.raises(
        NotImplementedError, match="deletionVectors|deletion vector"
    ):
        DeltaAppendsStreamReader({"root": root})


def test_delta_column_mapping_guards(spark, tmp_path):
    """r12 (amended r13): read_delta, the change feed, AND the stream
    support column mapping via physicalName
    (tests/test_delta_column_mapping*.py); a table CLAIMING mapping but
    missing the protocol-required physicalName metadata fails loudly on
    every path instead of guessing."""
    root = _delta_table(spark, tmp_path)
    snap = DeltaSnapshot(root)
    md = dict(snap.metadata)
    md["configuration"] = {"delta.columnMapping.mode": "name"}
    _append_action(root, {"metaData": md})
    with pytest.raises(ValueError, match="physicalName"):
        read_delta(spark, root)
    with pytest.raises(ValueError, match="physicalName"):
        read_delta_changes(spark, root, from_version=0)
    from deltacat_spark.streaming.lakehouse_source import (
        DeltaAppendsStreamReader,
    )

    with pytest.raises(ValueError, match="physicalName"):
        DeltaAppendsStreamReader({"root": root})


def test_delta_unknown_reader_feature_refused(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                # v2Checkpoint READS since r14 (test_delta_checkpoint_v2)
                # — the guard must catch a feature nothing implements
                "readerFeatures": ["mysteryV9Feature", "timestampNtz"],
                "writerFeatures": ["mysteryV9Feature"],
            }
        },
    )
    with pytest.raises(NotImplementedError, match="mysteryV9Feature"):
        read_delta(spark, root)


def test_delta_dv_reader_feature_batch_ok_stream_refused(
    spark, tmp_path
):
    """The deletionVectors readerFeature alone (no DV'd adds yet) is
    fine for the batch reader, still refused by the stream."""
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
    )
    assert read_delta(spark, root).count() == 10
    from deltacat_spark.streaming.lakehouse_source import (
        DeltaAppendsStreamReader,
    )

    with pytest.raises(NotImplementedError, match="deletionVectors"):
        DeltaAppendsStreamReader({"root": root})


def test_delta_tolerated_reader_feature_ok(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
            }
        },
    )
    assert read_delta(spark, root).count() == 10


def test_iceberg_format_version_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(spark.range(5).select("id"), root)
    mdir = os.path.join(root, "metadata")
    v = int(open(os.path.join(mdir, "version-hint.text")).read())
    mpath = os.path.join(mdir, f"v{v}.metadata.json")
    meta = json.load(open(mpath))
    # v3 READS since r14 (test_iceberg_v3.py); the guard now lives at
    # format-version 4 (and at the v3 features themselves: new value
    # types, v3 writes)
    meta["format-version"] = 3
    json.dump(meta, open(mpath, "w"))
    assert read_iceberg(spark, root).count() == 5
    meta["format-version"] = 4
    json.dump(meta, open(mpath, "w"))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, root).count()


def test_hudi_corrupt_framed_log_refused(spark, tmp_path):
    """Since r13, HoodieLogFormat-framed log files are READ (see
    `test_hudi_log_format.py`); what must still refuse loudly is a file
    that opens with the #HUDI# magic but contains no decodable block —
    reading it as empty would silently drop data, batch and streaming."""
    from deltacat_spark.sources.hudi import write_hudi as _wh

    root = str(tmp_path / "t")
    _wh(
        spark.range(10).select(
            "id", (F.col("id") % 2).cast("string").alias("cat")
        ),
        root,
        record_key_field="id",
        operation="insert",
        table_type="MERGE_ON_READ",
    )
    _wh(
        spark.range(0, 5).select(
            "id", F.lit("x").alias("cat")
        ),
        root,
        record_key_field="id",
    )  # deltacommit: log files against the base groups
    from deltacat_spark.sources.hudi import file_slices

    logged = [s for s in file_slices(root) if s["log_paths"]]
    assert logged
    victim = os.path.join(root, logged[0]["log_paths"][0])
    body = open(victim, "rb").read()
    open(victim, "wb").write(b"#HUDI#" + body)  # magic + parquet garbage
    with pytest.raises(Exception, match="no decodable|no data-block"):
        read_hudi(spark, root).collect()
    from deltacat_spark.streaming.lakehouse_source import (
        HudiIncrementalStreamReader,
    )

    reader = HudiIncrementalStreamReader({"root": root})
    parts = reader.partitions(reader.initialOffset(), reader.latestOffset())
    bad = [p for p in parts if p.framed]
    assert bad
    with pytest.raises(ValueError, match="no decodable"):
        list(reader.read(bad[0]))


def test_hudi_delete_block_refused(tmp_path):
    """DELETE_BLOCK payloads (Kryo/avro-IDL HoodieDeleteRecordList)
    refuse loudly rather than silently skipping deletions."""
    from deltacat_spark.sources import hudi_log

    path = str(tmp_path / ".f1_001.log.1_0-0-0")
    blk = hudi_log.frame_block(
        hudi_log.DELETE_BLOCK,
        b"\x00\x00\x00\x02\x00\x00\x00\x00",
        {hudi_log.H_INSTANT_TIME: "001"},
    )
    open(path, "wb").write(blk)
    with pytest.raises(NotImplementedError, match="DELETE_BLOCK"):
        hudi_log.file_records(path)


def test_hudi_table_version_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    write_hudi(
        spark.range(5).select("id"), root, record_key_field="id",
        operation="insert",
    )
    props = os.path.join(root, ".hoodie", "hoodie.properties")
    body = open(props).read().replace(
        "hoodie.table.version=6", "hoodie.table.version=8"
    )
    open(props, "w").write(body)
    with pytest.raises(NotImplementedError, match="table version 8"):
        read_hudi(spark, root)
