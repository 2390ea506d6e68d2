"""Delta deletion vectors (`sources/deltadv.py` + `deltalake.py`
integration) — decode/encode of the PUBLIC formats and end-to-end
DELETE-via-DV semantics.

Covers: Z85 (ZeroMQ RFC 32 test vector), 32-bit roaring containers
(array / bitmap / run — run containers hand-framed the way external
writers emit them), the portable 64-bit layout, the DV blob magic +
file CRC framing, inline ('i') and uuid-file ('u') descriptors,
`delete_rows_with_dv` (merge with existing DVs, full-file deletes
becoming plain removes, protocol upgrade to v3/v7), checkpoint
round-trip of descriptors + feature lists, and time travel to
pre-delete versions.
"""

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import deltadv
from deltacat_spark.sources.deltalake import (
    CHECKPOINT_INTERVAL,
    DeltaSnapshot,
    delete_rows_with_dv,
    optimize_delta,
    read_delta,
    write_checkpoint,
    write_delta,
)


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def test_z85_rfc32_test_vector():
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert deltadv.z85_encode(data) == "HelloWorld"
    assert deltadv.z85_decode("HelloWorld") == data


def test_z85_roundtrip_uuid_width():
    import uuid

    for _ in range(20):
        u = uuid.uuid4().bytes
        enc = deltadv.z85_encode(u)
        assert len(enc) == 20
        assert deltadv.z85_decode(enc) == u


def test_roaring64_roundtrip_array_bitmap_multibucket():
    import random

    rng = random.Random(7)
    cases = [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 1 << 31],
        sorted(rng.sample(range(1 << 20), 5000)),  # bitmap container
        sorted(
            rng.sample(range(1 << 16), 300)
            + [(5 << 32) + v for v in rng.sample(range(1 << 16), 300)]
        ),  # multi high-bucket
    ]
    for vals in cases:
        buf = deltadv.roaring64_serialize(vals)
        assert deltadv.roaring64_deserialize(buf) == sorted(set(vals))


def test_roaring32_run_container_decodes():
    """External writers emit SERIAL_COOKIE run containers — frame one
    by hand per the RoaringFormatSpec and decode it."""
    # one container, key 0, runs [(10, len 5), (100, len 1)] → values
    # 10..14 and 100
    n_runs = 2
    payload = struct.pack("<H", n_runs) + struct.pack(
        "<HHHH", 10, 4, 100, 0
    )
    size = 1
    cookie = 12347 | ((size - 1) << 16)
    buf = (
        struct.pack("<I", cookie)
        + b"\x01"  # run flag bitset: container 0 is a run
        + struct.pack("<HH", 0, 6 - 1)  # key 0, cardinality 6
        + payload  # < 4 containers → no offsets with the run cookie
    )
    vals, used = deltadv._read_bitmap32(buf, 0)
    assert used == len(buf)
    assert vals == [10, 11, 12, 13, 14, 100]


def test_dv_blob_and_file_framing():
    positions = [3, 7, 1000, 1 << 33]
    blob = deltadv.dv_blob_encode(positions)
    assert struct.unpack("<I", blob[:4])[0] == deltadv.DV_MAGIC
    assert deltadv.dv_blob_decode(blob) == positions
    with pytest.raises(ValueError, match="magic"):
        deltadv.dv_blob_decode(b"\x00\x00\x00\x00" + blob[4:])


def test_dv_file_write_read_crc(tmp_path):
    p = str(tmp_path / "dv.bin")
    blobs = [
        deltadv.dv_blob_encode([1, 2, 3]),
        deltadv.dv_blob_encode(list(range(0, 9000, 2))),
    ]
    spans = deltadv.write_dv_file(p, blobs)
    for (off, size), blob in zip(spans, blobs):
        assert deltadv.read_dv_file_blob(p, off, size) == blob
    # corrupt one byte inside the first blob → CRC failure
    raw = bytearray(open(p, "rb").read())
    raw[spans[0][0] + 4 + 2] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        deltadv.read_dv_file_blob(p, spans[0][0], spans[0][1])


# ---------------------------------------------------------------------------
# end-to-end over delta tables
# ---------------------------------------------------------------------------


@pytest.fixture()
def dv_table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 50).select(
        "id", (F.col("id") % 5).cast("string").alias("cat")
    )
    write_delta(df, root)
    return root


def _ids(spark, root, **kw):
    return sorted(r.id for r in read_delta(spark, root, **kw).collect())


def test_delete_rows_with_dv_basic(spark, dv_table):
    v = delete_rows_with_dv(spark, dv_table, "id % 10 = 3")
    assert v == 1
    assert _ids(spark, dv_table) == [
        i for i in range(50) if i % 10 != 3
    ]
    # no data file was rewritten: same physical parquet set
    snap = DeltaSnapshot(dv_table)
    assert all(
        a.get("deletionVector") for a in snap.adds.values()
    ) or any(a.get("deletionVector") for a in snap.adds.values())
    assert snap.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    # time travel: version 0 still sees every row
    assert _ids(spark, dv_table, version=0) == list(range(50))


def test_delete_rows_with_dv_merges_existing(spark, dv_table):
    delete_rows_with_dv(spark, dv_table, "id IN (1, 2)")
    delete_rows_with_dv(spark, dv_table, "id IN (2, 3, 40)")
    assert _ids(spark, dv_table) == sorted(
        set(range(50)) - {1, 2, 3, 40}
    )


def test_delete_all_rows_becomes_plain_remove(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(0, 10).select("id"), root)
    delete_rows_with_dv(spark, root, "id >= 0")
    snap = DeltaSnapshot(root)
    assert snap.live_files() == []
    assert _ids(spark, root) == []


def test_dv_nothing_matched_returns_none(spark, dv_table):
    assert delete_rows_with_dv(spark, dv_table, "id > 999") is None


def test_dv_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).cast("string").alias("cat")
    )
    write_delta(df, root, partition_by=["cat"])
    delete_rows_with_dv(spark, root, "id % 4 = 0 AND cat = '0'")
    want = [i for i in range(60) if not (i % 4 == 0 and i % 3 == 0)]
    assert _ids(spark, root) == want


def test_dv_inline_descriptor(spark, tmp_path):
    """storageType 'i': the blob rides z85-encoded in the log itself —
    plant one the way a small external DELETE commits it."""
    root = str(tmp_path / "t")
    write_delta(spark.range(0, 10).select("id").coalesce(1), root)
    snap = DeltaSnapshot(root)
    (add,) = snap.live_files()
    blob = deltadv.dv_blob_encode([0, 4])
    new_add = dict(add)
    new_add["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": deltadv.z85_encode(
            blob + b"\x00" * (-len(blob) % 4)
        )
        if len(blob) % 4
        else deltadv.z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": 2,
    }
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {"remove": {"path": add["path"], "dataChange": True}},
        {"add": new_add},
    ]
    with open(
        os.path.join(root, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    assert _ids(spark, root) == [1, 2, 3, 5, 6, 7, 8, 9]


def test_dv_survives_checkpoint(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(0, 30).select("id"), root)
    delete_rows_with_dv(spark, root, "id < 5")
    v = delete_rows_with_dv(spark, root, "id IN (7)")
    write_checkpoint(root, v)
    # replay from the checkpoint only: nuke nothing, just confirm the
    # snapshot built through _read_checkpoint keeps descriptors+features
    snap = DeltaSnapshot(root)
    assert snap._usable_checkpoint(snap.version) == v
    assert "deletionVectors" in snap.protocol.get("readerFeatures", [])
    assert any(a.get("deletionVector") for a in snap.adds.values())
    assert _ids(spark, root) == [i for i in range(5, 30) if i != 7]


def test_optimize_refuses_dv_table(spark, dv_table):
    delete_rows_with_dv(spark, dv_table, "id = 1")
    with pytest.raises(
        NotImplementedError, match="deletionVectors|deletion vector"
    ):
        optimize_delta(spark, dv_table, min_files=1)


def test_dv_cardinality_mismatch_fails(spark, tmp_path):
    blob = deltadv.dv_blob_encode([1, 2, 3])
    desc = {
        "storageType": "i",
        "pathOrInlineDv": deltadv.z85_encode(
            blob + b"\x00" * (-len(blob) % 4)
        )
        if len(blob) % 4
        else deltadv.z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": 99,
    }
    with pytest.raises(ValueError, match="cardinality"):
        deltadv.descriptor_positions(str(tmp_path), desc)


# ---------------------------------------------------------------------------
# change feed over DV commits (r12: exact position-diff deletes)
# ---------------------------------------------------------------------------


def test_change_feed_dv_position_diff(spark, tmp_path):
    from deltacat_spark.sources.deltalake import read_delta_changes

    root = str(tmp_path / "t")
    write_delta(spark.range(0, 20).select("id"), root)  # v0
    delete_rows_with_dv(spark, root, "id < 4")  # v1
    delete_rows_with_dv(spark, root, "id < 6")  # v2: overlap — only 4,5 new
    ch = read_delta_changes(spark, root, from_version=1).collect()
    by_v = {}
    for r in ch:
        by_v.setdefault(r._commit_version, []).append((r._change_type, r.id))
    assert sorted(by_v[1]) == [("delete", i) for i in range(4)]
    assert sorted(by_v[2]) == [("delete", 4), ("delete", 5)]


def test_change_feed_full_file_delete_excludes_prior_dv(spark, tmp_path):
    from deltacat_spark.sources.deltalake import read_delta_changes

    root = str(tmp_path / "t")
    write_delta(spark.range(0, 10).select("id").coalesce(1), root)  # v0
    delete_rows_with_dv(spark, root, "id < 4")  # v1: DV on the file
    delete_rows_with_dv(spark, root, "id >= 0")  # v2: rest → plain remove
    ch = read_delta_changes(spark, root, from_version=2).collect()
    # the whole-file delete must NOT resurrect rows 0..3
    assert sorted(r.id for r in ch) == list(range(4, 10))
    assert {r._change_type for r in ch} == {"delete"}


def test_change_feed_overwrite_applies_prior_dv(spark, tmp_path):
    from deltacat_spark.sources.deltalake import read_delta_changes

    root = str(tmp_path / "t")
    write_delta(spark.range(0, 8).select("id"), root)  # v0
    delete_rows_with_dv(spark, root, "id IN (1, 2)")  # v1
    write_delta(
        spark.range(100, 103).select("id"), root, mode="overwrite"
    )  # v2: removes all live files
    ch = read_delta_changes(spark, root, from_version=2).collect()
    dels = sorted(r.id for r in ch if r._change_type == "delete")
    ins = sorted(r.id for r in ch if r._change_type == "insert")
    assert dels == [0, 3, 4, 5, 6, 7]  # 1,2 were already DV-deleted
    assert ins == [100, 101, 102]
