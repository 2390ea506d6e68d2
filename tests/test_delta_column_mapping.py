"""Delta column mapping (PROTOCOL.md): batch reads of externally-
written mapped tables — parquet columns carry PHYSICAL names
(`delta.columnMapping.physicalName` GUIDs), partitionValues are keyed
by physical names, and the reader must surface LOGICAL names. Both
'name' and 'id' modes read through physical names (delta writers name
parquet columns by physicalName under either mode).
"""

import json
import os

import pytest

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    read_delta,
)

_PHYS_ID = "col-7a3f9b2c"
_PHYS_CAT = "col-d41e8c55"


def _schema_string():
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": _PHYS_ID,
                    },
                },
                {
                    "name": "cat",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": _PHYS_CAT,
                    },
                },
            ],
        }
    )


def _make_mapped_table(tmp_path, mode: str, partitioned: bool):
    """Hand-build the table an external mapped writer produces: parquet
    files with physical column names, a log whose partitionValues are
    keyed by physical names."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / f"t_{mode}_{partitioned}")
    os.makedirs(os.path.join(root, "_delta_log"))
    part_cols = ["cat"] if partitioned else []
    adds = []
    if partitioned:
        groups = {"a": [1, 2, 3], "b": [4, 5]}
        for cat, ids in groups.items():
            rel = f"part-{cat}.parquet"
            pq.write_table(
                pa.table({_PHYS_ID: pa.array(ids, pa.int64())}),
                os.path.join(root, rel),
            )
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {_PHYS_CAT: cat},
                        "size": os.path.getsize(os.path.join(root, rel)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    else:
        rel = "part-0.parquet"
        pq.write_table(
            pa.table(
                {
                    _PHYS_ID: pa.array([1, 2, 3, 4, 5], pa.int64()),
                    _PHYS_CAT: pa.array(list("aabba")),
                }
            ),
            os.path.join(root, rel),
        )
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(root, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "0000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(),
                "partitionColumns": part_cols,
                "configuration": {"delta.columnMapping.mode": mode},
                "createdTime": 0,
            }
        },
    ] + adds
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


@pytest.mark.parametrize("mode", ["name", "id"])
def test_mapped_unpartitioned_reads_logical(spark, tmp_path, mode):
    root = _make_mapped_table(tmp_path, mode, partitioned=False)
    df = read_delta(spark, root)
    assert df.columns == ["id", "cat"]
    got = sorted((r.id, r.cat) for r in df.collect())
    assert got == [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "a")]


def test_mapped_partitioned_reconstructs_from_physical_pv(
    spark, tmp_path
):
    root = _make_mapped_table(tmp_path, "name", partitioned=True)
    df = read_delta(spark, root)
    got = sorted((r.id, r.cat) for r in df.collect())
    assert got == [
        (1, "a"),
        (2, "a"),
        (3, "a"),
        (4, "b"),
        (5, "b"),
    ]


def test_mapped_v3_reader_feature_accepted(spark, tmp_path):
    root = _make_mapped_table(tmp_path, "name", partitioned=False)
    # upgrade to the v3 feature form external writers also use
    with open(
        os.path.join(root, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                        "writerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
    assert read_delta(spark, root).count() == 5


def test_mapped_nested_column_refused(spark, tmp_path):
    root = _make_mapped_table(tmp_path, "name", partitioned=False)
    snap = DeltaSnapshot(root)
    raw = json.loads(snap.metadata["schemaString"])
    raw["fields"].append(
        {
            "name": "nested",
            "type": {"type": "struct", "fields": []},
            "nullable": True,
            "metadata": {
                "delta.columnMapping.physicalName": "col-n"
            },
        }
    )
    md = dict(snap.metadata)
    md["schemaString"] = json.dumps(raw)
    with open(
        os.path.join(root, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"metaData": md}) + "\n")
    with pytest.raises(NotImplementedError, match="nested"):
        read_delta(spark, root)


def test_mapped_table_streams_logical_columns(spark, tmp_path):
    """The append STREAM resolves physical parquet columns and
    physical-keyed partitionValues, delivering logical names — same
    contract as batch read_delta (r12)."""
    from deltacat_spark.streaming import stream_read_delta

    root = _make_mapped_table(tmp_path, "name", partitioned=True)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        stream_read_delta(spark, root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert set(got.columns) == {"id", "cat", "_commit_version"}
    rows = sorted((r.id, r.cat) for r in got.collect())
    assert rows == [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")]


def test_mapped_partition_filter_uses_logical_keys(spark, tmp_path):
    root = _make_mapped_table(tmp_path, "name", partitioned=True)
    df = read_delta(spark, root, partition_filter={"cat": "b"})
    assert sorted(r.id for r in df.collect()) == [4, 5]


def test_delta_timestamp_time_travel(spark, tmp_path):
    from deltacat_spark.sources.deltalake import (
        delta_history,
        write_delta,
    )

    root = str(tmp_path / "tt")
    write_delta(spark.range(0, 5).select("id"), root)
    t0 = delta_history(root)[0]["timestamp"]
    write_delta(spark.range(5, 9).select("id"), root)
    df = read_delta(spark, root, timestamp_ms=t0)
    assert sorted(r.id for r in df.collect()) == list(range(5))
    assert read_delta(spark, root, timestamp_ms=t0 + 10**9).count() == 9
    with pytest.raises(ValueError, match="at or before"):
        read_delta(spark, root, timestamp_ms=t0 - 10**6)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, root, version=0, timestamp_ms=t0)
