"""Iceberg format-version 1 READ support: external legacy tables
(Hive-migrated era) replay through the same manifest walk — v1
manifests simply lack sequence/content fields (defaulted) and the
format predates delete files. Writes / delete commits / incremental
reads / the append stream still require v2 and refuse loudly.
"""

import json
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.iceberg import (
    iceberg_history,
    read_iceberg,
    read_iceberg_incremental,
    write_iceberg,
)

_V1_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_V1_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def _make_v1_table(tmp_path) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "v1")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    entries = []
    for i, ids in enumerate(([1, 2, 3], [4, 5])):
        rel = f"data/f{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "cat": pa.array([str(v % 2) for v in ids]),
                }
            ),
            os.path.join(root, rel),
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": 99,
                "data_file": {
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": len(ids),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, rel)
                    ),
                },
            }
        )
    mrel = "metadata/m0.avro"
    avrofile.write_container(
        os.path.join(root, mrel), _V1_ENTRY_SCHEMA, entries
    )
    lrel = "metadata/snap-99.avro"
    avrofile.write_container(
        os.path.join(root, lrel),
        _V1_LIST_SCHEMA,
        [
            {
                "manifest_path": mrel,
                "manifest_length": os.path.getsize(
                    os.path.join(root, mrel)
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": 99,
            }
        ],
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": root,
        "last-updated-ms": 0,
        "last-column-id": 2,
        # v1 legacy keys: single `schema`, flat `partition-spec`
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {
                    "id": 2,
                    "name": "cat",
                    "required": False,
                    "type": "string",
                },
            ],
        },
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": 99,
        "snapshots": [
            {
                "snapshot-id": 99,
                "timestamp-ms": 1,
                "manifest-list": lrel,
                "summary": {"operation": "append"},
            }
        ],
        "snapshot-log": [{"snapshot-id": 99, "timestamp-ms": 1}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(
        os.path.join(root, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write("1")
    return root


def test_v1_table_reads(spark, tmp_path):
    root = _make_v1_table(tmp_path)
    df = read_iceberg(spark, root)
    got = sorted((r.id, r.cat) for r in df.collect())
    assert got == [(1, "1"), (2, "0"), (3, "1"), (4, "0"), (5, "1")]
    hist = iceberg_history(root)
    assert hist[0]["snapshot_id"] == 99
    assert hist[0]["sequence_number"] is None


def test_v1_write_and_incremental_refused(spark, tmp_path):
    root = _make_v1_table(tmp_path)
    with pytest.raises(NotImplementedError, match="v2"):
        write_iceberg(spark.range(3).select("id"), root)
    with pytest.raises(NotImplementedError, match="v2"):
        read_iceberg_incremental(spark, root, from_sequence=0)
    from deltacat_spark.streaming.lakehouse_source import (
        IcebergAppendsStreamReader,
    )

    with pytest.raises(NotImplementedError, match="v2"):
        IcebergAppendsStreamReader({"root": root})


def test_v1_upgrade_then_full_v2_surface(spark, tmp_path):
    """`upgrade_iceberg_v1_to_v2` is the supported write path for
    legacy tables (the same route Iceberg itself takes): metadata-only
    upgrade, then appends / equality deletes / incremental reads all
    work, with the PRE-upgrade files intact at sequence 0."""
    from pyspark.sql import functions as F

    from deltacat_spark.sources.iceberg import (
        IcebergTable,
        commit_equality_deletes,
        read_iceberg,
        upgrade_iceberg_v1_to_v2,
        write_iceberg,
    )

    root = _make_v1_table(tmp_path)
    upgrade_iceberg_v1_to_v2(root)
    meta = IcebergTable(root).metadata()
    assert meta["format-version"] == 2
    assert meta["schemas"][0]["fields"][0]["name"] == "id"
    assert "schema" not in meta and "partition-spec" not in meta
    assert meta["snapshots"][0]["sequence-number"] == 0
    # idempotent
    upgrade_iceberg_v1_to_v2(root)
    # pre-upgrade rows intact
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == [1, 2, 3, 4, 5]
    # v2 append over the upgraded table
    write_iceberg(
        spark.createDataFrame([(10, "0"), (11, "1")], "id long, cat string"),
        root,
        mode="append",
    )
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == [1, 2, 3, 4, 5, 10, 11]
    # v2 equality delete applies to PRE-upgrade files too (seq 0 < del seq)
    commit_equality_deletes(
        spark, root, spark.createDataFrame([(2,), (10,)], "id long")
    )
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == [1, 3, 4, 5, 11]
    # incremental read sees only the post-upgrade append
    from deltacat_spark.sources.iceberg import read_iceberg_incremental

    inc = read_iceberg_incremental(
        spark, root, from_sequence=0, on_non_append="skip"
    )
    assert sorted(r.id for r in inc.collect()) == [10, 11]


def test_v2_schema_selected_by_id_not_position(spark, tmp_path):
    """Evolved external v2 tables list schemas whose schema-id need not
    equal the list position — selection must match on the id field."""
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(4).select("id", (F.col("id") * 2.0).alias("v")), root
    )
    mpath = os.path.join(root, "metadata")
    v = int(open(os.path.join(mpath, "version-hint.text")).read())
    mfile = os.path.join(mpath, f"v{v}.metadata.json")
    meta = json.load(open(mfile))
    cur = meta["schemas"][0]
    cur = json.loads(json.dumps(cur))
    cur["schema-id"] = 5
    decoy = json.loads(json.dumps(cur))
    decoy["schema-id"] = 0
    decoy["fields"] = decoy["fields"][:1]  # wrong shape if selected
    meta["schemas"] = [decoy, cur]
    meta["current-schema-id"] = 5
    json.dump(meta, open(mfile, "w"))
    df = read_iceberg(spark, root)
    assert df.columns == ["id", "v"]
    assert df.count() == 4


def test_iceberg_timestamp_time_travel(spark, tmp_path):
    from deltacat_spark.sources.iceberg import IcebergTable

    root = str(tmp_path / "tt")
    write_iceberg(spark.range(0, 5).select("id"), root)
    tbl = IcebergTable(root)
    t1 = tbl.snapshot(tbl.metadata())["timestamp-ms"]
    write_iceberg(spark.range(5, 9).select("id"), root, mode="append")
    # at t1 (first commit's own stamp): only the first snapshot
    df = read_iceberg(spark, root, as_of_timestamp_ms=t1)
    assert sorted(r.id for r in df.collect()) == list(range(5))
    # far future: current snapshot
    df = read_iceberg(spark, root, as_of_timestamp_ms=t1 + 10**9)
    assert df.count() == 9
    with pytest.raises(ValueError, match="at or before"):
        read_iceberg(spark, root, as_of_timestamp_ms=t1 - 10**6)
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(
            spark, root, snapshot_id=1, as_of_timestamp_ms=t1
        )
