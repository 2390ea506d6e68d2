"""Round-11 ADVICE fixes.

1. `datastores._local_table_path` / `resolve` handle `<type>+<path>`
   URLs with no `:` scheme (e.g. `delta+/tmp/x/t`) — previously the
   prefix survived and writers created a literal `delta+...` dir
   relative to the CWD.
2. `deltalake._scan_files` general layout sorts partition groups
   None-safely (externally-written tables may carry null
   partitionValues).
3. `avrofile.write_value` raises a named error when a record field is
   missing, has no default, and its type does not admit null (was:
   silently encoding the literal string 'None' for string fields).
4. `iceberg.live_files` rejects external EQUALITY delete files
   (data_file.content==2) instead of misreading them as position
   deletes, and position-delete application is scoped by sequence
   number (a delete at seq S never touches a data file added after S).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.datastores import (
    _local_table_path,
    resolve,
)
from deltacat_spark.sources.deltalake import read_delta
from deltacat_spark.sources.iceberg import (
    METADATA_DIR,
    IcebergTable,
    commit_position_deletes,
    read_iceberg,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# 1. datastore URL prefix stripping without a ':' scheme
# ---------------------------------------------------------------------------


def test_local_table_path_strips_prefix_without_scheme():
    assert _local_table_path("delta+/tmp/x/t") == "/tmp/x/t"
    assert _local_table_path("iceberg+/tmp/x/t") == "/tmp/x/t"
    assert _local_table_path("hudi+/tmp/x/t") == "/tmp/x/t"
    # scheme-ful forms still work
    assert _local_table_path("delta+file:///tmp/x/t") == "/tmp/x/t"
    assert _local_table_path("/tmp/plain") == "/tmp/plain"


def test_local_table_path_rejects_relative_result():
    with pytest.raises(ValueError, match="relative"):
        _local_table_path("delta+rel/path")


def test_resolve_prefix_without_scheme():
    assert resolve("delta+/tmp/x/t").name == "deltalake"
    assert resolve("iceberg+/tmp/x/t").name == "iceberg"
    # a '+' in a plain path that is NOT a registered prefix stays a
    # file path (resolve → None)
    assert resolve("/tmp/a+b/file.parquet") is None


def test_datastore_write_does_not_create_literal_prefix_dir(
    spark, tmp_path, monkeypatch
):
    """write through the registry with a scheme-less prefixed URL: the
    table must land at the real path, and no 'delta+...' junk dir may
    appear in the CWD."""
    monkeypatch.chdir(tmp_path)
    target = tmp_path / "real" / "t"
    ds = resolve(f"delta+{target}")
    df = spark.range(5).select("id")
    ds.write(df, f"delta+{target}")
    assert (target / "_delta_log").exists()
    assert not any(p.name.startswith("delta+") for p in tmp_path.iterdir())
    back = ds.read(spark, f"delta+{target}")
    assert back.count() == 5


# ---------------------------------------------------------------------------
# 2. deltalake: None-safe partition-group ordering (general layout)
# ---------------------------------------------------------------------------


def test_delta_general_layout_null_partition_values(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    # two flat (non-hive) data files from an "external writer"
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "cat",
                    "type": "string",
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )
    files = []
    for i, pv in enumerate([{"cat": None}, {"cat": "a"}]):
        staging = str(tmp_path / f"stage{i}")
        spark.range(i * 10, i * 10 + 10).select("id").coalesce(
            1
        ).write.parquet(staging)
        part = [
            f for f in os.listdir(staging) if f.endswith(".parquet")
        ][0]
        name = f"part-{i:05d}.parquet"
        os.replace(os.path.join(staging, part), os.path.join(root, name))
        files.append((name, pv))
    actions = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 2,
            }
        },
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["cat"],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ] + [
        {
            "add": {
                "path": name,
                "partitionValues": pv,
                "size": os.path.getsize(os.path.join(root, name)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for name, pv in files
    ]
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as f:
        f.write("\n".join(json.dumps(a) for a in actions))

    back = read_delta(spark, root)  # was: TypeError on None < str
    rows = sorted(back.collect(), key=lambda r: r.id)
    assert len(rows) == 20
    assert {r.cat for r in rows[:10]} == {None}
    assert {r.cat for r in rows[10:]} == {"a"}


# ---------------------------------------------------------------------------
# 3. avrofile: missing non-nullable field is a named error
# ---------------------------------------------------------------------------

_REC = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "req_s", "type": "string"},
        {"name": "opt_s", "type": ["null", "string"]},
        {"name": "def_i", "type": "int", "default": 7},
    ],
}


def test_avro_missing_required_field_raises_named_error():
    enc = avrofile._Encoder()
    with pytest.raises(ValueError, match=r"'req_s'"):
        avrofile.write_value(_REC, {"opt_s": "x"}, enc, {})


def test_avro_missing_nullable_and_defaulted_fields_ok():
    enc = avrofile._Encoder()
    avrofile.write_value(_REC, {"req_s": "v"}, enc, {})
    dec = avrofile._Decoder(enc.getvalue())
    out = avrofile.read_value(_REC, dec, {})
    assert out == {"req_s": "v", "opt_s": None, "def_i": 7}


# ---------------------------------------------------------------------------
# 4. iceberg: equality-delete rejection + sequence-number scoping
# ---------------------------------------------------------------------------


@pytest.fixture()
def iceberg_df(spark):
    return spark.range(0, 40).select(
        "id",
        (F.col("id") % 2).cast("string").alias("cat"),
        (F.col("id") * 0.5).alias("v"),
    )


def _delete_manifests(tbl):
    meta = tbl.metadata()
    snap = tbl.snapshot(meta)
    return [m for m in tbl.manifests(snap) if m["content"] == 1]


def test_external_equality_delete_file_rejected(
    spark, tmp_path, iceberg_df
):
    root = str(tmp_path / "t")
    write_iceberg(iceberg_df, root)
    deletes = spark.createDataFrame(
        [("whatever.parquet", 0)], "file_path string, pos long"
    )
    commit_position_deletes(spark, root, deletes)
    tbl = IcebergTable(root)
    # flip the committed delete entry to content=2 (EQUALITY) — the
    # shape an external spec-compliant writer produces
    mf = _delete_manifests(tbl)[0]
    mpath = os.path.join(root, mf["manifest_path"])
    schema, rows = avrofile.read_container(mpath)
    for e in rows:
        e["data_file"]["content"] = 2
    avrofile.write_container(mpath, schema, rows)
    with pytest.raises(NotImplementedError, match="equality delete"):
        tbl.live_files()
    with pytest.raises(NotImplementedError, match="equality delete"):
        read_iceberg(spark, root).count()


def test_position_delete_sequence_scoping(spark, tmp_path, iceberg_df):
    """A position delete at sequence S must not delete rows from a data
    file added at sequence > S, even if the paths collide (the spec's
    delete_seq >= data_seq rule)."""
    root = str(tmp_path / "t")
    write_iceberg(iceberg_df, root)  # seq 1: rows 0..39
    extra = spark.range(100, 110).select(
        "id", F.lit("x").alias("cat"), F.lit(0.0).alias("v")
    ).coalesce(1)
    write_iceberg(extra, root, mode="append")  # seq 2: rows 100..109
    tbl = IcebergTable(root)
    data, _ = tbl.live_files()
    seq2_path = [
        f
        for f in data
        if f["__seq"] == 2 and f["record_count"] >= 3
    ][0]["file_path"]
    deletes = spark.createDataFrame(
        [(seq2_path, i) for i in range(3)], "file_path string, pos long"
    )
    commit_position_deletes(spark, root, deletes)  # seq 3 — in scope
    assert read_iceberg(spark, root).count() == 47

    # rewind the delete's sequence number to 1: now it precedes the
    # seq-2 data file and must not apply to it
    mf = _delete_manifests(tbl)[0]
    mpath = os.path.join(root, mf["manifest_path"])
    schema, rows = avrofile.read_container(mpath)
    for e in rows:
        e["sequence_number"] = 1
        e["file_sequence_number"] = 1
    avrofile.write_container(mpath, schema, rows)
    # also the manifest-list row (inheritance source)
    meta = tbl.metadata()
    snap = tbl.snapshot(meta)
    lpath = os.path.join(root, snap["manifest-list"])
    lschema, lrows = avrofile.read_container(lpath)
    for m in lrows:
        if m["content"] == 1:
            m["sequence_number"] = 1
            m["min_sequence_number"] = 1
    avrofile.write_container(lpath, lschema, lrows)

    assert read_iceberg(spark, root).count() == 50  # nothing deleted
