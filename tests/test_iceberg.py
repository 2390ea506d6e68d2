"""Jar-free Iceberg v2 interop tests (`sources/iceberg.py`).

Reference surface: the converter session's external-Iceberg commits
(`compute/converter/converter_session.py:46-429` — equality deletes
converted to POSITION deletes and committed as real snapshots) and
DatastoreType ICEBERG (`types/media.py:353-420`). Previously this was
the one env-blocked row in SURVEY §2 (no iceberg-spark-runtime jar);
the spec-direct metadata/manifest implementation closes it in-sandbox.
Tests assert behavior (round-trip, time travel, pruning, layered
position deletes) and on-disk spec structure (metadata JSON fields,
manifest-list/manifest avro record names, delete-file schema).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    commit_position_deletes,
    convert_equality_deletes_to_position,
    find_positions_for_predicate,
    iceberg_history,
    iceberg_schema_for,
    read_iceberg,
    spark_schema_for,
    write_iceberg,
)


@pytest.fixture()
def df100(spark):
    return spark.range(0, 100).select(
        "id",
        (F.col("id") % 3).cast("string").alias("cat"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_roundtrip_partitioned(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    back = read_iceberg(spark, root)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df100.schema.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df100.collect())
    )


def test_append_overwrite_time_travel(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    s0 = write_iceberg(df100, root, partition_by=["cat"])
    s1 = write_iceberg(
        spark.range(100, 150).select(
            "id", F.lit("9").alias("cat"), F.lit(0.5).alias("v")
        ),
        root,
    )
    assert read_iceberg(spark, root).count() == 150
    assert read_iceberg(spark, root, snapshot_id=s0).count() == 100
    write_iceberg(df100.limit(5), root, mode="overwrite")
    assert read_iceberg(spark, root).count() == 5
    assert read_iceberg(spark, root, snapshot_id=s1).count() == 150
    ops = [h["operation"] for h in iceberg_history(root)]
    assert ops == ["append", "append", "overwrite"]


def test_partition_pruning_from_manifests(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    pruned = read_iceberg(spark, root, partition_filter={"cat": "1"})
    rows = pruned.collect()
    assert len(rows) == 33 and all(r.cat == "1" for r in rows)
    # manifest partition records carry typed identity values
    tbl = IcebergTable(root)
    data, _ = tbl.live_files()
    assert {f["partition"]["cat"] for f in data} == {"0", "1", "2"}
    # single-valued files: every file belongs to exactly one partition
    assert all(len(f["partition"]) == 1 for f in data)


def test_position_deletes_layered(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    s0 = write_iceberg(df100, root, partition_by=["cat"])
    convert_equality_deletes_to_position(spark, root, "id < 10")
    out = read_iceberg(spark, root)
    assert out.count() == 90 and out.filter("id < 10").count() == 0
    # second delete layers on the first
    convert_equality_deletes_to_position(spark, root, "cat = '2'")
    out2 = read_iceberg(spark, root)
    assert out2.count() == 90 - out.filter("cat = '2'").count()
    # pre-delete snapshot unaffected
    assert read_iceberg(spark, root, snapshot_id=s0).count() == 100
    # apply_deletes=False sees the raw files
    assert read_iceberg(spark, root, apply_deletes=False).count() == 100


def test_position_delete_file_schema_per_spec(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root)
    convert_equality_deletes_to_position(spark, root, "id = 3")
    tbl = IcebergTable(root)
    data, deletes = tbl.live_files()
    assert len(deletes) == 1
    d = deletes[0]
    assert d["content"] == 1 and d["file_format"] == "PARQUET"
    pos = spark.read.parquet(os.path.join(root, d["file_path"]))
    assert set(pos.columns) == {"file_path", "pos"}
    assert pos.count() == 1
    row = pos.collect()[0]
    # file_path is table-root-relative and points at a live data file
    assert row.file_path in {f["file_path"] for f in data}


def test_find_positions_matches_filter(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    dels = find_positions_for_predicate(spark, root, "id % 10 = 0")
    assert dels.count() == 10
    commit_position_deletes(spark, root, dels)
    assert read_iceberg(spark, root).filter("id % 10 = 0").count() == 0


def test_metadata_json_per_spec(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    meta = IcebergTable(root).metadata()
    assert meta["format-version"] == 2
    for key in (
        "table-uuid",
        "last-sequence-number",
        "schemas",
        "current-schema-id",
        "partition-specs",
        "default-spec-id",
        "snapshots",
        "current-snapshot-id",
        "snapshot-log",
    ):
        assert key in meta, key
    spec = meta["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity" and spec["name"] == "cat"
    assert spec["field-id"] >= 1000
    # schema fields carry unique ids
    ids = [f["id"] for f in meta["schemas"][0]["fields"]]
    assert len(set(ids)) == len(ids)
    snap = meta["snapshots"][-1]
    assert snap["manifest-list"].endswith(".avro")
    # version-hint convention
    hint = os.path.join(root, "metadata", "version-hint.text")
    assert open(hint).read().strip() == "1"


def test_manifest_avro_record_names_per_spec(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    tbl = IcebergTable(root)
    snap = tbl.snapshot(tbl.metadata())
    ml_schema, manifests = avrofile.read_container(
        os.path.join(root, snap["manifest-list"])
    )
    assert ml_schema["name"] == "manifest_file"
    names = {f["name"] for f in ml_schema["fields"]}
    assert {
        "manifest_path",
        "manifest_length",
        "partition_spec_id",
        "content",
        "sequence_number",
        "added_snapshot_id",
        "added_rows_count",
    } <= names
    m_schema, entries = avrofile.read_container(
        os.path.join(root, manifests[0]["manifest_path"])
    )
    assert m_schema["name"] == "manifest_entry"
    e = entries[0]
    assert e["status"] == 1
    assert e["data_file"]["file_format"] == "PARQUET"
    assert e["data_file"]["record_count"] > 0


def test_schema_mapping_roundtrip(spark):
    from pyspark.sql import types as T

    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.ArrayType(T.DoubleType(), True), True),
            T.StructField(
                "d", T.MapType(T.StringType(), T.IntegerType(), True), True
            ),
            T.StructField("e", T.DecimalType(10, 2), True),
            T.StructField(
                "f",
                T.StructType([T.StructField("x", T.BooleanType(), True)]),
                True,
            ),
        ]
    )
    ice = iceberg_schema_for(st)
    back = spark_schema_for(ice)
    assert back == st


def test_concurrent_metadata_commit_loses(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_iceberg(df100, root)
    # pre-create v2 metadata: the next commit's os.link must lose
    v2 = os.path.join(root, "metadata", "v2.metadata.json")
    with open(v2, "w") as f:
        json.dump({}, f)
    with pytest.raises(RuntimeError, match="concurrent"):
        write_iceberg(df100.limit(1), root)


def test_datastore_registry_roundtrip(spark, tmp_path, df100):
    from deltacat_spark.sources.formats import read_url, write_url

    url = "iceberg+file://" + str(tmp_path / "t")
    write_url(df100, url, datastore="iceberg")
    assert read_url(spark, url).count() == 100


def test_catalog_export_import_bridge(spark, tmp_path, df100):
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.sources.iceberg import (
        export_table_to_iceberg,
        import_iceberg_to_table,
    )

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_namespace("default")
    cat.write_to_table(df100, "src", mode="create")
    dest = str(tmp_path / "ice_out")
    export_table_to_iceberg(cat, "src", dest)
    assert read_iceberg(spark, dest).count() == 100
    import_iceberg_to_table(cat, spark, dest, "back")
    assert sorted(map(tuple, cat.read_table("back").collect())) == sorted(
        map(tuple, cat.read_table("src").collect())
    )


def test_rewrite_data_files_folds_deletes(spark, tmp_path, df100):
    """rewrite_data_files applies+folds position deletes into a
    `replace` snapshot: same rows, no delete manifests, prior
    snapshots intact, append stream silent on the reorganization."""
    from deltacat_spark.sources.iceberg import (
        IcebergTable,
        convert_equality_deletes_to_position,
        iceberg_history,
        rewrite_data_files,
    )
    from deltacat_spark.streaming import stream_read_iceberg

    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    convert_equality_deletes_to_position(spark, root, "id % 10 = 0")
    expect = sorted(
        map(tuple, read_iceberg(spark, root).collect())
    )
    assert len(expect) == 90
    sid = rewrite_data_files(spark, root)
    hist = iceberg_history(root)
    assert hist[-1]["snapshot_id"] == sid
    assert hist[-1]["operation"] == "replace"
    # deletes folded: no delete files live, same rows
    tbl = IcebergTable(root)
    data, deletes = tbl.live_files()
    assert deletes == []
    assert sorted(map(tuple, read_iceberg(spark, root).collect())) == expect
    # first snapshot still time-travels to the pre-delete state
    first = hist[0]["snapshot_id"]
    assert read_iceberg(spark, root, snapshot_id=first).count() == 100
    # stream: replace is a non-append -> skip policy delivers only the
    # original append's rows
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    q = (
        stream_read_iceberg(spark, root, on_non_append="skip")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 100


def test_expire_snapshots_retention_and_file_removal(
    spark, tmp_path, df100
):
    from deltacat_spark.sources.iceberg import expire_snapshots

    root = str(tmp_path / "t")
    s0 = write_iceberg(df100, root, partition_by=["cat"])
    s1 = write_iceberg(
        spark.range(100, 150).select(
            "id", F.lit("9").alias("cat"), F.lit(0.5).alias("v")
        ),
        root,
    )
    s2 = write_iceberg(
        spark.range(150, 160).select(
            "id", F.lit("8").alias("cat"), F.lit(0.25).alias("v")
        ),
        root,
    )
    tbl = IcebergTable(root)
    before = {s["snapshot-id"] for s in tbl.metadata()["snapshots"]}
    assert before == {s0, s1, s2}

    removed = expire_snapshots(root, keep_last=2)
    meta = tbl.metadata()
    assert {s["snapshot-id"] for s in meta["snapshots"]} == {s1, s2}
    assert {e["snapshot-id"] for e in meta["snapshot-log"]} == {s1, s2}
    # s0's manifest list is gone, but its DATA files are shared with the
    # retained append snapshots (append carries manifests forward), so
    # no parquet was deleted and the current read still sees all rows
    assert removed and all(r.endswith(".avro") for r in removed)
    assert read_iceberg(spark, root).count() == 160
    with pytest.raises(ValueError):
        read_iceberg(spark, root, snapshot_id=s0)
    # expiring again is a no-op
    assert expire_snapshots(root, keep_last=2) == []


def test_expire_snapshots_drops_overwritten_data_files(
    spark, tmp_path, df100
):
    from deltacat_spark.sources.iceberg import expire_snapshots

    root = str(tmp_path / "t")
    write_iceberg(df100, root)
    s1 = write_iceberg(
        spark.range(0, 7).select(
            "id",
            F.lit("0").alias("cat"),
            F.lit(1.0).alias("v"),
        ),
        root,
        mode="overwrite",
    )
    removed = expire_snapshots(root, keep_last=1)
    # the overwritten generation's parquet is referenced by NOTHING
    # retained — it must be physically gone
    assert any(r.endswith(".parquet") for r in removed)
    for rel in removed:
        assert not os.path.isfile(os.path.join(root, rel))
    back = read_iceberg(spark, root)
    assert back.count() == 7
    assert IcebergTable(root).metadata()["current-snapshot-id"] == s1


def test_remove_orphan_files_age_gated(spark, tmp_path, df100):
    from deltacat_spark.sources.iceberg import remove_orphan_files

    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])
    orphan = os.path.join(root, "data", "crashed-write.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    # younger than the cutoff -> protected (in-flight writer safety)
    assert remove_orphan_files(root, older_than_s=3600) == []
    assert os.path.isfile(orphan)
    # past the cutoff -> removed; live files untouched
    removed = remove_orphan_files(root, older_than_s=0)
    assert removed == [os.path.join("data", "crashed-write.parquet")]
    assert read_iceberg(spark, root).count() == 100


def test_incremental_read_between_snapshots(spark, tmp_path, df100):
    from deltacat_spark.sources.iceberg import read_iceberg_incremental

    root = str(tmp_path / "t")
    write_iceberg(df100, root, partition_by=["cat"])  # seq 1
    write_iceberg(
        spark.range(100, 120).select(
            "id", (F.col("id") % 3).cast("string").alias("cat"),
            F.lit(0.5).alias("v"),
        ),
        root,
    )  # seq 2
    write_iceberg(
        spark.range(120, 125).select(
            "id", F.lit("7").alias("cat"), F.lit(0.25).alias("v")
        ),
        root,
    )  # seq 3

    inc = read_iceberg_incremental(spark, root, from_sequence=1)
    rows = inc.collect()
    assert sorted(r.id for r in rows) == list(range(100, 125))
    # per-row snapshot stamps distinguish the two appends
    assert len({r._snapshot_id for r in rows}) == 2
    # partition column reconstructed (second append carried cat)
    assert {r.cat for r in rows if r.id >= 120} == {"7"}
    # bounded window: only the middle append
    mid = read_iceberg_incremental(spark, root, 1, 2)
    assert sorted(r.id for r in mid.collect()) == list(range(100, 120))
    # empty window
    assert read_iceberg_incremental(spark, root, 3).count() == 0


def test_incremental_read_non_append_policy(spark, tmp_path, df100):
    from deltacat_spark.sources.iceberg import (
        read_iceberg_incremental,
        rewrite_data_files,
    )

    root = str(tmp_path / "t")
    write_iceberg(df100, root)  # seq 1
    rewrite_data_files(spark, root)  # seq 2: replace — no new rows
    write_iceberg(
        spark.range(100, 103).select(
            "id", F.lit("9").alias("cat"), F.lit(1.0).alias("v")
        ),
        root,
    )  # seq 3
    with pytest.raises(ValueError, match="not an append"):
        read_iceberg_incremental(spark, root, 1)
    got = read_iceberg_incremental(spark, root, 1, on_non_append="skip")
    # the rewrite re-packaged seq-1's rows but must NOT re-deliver them
    assert sorted(r.id for r in got.collect()) == [100, 101, 102]
