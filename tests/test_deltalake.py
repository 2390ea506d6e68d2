"""Jar-free Delta Lake interop tests (`sources/deltalake.py`).

Reference surface: DatastoreType DELTA_LAKE (`types/media.py:353-420`)
and converter-session external-table commits
(`compute/converter/converter_session.py:46-429`). No delta-spark jar
exists here, so the module implements the public Delta PROTOCOL.md
directly; these tests assert both behavior (round-trips, time travel,
pruning) and on-disk spec structure (action layout, checkpoint files).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    delta_history,
    read_delta,
    write_delta,
    write_checkpoint,
)


@pytest.fixture()
def df100(spark):
    return spark.range(0, 100).select(
        "id",
        (F.col("id") % 3).cast("string").alias("cat"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_write_read_roundtrip_partitioned(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    assert write_delta(df100, root, partition_by=["cat"]) == 0
    back = read_delta(spark, root)
    # same names and types (nullability may relax through the log)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df100.schema.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df100.collect())
    )


def test_append_overwrite_time_travel(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    more = spark.range(100, 150).select(
        "id", F.lit("9").alias("cat"), F.lit(0.5).alias("v")
    )
    assert write_delta(more, root) == 1
    assert read_delta(spark, root).count() == 150
    assert read_delta(spark, root, version=0).count() == 100
    write_delta(df100.limit(10), root, mode="overwrite")
    assert read_delta(spark, root).count() == 10
    assert read_delta(spark, root, version=1).count() == 150
    hist = delta_history(root)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["operationParameters"]["mode"] == "OVERWRITE"


def test_partition_pruning_is_log_side(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    pruned = read_delta(spark, root, partition_filter={"cat": "1"})
    rows = pruned.collect()
    assert all(r.cat == "1" for r in rows) and len(rows) == 33
    # the scan's input files must come from one partition dir only
    files = [
        f["path"]
        for f in DeltaSnapshot(root).live_files()
        if (f.get("partitionValues") or {}).get("cat") == "1"
    ]
    assert files and all("cat=1" in p for p in files)


def test_log_structure_per_spec(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    log0 = os.path.join(root, "_delta_log", "00000000000000000000.json")
    actions = [json.loads(x) for x in open(log0) if x.strip()]
    keys = [next(iter(a)) for a in actions]
    assert keys[0] == "protocol" and keys[1] == "metaData"
    assert keys[-1] == "commitInfo"
    proto = actions[0]["protocol"]
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = actions[1]["metaData"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["cat"]
    # schemaString is a Spark-JSON struct
    assert json.loads(meta["schemaString"])["type"] == "struct"
    adds = [a["add"] for a in actions if "add" in a]
    assert adds
    for a in adds:
        assert a["dataChange"] is True
        assert a["partitionValues"].keys() == {"cat"}
        stats = json.loads(a["stats"])
        assert stats["numRecords"] > 0
        assert "minValues" in stats and "id" in stats["minValues"]
        # paths are table-root-relative and live in hive dirs
        assert not a["path"].startswith("/") and "cat=" in a["path"]


def test_checkpoint_roundtrip_and_tail_replay(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    write_delta(df100.limit(5), root)
    write_checkpoint(root, 1)
    assert os.path.isfile(
        os.path.join(root, "_delta_log", f"{1:020d}.checkpoint.parquet")
    )
    lc = json.load(open(os.path.join(root, "_delta_log", "_last_checkpoint")))
    assert lc["version"] == 1
    # commit AFTER the checkpoint; snapshot = checkpoint + tail
    write_delta(df100.limit(7), root)
    assert read_delta(spark, root).count() == 112
    snap = DeltaSnapshot(root)
    assert snap.version == 2 and snap.metadata["partitionColumns"] == ["cat"]


def test_checkpoint_written_automatically_every_interval(spark, tmp_path):
    import deltacat_spark.sources.deltalake as dl

    root = str(tmp_path / "t")
    one = spark.range(0, 1).select("id")
    old = dl.CHECKPOINT_INTERVAL
    dl.CHECKPOINT_INTERVAL = 3
    try:
        for _ in range(4):
            write_delta(one, root)
    finally:
        dl.CHECKPOINT_INTERVAL = old
    assert os.path.isfile(
        os.path.join(root, "_delta_log", f"{3:020d}.checkpoint.parquet")
    )
    assert read_delta(spark, root).count() == 4


def test_unpartitioned_and_empty_partition_filter(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100.drop("cat"), root)
    assert read_delta(spark, root).count() == 100
    # filter that matches nothing -> empty frame with full schema
    root2 = str(tmp_path / "t2")
    write_delta(df100, root2, partition_by=["cat"])
    empty = read_delta(spark, root2, partition_filter={"cat": "zzz"})
    assert empty.count() == 0
    assert empty.schema == df100.schema


def test_partition_column_mismatch_rejected(spark, tmp_path, df100):
    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    with pytest.raises(ValueError, match="partition columns"):
        write_delta(df100, root, partition_by=[])


def test_concurrent_commit_loser_detected(spark, tmp_path, df100, monkeypatch):
    """Two writers racing to the same version: the second link() loses."""
    import deltacat_spark.sources.deltalake as dl

    root = str(tmp_path / "t")
    write_delta(df100, root)
    write_delta(df100.limit(2), root)
    # a racing writer read the log at version 0 and will target version
    # 1, which now exists — its os.link commit must lose, not clobber
    monkeypatch.setattr(dl, "_list_versions", lambda r: [0])
    with pytest.raises(RuntimeError, match="concurrent"):
        write_delta(df100.limit(1), root)
    monkeypatch.undo()
    assert read_delta(spark, root).count() == 102


def test_datastore_registry_roundtrip(spark, tmp_path, df100):
    from deltacat_spark.sources.formats import read_url, write_url

    url = "delta+file://" + str(tmp_path / "t")
    write_url(df100, url, datastore="deltalake")
    back = read_url(spark, url)
    assert back.count() == 100


def test_catalog_export_import_bridge(spark, tmp_path, df100):
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.sources.deltalake import (
        export_table_to_delta,
        import_delta_to_table,
    )

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_namespace("default")
    cat.write_to_table(df100, "src", mode="create")
    dest = str(tmp_path / "delta_out")
    export_table_to_delta(cat, "src", dest)
    assert read_delta(spark, dest).count() == 100
    import_delta_to_table(cat, spark, dest, "back")
    assert cat.read_table("back").count() == 100
    a = sorted(map(tuple, cat.read_table("src").collect()))
    b = sorted(map(tuple, cat.read_table("back").collect()))
    assert a == b


def test_optimize_vacuum_and_stream_ignore(spark, tmp_path, df100):
    """OPTIMIZE compacts each partition to one file with
    dataChange=false (time travel intact, append stream silent);
    vacuum drops the replaced files."""
    from deltacat_spark.sources.deltalake import optimize_delta, vacuum_delta
    from deltacat_spark.streaming import stream_read_delta

    root = str(tmp_path / "t")
    write_delta(df100, root, partition_by=["cat"])
    write_delta(
        spark.range(100, 140).select(
            "id", (F.col("id") % 3).cast("string").alias("cat"),
            F.lit(0.5).alias("v"),
        ),
        root,
    )
    snap_before = sorted(
        map(tuple, read_delta(spark, root).collect())
    )
    n_before = len(DeltaSnapshot(root).live_files())
    assert n_before > 3  # several task files per partition
    v = optimize_delta(spark, root)
    assert v == 2
    assert len(DeltaSnapshot(root).live_files()) == 3
    assert sorted(map(tuple, read_delta(spark, root).collect())) == snap_before
    # time travel to pre-OPTIMIZE resolves the old files
    assert read_delta(spark, root, version=1).count() == 140
    # append stream across the OPTIMIZE version delivers rows ONCE
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
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
    assert got.count() == 140
    assert sorted(r.id for r in got.collect()) == list(range(140))
    # idempotent, then vacuum removes the 6 replaced files
    assert optimize_delta(spark, root) is None
    doomed = vacuum_delta(root, keep_versions=1)
    assert len(doomed) == n_before
    assert sorted(map(tuple, read_delta(spark, root).collect())) == snap_before
