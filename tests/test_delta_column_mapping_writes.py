"""Column-mapped Delta WRITES (r13) — creating/appending mapped tables
with GUID physical parquet columns, upgrading existing tables
(`enable_column_mapping`), and the change feed / OPTIMIZE unlock on
mapped tables. Read-side mapping is covered by
`test_delta_column_mapping.py`; this file checks the writer emits the
exact external shape (physical names in parquet FOOTERS, physical-keyed
partitionValues, protocol 2/5, schemaString field metadata)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    enable_column_mapping,
    optimize_delta,
    read_delta,
    read_delta_changes,
    update_delta,
    write_delta,
)


def _footer_names(root: str, rel: str) -> list[str]:
    import pyarrow.parquet as pq

    return pq.read_schema(os.path.join(root, rel)).names


@pytest.fixture()
def mapped(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(20).select(
        "id",
        (F.col("id") % 2).cast("string").alias("cat"),
        (F.col("id") * 1.0).alias("val"),
    )
    write_delta(df, root, column_mapping="name")
    return root


def test_mapped_create_external_shape(spark, mapped):
    snap = DeltaSnapshot(mapped)
    assert snap.column_mapping_mode == "name"
    assert snap.protocol == {"minReaderVersion": 2, "minWriterVersion": 5}
    raw = json.loads(snap.metadata["schemaString"])
    ids, phys = [], {}
    for f in raw["fields"]:
        md = f["metadata"]
        ids.append(md["delta.columnMapping.id"])
        phys[f["name"]] = md["delta.columnMapping.physicalName"]
    assert ids == [1, 2, 3]
    assert all(p.startswith("col-") for p in phys.values())
    assert (
        snap.metadata["configuration"]["delta.columnMapping.maxColumnId"]
        == "3"
    )
    # parquet FOOTERS carry the physical GUID names, no logical names
    for f in snap.live_files():
        names = _footer_names(mapped, f["path"])
        assert set(names) == set(phys.values())
    # and the mapped reader surfaces logical names/values
    got = {r.id: (r.cat, r.val) for r in read_delta(spark, mapped).collect()}
    assert got[7] == ("1", 7.0)
    assert len(got) == 20


def test_mapped_append_and_overwrite(spark, mapped):
    write_delta(
        spark.range(100, 103).select(
            "id", F.lit("x").alias("cat"), F.lit(0.5).alias("val")
        ),
        mapped,
    )
    got = sorted(r.id for r in read_delta(spark, mapped).collect())
    assert got == list(range(20)) + [100, 101, 102]
    write_delta(
        spark.range(200, 202).select(
            "id", F.lit("y").alias("cat"), F.lit(1.5).alias("val")
        ),
        mapped,
        mode="overwrite",
    )
    got = sorted(r.id for r in read_delta(spark, mapped).collect())
    assert got == [200, 201]


def test_mapped_partitioned_create(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(12).select(
        "id", (F.col("id") % 3).cast("string").alias("cat")
    )
    write_delta(df, root, partition_by=["cat"], column_mapping="name")
    snap = DeltaSnapshot(root)
    phys = snap.physical_names()
    assert snap.metadata["partitionColumns"] == ["cat"]  # logical
    for f in snap.live_files():
        pv = f["partitionValues"]
        assert list(pv) == [phys["cat"]]  # physical-keyed
        assert phys["cat"] in f["path"]  # hive dirs use physical name
        assert "cat=" not in f["path"]
    got = sorted(
        r.id
        for r in read_delta(
            spark, root, partition_filter={"cat": "1"}
        ).collect()
    )
    assert got == [1, 4, 7, 10]


def test_mapped_rejects_unknown_columns_and_late_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(5).select("id"), root)
    with pytest.raises(ValueError, match="enable_column_mapping"):
        write_delta(
            spark.range(5).select("id"), root, column_mapping="name"
        )
    root2 = str(tmp_path / "t2")
    write_delta(
        spark.range(5).select("id"), root2, column_mapping="name"
    )
    with pytest.raises(ValueError, match="not in the mapped table"):
        write_delta(
            spark.range(5).select("id", F.lit(1).alias("extra")), root2
        )


def test_enable_column_mapping_upgrade(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    write_delta(df, root)
    v = enable_column_mapping(root)
    assert v == 1
    snap = DeltaSnapshot(root)
    assert snap.column_mapping_mode == "name"
    # upgrade keeps display names as physical names: old files read
    assert snap.physical_names() == {"id": "id", "v": "v"}
    assert snap.protocol["minReaderVersion"] == 2
    assert snap.protocol["minWriterVersion"] == 5
    got = sorted(r.id for r in read_delta(spark, root).collect())
    assert got == list(range(10))
    # idempotent
    assert enable_column_mapping(root) == 1
    # appends keep working
    write_delta(spark.range(50, 52).select(
        "id", (F.col("id") * 2).alias("v")), root)
    assert read_delta(spark, root).count() == 12


def test_change_feed_on_mapped_table(spark, mapped):
    write_delta(
        spark.range(100, 102).select(
            "id", F.lit("x").alias("cat"), F.lit(0.5).alias("val")
        ),
        mapped,
    )  # v1 insert
    write_delta(
        spark.range(300, 301).select(
            "id", F.lit("z").alias("cat"), F.lit(9.0).alias("val")
        ),
        mapped,
        mode="overwrite",
    )  # v2: deletes everything + one insert
    feed = read_delta_changes(spark, mapped, 1).collect()
    kinds = sorted((r["_commit_version"], r["_change_type"], r.id) for r in feed)
    assert (1, "insert", 100) in kinds and (1, "insert", 101) in kinds
    assert (2, "insert", 300) in kinds
    assert (2, "delete", 100) in kinds and (2, "delete", 5) in kinds
    assert len([k for k in kinds if k[0] == 2 and k[1] == "delete"]) == 22


def test_optimize_on_mapped_table(spark, mapped):
    write_delta(
        spark.range(100, 105).select(
            "id", (F.col("id") % 2).cast("string").alias("cat"),
            F.lit(0.5).alias("val"),
        ),
        mapped,
    )
    before = {(r.id, r.cat, r.val) for r in read_delta(spark, mapped).collect()}
    v = optimize_delta(spark, mapped)
    assert v is not None
    snap = DeltaSnapshot(mapped)
    assert len(snap.live_files()) == 1
    phys = set(snap.physical_names().values())
    for f in snap.live_files():
        assert set(_footer_names(mapped, f["path"])) == phys
    after = {(r.id, r.cat, r.val) for r in read_delta(spark, mapped).collect()}
    assert after == before


def test_update_delta_refuses_mapped(spark, mapped):
    with pytest.raises(NotImplementedError, match="column mapping"):
        update_delta(spark, mapped, "id = 1", {"val": "0.0"})


def test_dv_delete_on_mapped_table(spark, mapped):
    """DV deletes work on mapped tables (r13 follow-up): positions are
    name-agnostic; the match scan translates logical→physical."""
    from deltacat_spark.sources.deltalake import delete_rows_with_dv

    v = delete_rows_with_dv(spark, mapped, "id % 5 = 2 OR cat = '1'")
    assert v == 1
    got = sorted(r.id for r in read_delta(spark, mapped).collect())
    assert got == [
        i for i in range(20) if i % 5 != 2 and i % 2 != 1
    ]
    snap = DeltaSnapshot(mapped)
    assert any(f.get("deletionVector") for f in snap.live_files())
    assert "columnMapping" in set(
        snap.protocol.get("readerFeatures") or []
    ) or snap.protocol["minReaderVersion"] >= 2
