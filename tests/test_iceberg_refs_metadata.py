"""Iceberg refs (spec branches/tags) + metadata/inspection tables
(r14): time travel by ref name, ref management, expiry protection for
ref-targeted snapshots, and the `db.table.snapshots`-style inspection
surface as control-plane-sized DataFrames."""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    IcebergTable,
    expire_snapshots,
    iceberg_metadata_table,
    read_iceberg,
    remove_iceberg_ref,
    set_iceberg_ref,
    write_iceberg,
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(spark.range(10).select("id"), root)
    write_iceberg(spark.range(10, 20).select("id"), root, mode="append")
    write_iceberg(spark.range(20, 30).select("id"), root, mode="append")
    return root


def test_ref_time_travel(spark, table):
    meta = IcebergTable(table).metadata()
    first = min(meta["snapshots"], key=lambda s: s["sequence-number"])
    set_iceberg_ref(table, "v1.0", snapshot_id=first["snapshot-id"])
    set_iceberg_ref(table, "dev", kind="branch")  # current snapshot
    got = sorted(r.id for r in read_iceberg(spark, table, ref="v1.0").collect())
    assert got == list(range(10))
    got = sorted(r.id for r in read_iceberg(spark, table, ref="dev").collect())
    assert got == list(range(30))
    with pytest.raises(ValueError, match="unknown iceberg ref"):
        read_iceberg(spark, table, ref="nope")
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, table, ref="dev", snapshot_id=1)


def test_ref_management(spark, table):
    with pytest.raises(ValueError, match="snapshot"):
        set_iceberg_ref(table, "bad", snapshot_id=123456)
    set_iceberg_ref(table, "v1.0")
    remove_iceberg_ref(table, "v1.0")
    assert "v1.0" not in (IcebergTable(table).metadata().get("refs") or {})
    with pytest.raises(ValueError, match="unknown"):
        remove_iceberg_ref(table, "v1.0")
    with pytest.raises(ValueError, match="main"):
        remove_iceberg_ref(table, "main")


def test_expire_retains_ref_targets(spark, table):
    meta = IcebergTable(table).metadata()
    first = min(meta["snapshots"], key=lambda s: s["sequence-number"])
    set_iceberg_ref(table, "pinned", snapshot_id=first["snapshot-id"])
    expire_snapshots(table, keep_last=1)
    # the tagged snapshot survived; reading it still works
    got = sorted(
        r.id for r in read_iceberg(spark, table, ref="pinned").collect()
    )
    assert got == list(range(10))
    # without the ref it would have expired
    remove_iceberg_ref(table, "pinned")
    expire_snapshots(table, keep_last=1)
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(
            spark, table, snapshot_id=first["snapshot-id"]
        ).collect()


def test_metadata_tables(spark, table):
    set_iceberg_ref(table, "v1.0")
    snaps = iceberg_metadata_table(spark, table, "snapshots").collect()
    assert len(snaps) == 3
    assert [r.operation for r in snaps].count("append") >= 2
    hist = iceberg_metadata_table(spark, table, "history").collect()
    assert len(hist) == 3 and sum(r.is_current for r in hist) == 1
    refs = iceberg_metadata_table(spark, table, "refs").collect()
    assert [(r.name, r.type) for r in refs] == [("v1.0", "tag")]
    mfs = iceberg_metadata_table(spark, table, "manifests").collect()
    assert len(mfs) == 3 and all(m.content == 0 for m in mfs)
    files = iceberg_metadata_table(spark, table, "files").collect()
    assert sum(f.record_count for f in files) == 30
    dels = iceberg_metadata_table(spark, table, "delete_files").collect()
    assert dels == []
    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_table(spark, table, "wat")
