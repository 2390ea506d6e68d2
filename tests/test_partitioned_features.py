"""Partitioned-table × feature cross-axis: positional deletes,
OPTIMIZE, RESTORE, CDC reads, and shallow CLONE all exercised on a
partitioned layout. The round-5 basename-collision bug lived exactly on
this axis (features individually green, partitioned variants not), so
each feature gets a partitioned golden here."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.plans.expr import col
from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType()),
        Field("cat", T.StringType()),
        Field("v", T.IntegerType()),
    ]
)

ROWS = [(i, "abc"[i % 3], i * 10) for i in range(12)]


@pytest.fixture()
def part_table(spark, catalog):
    catalog.create_table(
        "pt", schema=SCHEMA, partition_scheme=[PartitionKey("cat")]
    )
    catalog.write_to_table(
        spark.createDataFrame(ROWS, "id long, cat string, v int"),
        "pt",
        mode="append",
    )
    return catalog


def _ids(catalog, **kw):
    return sorted(r.id for r in catalog.read_table("pt", **kw).collect())


def test_positional_delete_on_partitioned(spark, part_table):
    c = part_table
    n = c.delete_where("pt", col("v").ge(60))
    assert n == 6
    assert _ids(c) == [0, 1, 2, 3, 4, 5]
    # re-delete is a no-op (already-deleted rows not re-marked)
    assert c.delete_where("pt", col("v").ge(60)) == 0
    # delete hitting one partition only
    assert c.delete_where("pt", col("cat").eq("a")) >= 1
    assert all(i % 3 != 0 for i in _ids(c))


def test_optimize_folds_partitioned_positional_deletes(spark, part_table):
    c = part_table
    c.delete_where("pt", col("v").ge(60))
    before = _ids(c)
    c.optimize_table("pt")
    assert _ids(c) == before
    snap = c.snapshot("pt")
    from deltacat_spark.storage.commit import DeltaType

    assert not any(
        f.delta_type == DeltaType.POSITIONAL_DELETE for f in snap.files
    )
    # partition pruning still effective after the fold
    pruned = snap.prune({"cat": "a"}, None)
    assert pruned and len(pruned) < len(snap.files)


def test_restore_partitioned(spark, part_table):
    c = part_table
    v1 = c.snapshot("pt").version
    c.write_to_table(
        spark.createDataFrame([(99, "a", 990)], "id long, cat string, v int"),
        "pt",
        mode="append",
    )
    assert 99 in _ids(c)
    c.restore_table("pt", version=v1)
    assert _ids(c) == sorted(r[0] for r in ROWS)
    # layout survives the restore: partition values still recorded
    snap = c.snapshot("pt")
    assert any(f.partition_values for f in snap.files)


def test_cdc_read_partitioned(spark, part_table):
    c = part_table
    v1 = c.snapshot("pt").version
    c.write_to_table(
        spark.createDataFrame([(50, "b", 500)], "id long, cat string, v int"),
        "pt",
        mode="append",
    )
    changes = c.read_changes("pt", from_version=v1).collect()
    assert [r.id for r in changes] == [50]
    assert {r._change_type for r in changes} == {"APPEND"}


def test_shallow_clone_partitioned(spark, part_table):
    c = part_table
    c.clone_table("pt", "pt2")
    assert sorted(r.id for r in c.read_table("pt2").collect()) == sorted(
        r[0] for r in ROWS
    )
    # clone carries the partition scheme; a write to it partitions
    c.write_to_table(
        spark.createDataFrame([(77, "c", 770)], "id long, cat string, v int"),
        "pt2",
        mode="append",
    )
    snap = c.snapshot("pt2")
    assert snap.partition_scheme
    own = [f for f in snap.files if not f.path.startswith("/")]
    assert own and all(
        (f.partition_values or {}).get("cat") == "c" for f in own
    )
