"""Maintenance-layer tests: copy-by-reference CoW planning, append-
trigger auto-compaction, range repartition (SURVEY §2.9; reference
copy-by-reference `merge.py:408-502`, triggers
`catalog/main/impl.py:1012-1091`, repartition `repartition.py:42-244`)."""

from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
)


def ids(spark, lo, hi, tag="a"):
    return spark.createDataFrame(
        [(i, f"{tag}{i}") for i in range(lo, hi)], "id long, v string"
    )


def test_copy_by_reference_merge(spark, catalog):
    """A merge touching only high keys must not rewrite low-key files."""
    catalog.create_table("t", schema=SCHEMA)
    # three disjoint key-range files (separate commits → separate files)
    for lo in (0, 1000, 2000):
        catalog.write_to_table(
            ids(spark, lo, lo + 100).coalesce(1), "t", mode="merge"
        )
    before = {f.path: f.version for f in catalog.snapshot("t").files}
    # update keys 2000-2049 only
    catalog.write_to_table(ids(spark, 2000, 2050, "B").coalesce(1), "t", mode="merge")
    after = catalog.snapshot("t")
    kept = [f for f in after.files if f.path in before]
    # the 0- and 1000-range files survived by reference
    assert len(kept) >= 2
    # correctness: all 300 keys present, updated slice reflects new values
    m = {r.id: r.v for r in catalog.read_table("t").collect()}
    assert len(m) == 300
    assert m[2000] == "B2000" and m[0] == "a0" and m[1099] == "a1099"


def test_copy_by_reference_delete(spark, catalog):
    catalog.create_table("t", schema=SCHEMA)
    for lo in (0, 1000):
        catalog.write_to_table(ids(spark, lo, lo + 100).coalesce(1), "t", mode="merge")
    before = {f.path for f in catalog.snapshot("t").files}
    catalog.write_to_table(
        spark.createDataFrame([(1005,)], "id long"), "t", mode="delete"
    )
    after = catalog.snapshot("t")
    assert any(f.path in before for f in after.files)  # low file untouched
    assert catalog.read_table("t").count() == 199


def test_append_trigger_autocompaction(spark, catalog):
    catalog.create_table(
        "t",
        schema=Schema([Field("id", T.LongType()), Field("v", T.StringType())]),
        properties={"compaction.trigger.deltas": 3},
    )
    for i in range(3):
        catalog.write_to_table(ids(spark, i * 10, i * 10 + 5), "t", mode="append")
    snap = catalog.snapshot("t")
    # third append crossed the threshold → OPTIMIZE commit follows
    assert snap.commits[-1].operation == "OPTIMIZE"
    assert catalog.read_table("t").count() == 15


def test_repartition_by_range(spark, catalog):
    catalog.create_table(
        "t", schema=Schema([Field("id", T.LongType()), Field("v", T.StringType())])
    )
    catalog.write_to_table(ids(spark, 0, 1000), "t", mode="append")
    catalog.repartition_table_by_range("t", column="id", num_partitions=4)
    snap = catalog.snapshot("t")
    assert snap.commits[-1].operation == "OPTIMIZE"
    # files now have disjoint id ranges
    ranges = sorted(
        (f.stats["id"]["min"], f.stats["id"]["max"])
        for f in snap.files
        if f.stats and "id" in f.stats
    )
    assert len(ranges) >= 2
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
    assert catalog.read_table("t").count() == 1000
