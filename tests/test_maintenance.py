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


def test_incremental_optimize_bin_packs_small_files_only(spark, catalog):
    """Incremental OPTIMIZE: files at target size stay live BY REFERENCE
    (same physical path); only small files are read and rewritten —
    compaction cost scales with small-file bytes, not table size."""
    big = spark.createDataFrame([(i, f"v{i}") for i in range(1000)], "id long, v string")
    catalog.write_to_table(big.coalesce(1), "t", mode="auto")
    for k in range(3):
        catalog.write_to_table(
            spark.createDataFrame([(1000 + k, "s")], "id long, v string"),
            "t",
            mode="append",
        )
    before = catalog.snapshot("t")
    big_paths = {f.path for f in before.files if (f.records or 0) >= 500}
    assert len(big_paths) == 1 and len(before.files) >= 4
    catalog.optimize_table("t", small_file_records=500)
    after = catalog.snapshot("t")
    # the big file survives untouched, small ones packed into one
    assert big_paths <= {f.path for f in after.files}
    assert len(after.files) == 2
    assert catalog.read_table("t").count() == 1003
    last = after.commits[-1] if after.commits else None
    ops = {c.operation: c for c in after.commits}
    m = ops["OPTIMIZE"].metrics
    assert m["mode"] == "incremental" and m["kept_by_reference"] == 1
    # idempotent: a second pass finds < 2 small files and no-ops
    v = after.version
    catalog.optimize_table("t", small_file_records=500)
    assert catalog.snapshot("t").version == v


def test_incremental_optimize_falls_back_full_on_mor_deltas(spark, catalog):
    from deltacat_spark.schema import Field, Schema
    from pyspark.sql import types as T

    schema = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
    )
    catalog.create_table("m", schema=schema, properties={"read_optimization": "none"})
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), "m", mode="merge"
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, "a2")], "id long, v string"), "m", mode="merge"
    )
    catalog.optimize_table("m", small_file_records=10_000)
    snap = catalog.snapshot("m")
    m = [c for c in snap.commits if c.operation == "OPTIMIZE"][-1].metrics
    assert m["mode"] == "full"  # unresolved deltas force the full fold
    got = {(r.id, r.v) for r in catalog.read_table("m").collect()}
    assert got == {(1, "a2"), (2, "b")}
