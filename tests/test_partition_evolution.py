"""Partition-scheme evolution via alter_table (reference updates the
partition scheme in place, `catalog/main/impl.py:1725-1870`): future
writes use the new layout, old files keep theirs, and pruning is correct
across both generations."""

from pyspark.sql import types as T

from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType()),
        Field("region", T.StringType()),
        Field("cat", T.StringType()),
    ]
)


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, ["NA", "EU"][i % 2], ["x", "y"][(i // 2) % 2]) for i in range(lo, hi)],
        "id long, region string, cat string",
    )


def test_partition_evolution_writes_and_prunes(spark, catalog):
    catalog.create_table(
        "t", schema=SCHEMA, partition_scheme=[PartitionKey("region")]
    )
    catalog.write_to_table(_rows(spark, 0, 20), "t", mode="add")
    # Evolve: partition future writes by `cat` instead.
    catalog.alter_table("t", partition_scheme=[PartitionKey("cat")])
    snap = catalog.snapshot("t")
    assert [d["source"] for d in snap.partition_scheme] == ["cat"]
    catalog.write_to_table(_rows(spark, 20, 40), "t", mode="add")

    snap = catalog.snapshot("t")
    old = [f for f in snap.files if f.version == 2]
    new = [f for f in snap.files if f.version > 3]
    assert old and all("region" in (f.partition_values or {}) for f in old)
    assert new and all("cat" in (f.partition_values or {}) for f in new)

    # Filter on the NEW column: old-generation files (no cat value) are
    # conservatively kept; new-generation files prune exactly.
    kept = snap.prune(partition_filter={"cat": "x"})
    assert set(f.path for f in old) <= set(f.path for f in kept)
    assert all(
        f.partition_values.get("cat") == "x" for f in kept if f.version > 3
    )
    # Row-level results are exact regardless of pruning.
    out = catalog.read_table("t", partition_filter={"cat": "x"})
    got = sorted(r.id for r in out.collect() if r.id >= 20)
    want = sorted(i for i in range(20, 40) if (i // 2) % 2 == 0)
    assert got == want

    # Filter on the OLD column still prunes old-generation files.
    kept_old = snap.prune(partition_filter={"region": "NA"})
    assert all(
        f.partition_values.get("region") == "NA"
        for f in kept_old
        if f.version == 2
    )
    # New files (no region value) are conservatively kept.
    assert set(f.path for f in new) <= set(f.path for f in kept_old)


def test_partition_evolution_to_unpartitioned(spark, catalog):
    catalog.create_table(
        "t", schema=SCHEMA, partition_scheme=[PartitionKey("region")]
    )
    catalog.write_to_table(_rows(spark, 0, 10), "t", mode="add")
    catalog.alter_table("t", partition_scheme=[])
    catalog.write_to_table(_rows(spark, 10, 20), "t", mode="add")
    snap = catalog.snapshot("t")
    assert snap.partition_scheme == []
    assert catalog.read_table("t").count() == 20
