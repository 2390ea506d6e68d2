"""OPTIMIZE ZORDER: Morton-curve layout rewrite and its effect on
footer-stats file skipping (`plans/transforms.py:zorder_column`,
`Catalog.optimize_table(zorder_by=...)`). A linear x-sort gives tight
per-file stats on x only; after z-ordering on (x, y) BOTH dimensions
prune (reference delta-stats / rivulet SST min-max planning, SURVEY §4,
re-expressed as a lakehouse OPTIMIZE ZORDER)."""

import pytest
from pyspark.sql import functions as F, types as T

from deltacat_spark.plans.transforms import zorder_column
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType()),
        Field("x", T.LongType()),
        Field("y", T.LongType()),
    ]
)


def grid(spark, side=64):
    # side x side uniform grid; natural order = x-major
    return spark.range(side * side).select(
        F.col("id"),
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


def _files_matching(snap, col, val):
    return snap.prune(predicates=[(col, "=", val)])


def test_zorder_prunes_both_dimensions(spark, catalog):
    catalog.create_table(
        "t", schema=SCHEMA, properties={"max_records_per_file": "256"}
    )
    # Linear layout: sorted by y (the write arrives y-major), so every
    # file spans the full x range — x predicates prune nothing.
    catalog.write_to_table(
        grid(spark).orderBy("y", "x").coalesce(1), "t", mode="append"
    )
    snap = catalog.snapshot("t")
    nfiles = len(snap.files)
    assert nfiles >= 8
    assert len(_files_matching(snap, "x", 5)) == nfiles  # no x pruning
    assert len(_files_matching(snap, "y", 5)) <= max(2, nfiles // 4)

    catalog.optimize_table("t", zorder_by=["x", "y"])
    snap2 = catalog.snapshot("t")
    n2 = len(snap2.files)
    assert n2 >= 8
    # Both dimensions now prune: each file covers a compact z-block.
    assert len(_files_matching(snap2, "x", 5)) <= n2 // 2
    assert len(_files_matching(snap2, "y", 5)) <= n2 // 2
    # Audit trail records the zorder rewrite.
    last = list(catalog._log("t", "default").replay())[-1]
    assert last.operation == "OPTIMIZE"
    assert last.metrics["mode"] == "zorder"
    assert last.metrics["zorder_by"] == ["x", "y"]


def test_zorder_preserves_content(spark, catalog):
    catalog.create_table(
        "t", schema=SCHEMA, properties={"max_records_per_file": "256"}
    )
    catalog.write_to_table(grid(spark, 32).coalesce(1), "t", mode="append")
    before = sorted(
        (r.id, r.x, r.y) for r in catalog.read_table("t").collect()
    )
    catalog.optimize_table("t", zorder_by=["x", "y"])
    after = sorted(
        (r.id, r.x, r.y) for r in catalog.read_table("t").collect()
    )
    assert before == after
    # Time travel still sees the pre-zorder generation.
    v = list(catalog._log("t", "default").replay())[-1].version
    old = catalog.read_table("t", version_as_of=v - 1)
    assert old.count() == 32 * 32


def test_zorder_skew_immune_buckets(spark):
    """Quantile bucketing splits a pathologically skewed column into
    even buckets (linear min/max scaling would put ~all rows in one)."""
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 990, F.col("id") % 10)
        .otherwise(F.col("id") * 1000)
        .alias("x"),
        (F.col("id") % 7).alias("y"),
    )
    out, zname = zorder_column(df, ["x", "y"], bits=3)
    nz = out.select(F.countDistinct(zname).alias("n")).collect()[0].n
    assert nz >= 8  # curve actually spreads despite skew


def test_zorder_rejects_strings(spark, catalog):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        zorder_column(df, ["s"])


def test_zorder_respects_partition_scheme(spark, catalog):
    """Z-order on a partitioned table keeps the partition layout (dirs)
    and clusters within partitions; partition pruning still works."""
    from deltacat_spark.plans.transforms import PartitionKey

    catalog.create_table(
        "pt",
        schema=SCHEMA,
        partition_scheme=[
            PartitionKey(source="x", transform="bucket", num_buckets=2)
        ],
        properties={"max_records_per_file": "256"},
    )
    catalog.write_to_table(grid(spark, 32).coalesce(1), "pt", mode="append")
    catalog.optimize_table("pt", zorder_by=["x", "y"])
    snap = catalog.snapshot("pt")
    # partition values survived the rewrite
    assert all(f.partition_values for f in snap.files)
    before = sorted((r.id, r.x, r.y) for r in catalog.read_table("pt").collect())
    assert len(before) == 32 * 32
