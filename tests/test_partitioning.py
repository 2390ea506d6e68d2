"""F5 `sales_partitioned` golden tests: partition transforms, per-file
partition values, partition_filter pruning, sort scheme, stats-based
file skipping (FIXTURES.md F5; reference `storage/model/transform.py`)."""

import datetime

from pyspark.sql import types as T

from deltacat_spark.plans.expr import col
from deltacat_spark.plans.transforms import PartitionKey, SortKey
from deltacat_spark.schema import Field, Schema

SALES = Schema(
    [
        Field("pk", T.StringType(), merge_key=True),
        Field("region", T.StringType()),
        Field("sale_ts", T.TimestampNTZType()),
        Field("bucket_col", T.LongType()),
        Field("amount", T.DoubleType()),
        Field("updated_at", T.TimestampNTZType()),
    ]
)


def sales(spark, n=60):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            f"pk{i}",
            ["NA", "EU", "APAC"][i % 3],
            base + datetime.timedelta(days=i % 10),
            i,
            float(i),
            base + datetime.timedelta(hours=i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "pk string, region string, sale_ts timestamp_ntz, bucket_col long,"
        " amount double, updated_at timestamp_ntz",
    )


def make_table(catalog):
    catalog.create_table(
        "sales",
        schema=SALES,
        partition_scheme=[
            PartitionKey("region"),
            PartitionKey("sale_ts", "day"),
            PartitionKey("bucket_col", "bucket", num_buckets=4),
        ],
        sort_scheme=[SortKey("updated_at", "desc", "last")],
    )


def test_partition_values_recorded_and_pruned(spark, catalog):
    make_table(catalog)
    catalog.write_to_table(sales(spark), "sales", mode="merge")
    snap = catalog.snapshot("sales")
    assert all(f.partition_values for f in snap.files)
    sample = snap.files[0].partition_values
    assert {"region", "sale_ts_day", "bucket_col_bucket"} <= set(sample)
    # partition_filter prunes the file list driver-side
    eu_files = snap.prune(partition_filter={"region": "EU"})
    assert 0 < len(eu_files) < len(snap.files)
    out = catalog.read_table("sales", partition_filter={"region": "EU"})
    assert out.count() == 20
    assert set(r.region for r in out.collect()) == {"EU"}


def test_identity_columns_survive_roundtrip(spark, catalog):
    make_table(catalog)
    catalog.write_to_table(sales(spark, 30), "sales", mode="merge")
    out = catalog.read_table("sales")
    assert sorted(out.columns) == sorted(SALES.names)
    assert out.count() == 30


def test_sort_scheme_orders_within_files(spark, catalog):
    make_table(catalog)
    catalog.write_to_table(sales(spark, 30), "sales", mode="merge")
    snap = catalog.snapshot("sales")
    import pyarrow.parquet as pq

    f = max(snap.files, key=lambda f: f.records or 0)
    t = pq.read_table(f.abs_path(snap.table_root), columns=["updated_at"])
    vals = t.column(0).to_pylist()
    assert vals == sorted(vals, reverse=True)


def test_stats_file_skipping(spark, catalog):
    """Min/max stats in the log prune files for range predicates
    (Delta-style data skipping — SURVEY §4)."""
    from deltacat_spark.schema import Schema as S, Field as Fld

    catalog.create_table(
        "m", schema=S([Fld("x", T.LongType()), Fld("y", T.DoubleType())])
    )
    for lo in (0, 100, 200):
        df = (
            spark.range(lo, lo + 100)
            .selectExpr("id as x", "cast(id as double) as y")
            .coalesce(1)
        )
        catalog.write_to_table(df, "m", mode="append")
    snap = catalog.snapshot("m")
    assert len(snap.files) == 3
    pruned = snap.prune(predicates=[("x", ">=", 250)])
    assert len(pruned) == 1
    expr = col("x").ge(250)
    out = catalog.read_table("m", predicate=expr)
    assert out.count() == 50


def test_partition_salt_spreads_writers(spark, catalog):
    """write.partition_salt=N gives a low-cardinality partition scheme N
    write tasks (files) instead of one — the 1000-executor fix for a
    3-value partition column."""
    from deltacat_spark.schema import Schema as S, Field as Fld

    schema = S([Fld("region", T.StringType()), Fld("x", T.LongType())])
    for salt, name in ((None, "plain"), (4, "salted")):
        props = {"write.partition_salt": salt} if salt else {}
        catalog.create_table(
            name,
            schema=schema,
            partition_scheme=[PartitionKey("region")],
            properties=props,
        )
        df = spark.range(2000).selectExpr("'EU' as region", "id as x")
        catalog.write_to_table(df, name, mode="append")
    plain = len(catalog.snapshot("plain").files)
    salted = len(catalog.snapshot("salted").files)
    assert salted > plain
    assert catalog.read_table("salted").count() == 2000
    # partition pruning still works on salted layout
    assert (
        len(catalog.snapshot("salted").prune(partition_filter={"region": "EU"}))
        == salted
    )
