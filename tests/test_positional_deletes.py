"""Positional-delete tests: predicate deletes without merge keys or
rewrites, resolved at read and folded by OPTIMIZE (reference manifest
POSITIONAL_DELETE entry type `manifest.py:36-70`; converter §2.3)."""

from pyspark.sql import types as T

from deltacat_spark.plans.expr import col
from deltacat_spark.schema import Field, Schema


def test_delete_where_without_merge_keys(spark, catalog):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    )
    catalog.write_to_table(df, "t", mode="auto")
    n = catalog.delete_where("t", col("id").ge(15))
    assert n == 5
    out = catalog.read_table("t")
    assert sorted(r.id for r in out.collect()) == list(range(15))
    # no data rewrite happened: original data files still live
    snap = catalog.snapshot("t")
    assert any(f.delta_type == "POSITIONAL_DELETE" for f in snap.files)
    # time travel before the delete sees all rows
    assert catalog.read_table("t", version_as_of=2).count() == 20


def test_delete_where_idempotent_and_stacking(spark, catalog):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    catalog.write_to_table(df, "t", mode="auto")
    assert catalog.delete_where("t", col("id").ge(8)) == 2
    # same predicate again: rows already deleted → no-op commit
    assert catalog.delete_where("t", col("id").ge(8)) == 0
    # stacking a second predicate
    assert catalog.delete_where("t", col("id").lt(2)) == 2
    assert sorted(r.id for r in catalog.read_table("t").collect()) == [
        2, 3, 4, 5, 6, 7,
    ]


def test_optimize_folds_positional_deletes(spark, catalog):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    catalog.write_to_table(df, "t", mode="auto")
    catalog.delete_where("t", col("id").eq(3))
    catalog.optimize_table("t")
    snap = catalog.snapshot("t")
    assert all(f.delta_type is None for f in snap.files)
    assert sorted(r.id for r in catalog.read_table("t").collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9,
    ]
    # appends continue to work after compaction
    catalog.write_to_table(
        spark.createDataFrame([(100,)], "id long"), "t", mode="append"
    )
    assert catalog.read_table("t").count() == 10


def test_positional_deletes_compose_with_merge_keys(spark, catalog):
    from deltacat_spark.catalog import Catalog

    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
        properties={"read_optimization": "none"},
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(6)], "id long, v long"),
        "m",
        mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(2, 200)], "id long, v long"), "m", mode="merge"
    )
    # positional delete on the physical rows, then the LWW fold
    catalog.delete_where("m", col("v").ge(4))
    m = {r.id: r.v for r in catalog.read_table("m").collect()}
    # v=4,5 physical rows deleted; id=2 upsert (v=200) also ≥4 → deleted,
    # which EXPOSES the older physical row (2, 2) — positional semantics
    assert m == {0: 0, 1: 1, 2: 2, 3: 3}
