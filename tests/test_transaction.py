"""Interactive transaction tests (reference ambient transactions,
`catalog/main/impl.py:264-266`; read-your-writes + atomic seal)."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.schema import Field, Schema


def test_read_your_writes_and_atomic_seal(spark, catalog):
    catalog.create_table(
        "t", schema=Schema([Field("id", T.LongType()), Field("v", T.StringType())])
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, "a")], "id long, v string"), "t", mode="append"
    )
    v_before = catalog.snapshot("t").version
    with catalog.transaction() as txn:
        txn.write(
            spark.createDataFrame([(2, "b")], "id long, v string"), "t", mode="append"
        )
        txn.write(
            spark.createDataFrame([(3, "c")], "id long, v string"), "t", mode="append"
        )
        # read-your-writes: txn sees 3 rows, catalog still sees 1
        assert txn.read("t").count() == 3
        assert catalog.read_table("t").count() == 1
    # sealed: both appends landed as ONE commit
    snap = catalog.snapshot("t")
    assert catalog.read_table("t").count() == 3
    assert snap.version == v_before + 1


def test_transaction_merge_overlay(spark, catalog):
    schema = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
    )
    catalog.create_table("m", schema=schema)
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        "m",
        mode="merge",
    )
    with catalog.transaction() as txn:
        txn.write(
            spark.createDataFrame([(2, "B2")], "id long, v string"), "m", mode="merge"
        )
        txn.write(spark.createDataFrame([(1,)], "id long"), "m", mode="delete")
        overlay = {r.id: r.v for r in txn.read("m").collect()}
        assert overlay == {2: "B2"}
    final = {r.id: r.v for r in catalog.read_table("m").collect()}
    assert final == {2: "B2"}


def test_transaction_discard_on_error(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    with pytest.raises(RuntimeError):
        with catalog.transaction() as txn:
            txn.write(spark.createDataFrame([(2,)], "id long"), "t", mode="append")
            raise RuntimeError("abort")
    # nothing committed
    assert catalog.read_table("t").count() == 1


def test_transaction_snapshot_pinning(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    txn = catalog.transaction()
    assert txn.read("t").count() == 1  # pins version now
    catalog.write_to_table(
        spark.createDataFrame([(2,)], "id long"), "t", mode="append"
    )
    # pinned read unaffected by the concurrent commit
    assert txn.read("t").count() == 1
    assert catalog.read_table("t").count() == 2
