"""`read_transaction` parity (reference `storage/model/transaction.py:293`
`read_transaction`, `TransactionHistoricTimeProvider` at
`transaction.py:727-766`): a sealed transaction's id replays its op set —
each touched table read as-of the txn's last commit to it, immune to
later overwrites."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType(), merge_key=True),
        Field("v", T.IntegerType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v int")


def test_read_transaction_three_ops_under_overwrites(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_table("a", schema=SCHEMA)
    c.create_table("b", schema=SCHEMA)
    c.write_to_table(_df(spark, [(1, 10), (2, 20)]), "a", mode="merge")

    txn = c.transaction()
    txn.write(_df(spark, [(2, 21), (3, 30)]), "a", mode="merge")  # op 1
    txn.write(_df(spark, [(7, 70)]), "b", mode="merge")           # op 2
    txn.write(_df(spark, [(8, 80)]), "b", mode="merge")           # op 3
    txn.seal()
    txn_id = txn.txn_id

    # later overwrites on both tables
    c.write_to_table(_df(spark, [(1, 999), (3, 999)]), "a", mode="merge")
    c.write_to_table(_df(spark, [(7, 999)]), "b", mode="merge")

    states = c.read_transaction(txn_id)
    assert set(states) == {"default.a", "default.b"}
    a = {r.id: r.v for r in states["default.a"].collect()}
    b = {r.id: r.v for r in states["default.b"].collect()}
    assert a == {1: 10, 2: 21, 3: 30}  # as-of seal, pre-overwrite
    assert b == {7: 70, 8: 80}

    ops = c.transaction_commits(txn_id)
    assert sum(len(v) for v in ops.values()) == 3
    assert [cm.operation for cm in ops[("default", "a")]] == ["MERGE"]
    assert len(ops[("default", "b")]) == 2


def test_read_transaction_single_op_txn(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_table("t", schema=SCHEMA)
    with c.transaction() as txn:
        txn.write(_df(spark, [(5, 50)]), "t", mode="merge")
    c.write_to_table(_df(spark, [(5, 51)]), "t", mode="merge")
    states = c.read_transaction(txn.txn_id)
    assert {r.id: r.v for r in states["default.t"].collect()} == {5: 50}


def test_read_transaction_unknown_id_raises(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_table("t", schema=SCHEMA)
    with pytest.raises(KeyError):
        c.read_transaction("deadbeef")
