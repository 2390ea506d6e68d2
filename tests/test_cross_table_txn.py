"""Cross-table atomic transactions: the catalog-level two-phase marker
protocol (reference `storage/model/transaction.py:768-932,1432-1639` —
"data lake level transactions" spanning many tables in one seal).

Key property: a failure or crash at ANY point during a multi-table seal
leaves NO table changed; the one atomic marker rename is the commit
point for every participating table at once.
"""

import pytest

from deltacat_spark.storage.commit import TxnMarkers


def test_multi_table_seal_is_atomic(spark, catalog):
    a0 = spark.createDataFrame([(1, "a")], "id long, v string")
    b0 = spark.createDataFrame([(1, "b")], "id long, v string")
    catalog.write_to_table(a0, "ta", mode="auto")
    catalog.write_to_table(b0, "tb", mode="auto")
    with catalog.transaction() as txn:
        txn.write(spark.createDataFrame([(2, "a2")], "id long, v string"), "ta")
        txn.write(spark.createDataFrame([(2, "b2")], "id long, v string"), "tb")
    assert catalog.read_table("ta").count() == 2
    assert catalog.read_table("tb").count() == 2


def test_failure_mid_seal_leaves_neither_table_changed(spark, catalog):
    """Crash injected AFTER table A's commit landed but before B's: A's
    pending commit must stay invisible (txn aborted)."""
    catalog.write_to_table(
        spark.createDataFrame([(1, "a")], "id long, v string"), "ta", mode="auto"
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, "b")], "id long, v string"), "tb", mode="auto"
    )
    txn = catalog.transaction()
    txn.write(spark.createDataFrame([(2, "a2")], "id long, v string"), "ta")
    # Second op fails at seal time: a DELETE whose payload shares no
    # columns with tb's schema raises SchemaError.
    txn.write(spark.createDataFrame([(2,)], "other long"), "tb", mode="delete")
    with pytest.raises(Exception):
        txn.seal()
    # NEITHER table changed — ta's commit landed physically but is
    # invisible because the txn aborted.
    assert [r.id for r in catalog.read_table("ta").collect()] == [1]
    assert [r.id for r in catalog.read_table("tb").collect()] == [1]
    # The aborted commit occupies a log version but stays hidden; new
    # writes proceed normally on top.
    catalog.write_to_table(
        spark.createDataFrame([(3, "a3")], "id long, v string"), "ta", mode="auto"
    )
    assert sorted(r.id for r in catalog.read_table("ta").collect()) == [1, 3]


def test_unfinalized_txn_invisible_until_marker_flips(spark, catalog):
    """Simulated crash BEFORE finalize: commits stay invisible; flipping
    the marker afterwards makes them all visible at once (recovery)."""
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "ta", mode="auto"
    )
    catalog.write_to_table(
        spark.createDataFrame([(10,)], "id long"), "tb", mode="auto"
    )
    txn_id = "deadbeef" * 4
    catalog._txn_markers.begin(txn_id)
    catalog._txn_ctx = txn_id
    try:
        catalog.write_to_table(
            spark.createDataFrame([(2,)], "id long"), "ta", mode="append"
        )
        catalog.write_to_table(
            spark.createDataFrame([(20,)], "id long"), "tb", mode="append"
        )
    finally:
        catalog._txn_ctx = None
    # Crash here (no finalize): both appends invisible.
    assert [r.id for r in catalog.read_table("ta").collect()] == [1]
    assert [r.id for r in catalog.read_table("tb").collect()] == [10]
    # Recovery decides to commit: one marker flip exposes both.
    catalog._txn_markers.finalize(txn_id)
    assert sorted(r.id for r in catalog.read_table("ta").collect()) == [1, 2]
    assert sorted(r.id for r in catalog.read_table("tb").collect()) == [10, 20]


def test_txn_read_your_own_writes_across_tables(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "ta", mode="auto"
    )
    txn_id = "feedface" * 4
    catalog._txn_markers.begin(txn_id)
    catalog._txn_ctx = txn_id
    try:
        catalog.write_to_table(
            spark.createDataFrame([(2,)], "id long"), "ta", mode="append"
        )
        # Inside the txn: own pending commit visible.
        assert sorted(r.id for r in catalog.read_table("ta").collect()) == [1, 2]
    finally:
        catalog._txn_ctx = None
    # Outside (pre-finalize): invisible.
    assert [r.id for r in catalog.read_table("ta").collect()] == [1]
    catalog._txn_markers.abort(txn_id)
    assert [r.id for r in catalog.read_table("ta").collect()] == [1]


def test_vacuum_spares_pending_txn_files(spark, catalog):
    """An in-flight txn's data files are referenced by its (invisible)
    commit — vacuum must not delete them even with no grace period."""
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "ta", mode="auto"
    )
    txn_id = "0badc0de" * 4
    catalog._txn_markers.begin(txn_id)
    catalog._txn_ctx = txn_id
    try:
        catalog.write_to_table(
            spark.createDataFrame([(2,)], "id long"), "ta", mode="append"
        )
    finally:
        catalog._txn_ctx = None
    catalog.vacuum("ta", min_age_seconds=0)
    catalog._txn_markers.finalize(txn_id)
    assert sorted(r.id for r in catalog.read_table("ta").collect()) == [1, 2]


def test_single_table_txn_unchanged(spark, catalog):
    """Single-table transactions keep the coalesced-commit fast path —
    no marker files are created."""
    import os

    with catalog.transaction() as txn:
        txn.write(spark.createDataFrame([(1,)], "id long"), "t")
        txn.write(spark.createDataFrame([(2,)], "id long"), "t")
    assert sorted(r.id for r in catalog.read_table("t").collect()) == [1, 2]
    assert not os.path.isdir(os.path.join(catalog.root, TxnMarkers.DIR))
