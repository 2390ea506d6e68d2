"""Round-3 ADVICE regression tests.

1. `read_changes` applies the same pending-txn visibility rule as
   snapshot reads (CDC and snapshots must never disagree).
2. `TxnMarkers.status` checks pending before committed — a reader
   racing the finalize() rename can no longer classify a committed
   transaction as aborted.
3. Stale-transaction janitor: vacuum aborts pending markers older than
   `txn_timeout_seconds` and reclaims the orphaned files; live
   in-flight transactions inside the timeout are untouched.
4. ArrowFS `spark_path` is wired through the data plane: a catalog on a
   SubTreeFileSystem (whose raw paths Spark could NOT resolve) round-
   trips reads and writes via the `spark_prefix` URI mapping.
"""

import os

import pytest

from deltacat_spark.catalog.catalog import Catalog
from deltacat_spark.storage.commit import TxnMarkers
from deltacat_spark.storage.fs import ArrowFS, LocalFS


# ---------------------------------------------------------------------------
# 1. CDC ↔ snapshot visibility agreement
# ---------------------------------------------------------------------------
def _txn_append(catalog, spark, txn_id, table, rows):
    catalog._txn_markers.begin(txn_id)
    catalog._txn_ctx = txn_id
    try:
        catalog.write_to_table(
            spark.createDataFrame(rows, "id long"), table, mode="append"
        )
    finally:
        catalog._txn_ctx = None


def test_read_changes_hides_aborted_txn_commits(spark, catalog):
    catalog.write_to_table(spark.createDataFrame([(1,)], "id long"), "t", mode="auto")
    _txn_append(catalog, spark, "aa" * 16, "t", [(2,)])
    catalog._txn_markers.abort("aa" * 16)
    # Snapshot read hides the aborted commit — CDC must agree.
    assert [r.id for r in catalog.read_table("t").collect()] == [1]
    ch = catalog.read_changes("t", from_version=0).collect()
    assert sorted(r.id for r in ch) == [1]


def test_read_changes_hides_pending_then_shows_after_finalize(spark, catalog):
    catalog.write_to_table(spark.createDataFrame([(1,)], "id long"), "t", mode="auto")
    _txn_append(catalog, spark, "bb" * 16, "t", [(2,)])
    # In-flight (pending): invisible to CDC, same as snapshots.
    ch = catalog.read_changes("t", from_version=0).collect()
    assert sorted(r.id for r in ch) == [1]
    catalog._txn_markers.finalize("bb" * 16)
    ch = catalog.read_changes("t", from_version=0).collect()
    assert sorted(r.id for r in ch) == [1, 2]


# ---------------------------------------------------------------------------
# 2. status() ordering vs the finalize() rename race
# ---------------------------------------------------------------------------
class _RenameMidStatusFS(LocalFS):
    """Performs a queued rename immediately AFTER the first exists()
    check evaluates — the exact window of the finalize race."""

    def __init__(self):
        self.trigger = None

    def exists(self, path: str) -> bool:
        r = super().exists(path)
        if self.trigger is not None:
            t, self.trigger = self.trigger, None
            t()
        return r


def test_status_never_reports_committed_txn_as_aborted(tmp_path):
    fs = _RenameMidStatusFS()
    m = TxnMarkers(str(tmp_path), fs=fs)
    m.begin("race")
    pending = m._p("race", "pending")
    committed = m._p("race", "committed")
    # finalize() lands between the reader's first and second exists().
    fs.trigger = lambda: os.replace(pending, committed)
    st = m.status("race")
    # Old committed-first order returned "aborted" here (lost-commit
    # window); pending-first resolves conservatively.
    assert st in ("pending", "committed")
    assert m.status("race") == "committed"


# ---------------------------------------------------------------------------
# 3. stale-transaction janitor in vacuum
# ---------------------------------------------------------------------------
def test_vacuum_aborts_stale_txn_and_reclaims_files(spark, catalog):
    catalog.write_to_table(spark.createDataFrame([(1,)], "id long"), "t", mode="auto")
    _txn_append(catalog, spark, "cc" * 16, "t", [(2,)])
    # Crash: marker left pending. Snapshots stay provisional.
    assert catalog.snapshot("t").has_unresolved_txn
    # Age the marker past the txn timeout.
    marker = catalog._txn_markers._p("cc" * 16, "pending")
    os.utime(marker, (0, 0))
    removed = catalog.vacuum("t", min_age_seconds=0, txn_timeout_seconds=60)
    assert catalog._txn_markers.status("cc" * 16) == "aborted"
    assert removed > 0  # the orphaned append's data files are reclaimed
    assert [r.id for r in catalog.read_table("t").collect()] == [1]
    # Snapshot is no longer provisional — lazy checkpointing works again.
    assert not catalog.snapshot("t").has_unresolved_txn


def test_vacuum_spares_live_txn_within_timeout(spark, catalog):
    catalog.write_to_table(spark.createDataFrame([(1,)], "id long"), "t", mode="auto")
    _txn_append(catalog, spark, "dd" * 16, "t", [(2,)])
    catalog.vacuum("t", min_age_seconds=0)  # default 24h txn timeout
    assert catalog._txn_markers.status("dd" * 16) == "pending"
    catalog._txn_markers.finalize("dd" * 16)
    assert sorted(r.id for r in catalog.read_table("t").collect()) == [1, 2]


# ---------------------------------------------------------------------------
# 4. ArrowFS spark_path wiring (SubTreeFileSystem round-trip)
# ---------------------------------------------------------------------------
def test_arrowfs_subtree_spark_prefix_roundtrip(spark, tmp_path):
    """SubTreeFileSystem paths are base-relative ('cat/ns/t/...') —
    Spark cannot resolve them without the spark_prefix mapping, so this
    passes only if every data-plane read AND write goes through
    fs.spark_path (and all control-plane CRUD through the seam)."""
    from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

    base = str(tmp_path)
    afs = ArrowFS(
        SubTreeFileSystem(base, LocalFileSystem()),
        spark_prefix=f"file://{base}/",
    )
    cat = Catalog(spark, "cat", fs=afs)
    cat.create_namespace("nsx")
    assert cat.namespace_exists("nsx")
    assert "nsx" in cat.list_namespaces()
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    cat.write_to_table(df, "t", mode="auto")
    cat.write_to_table(
        spark.createDataFrame([(3, "c")], "id long, v string"), "t", mode="append"
    )
    out = cat.read_table("t").orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "a"), (2, "b"), (3, "c")]
    # CDC read path also resolves through spark_path.
    ch = cat.read_changes("t", from_version=cat.snapshot("t").version - 1).collect()
    assert sorted(r.id for r in ch) == [3]
    # Table CRUD through the seam.
    assert cat.list_tables() == ["t"]
    cat.rename_table("t", "t2")
    assert cat.list_tables() == ["t2"]
    assert [r.id for r in cat.read_table("t2").orderBy("id").collect()] == [1, 2, 3]
    cat.drop_table("t2")
    assert cat.list_tables() == []
