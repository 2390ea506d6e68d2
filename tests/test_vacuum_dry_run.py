"""Vacuum dry-run + metrics (reference janitor reports what it cleaned,
`compute/janitor.py:85-228`): `vacuum(dry_run=True)` deletes nothing and
lists exactly the files/bytes the real run then removes; the real run
returns the same report (still `int`-compatible as the removed count)."""

import os

from deltacat_spark.catalog import VacuumReport


def _mk_orphans(catalog, n=3):
    troot = catalog._table_root("t", "default")
    odir = os.path.join(troot, "data", "orphans")
    os.makedirs(odir, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(odir, f"stray{i}.parquet")
        with open(p, "wb") as fh:
            fh.write(b"x" * (10 + i))
        paths.append(p)
    return paths


def test_dry_run_deletes_nothing_and_predicts_real_run(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    orphans = _mk_orphans(catalog)

    rep = catalog.vacuum("t", min_age_seconds=0, dry_run=True)
    assert isinstance(rep, VacuumReport) and rep.dry_run
    assert rep == len(rep.files) >= 3  # int contract holds
    assert rep.bytes >= sum(10 + i for i in range(3))
    for p in orphans:
        assert os.path.exists(p), "dry run must not delete"

    real = catalog.vacuum("t", min_age_seconds=0)
    assert not real.dry_run
    assert sorted(real.files) == sorted(rep.files), (
        "real run removes exactly what dry run listed"
    )
    assert real.bytes == rep.bytes
    for p in orphans:
        assert not os.path.exists(p)
    # idempotent: nothing left
    assert catalog.vacuum("t", min_age_seconds=0) == 0


def test_dry_run_predicts_stale_txn_reclaim(spark, catalog):
    """A stale pending txn's staged files are reclaimable; dry run must
    list them (treating the would-abort txn as aborted) WITHOUT aborting
    the marker."""
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    # Fake a crashed writer: begin a txn, stamp a commit pending, never seal.
    catalog._txn_markers.begin("ghost")
    catalog._txn_ctx = "ghost"
    try:
        catalog.write_to_table(
            spark.createDataFrame([(2,)], "id long"), "t", mode="append"
        )
    finally:
        catalog._txn_ctx = None

    rep = catalog.vacuum(
        "t", min_age_seconds=0, txn_timeout_seconds=0, dry_run=True
    )
    assert "ghost" in rep.aborted_txns
    assert rep >= 1  # the pending commit's staged file is doomed
    assert catalog._txn_markers.status("ghost") == "pending", (
        "dry run must not abort the marker"
    )

    real = catalog.vacuum("t", min_age_seconds=0, txn_timeout_seconds=0)
    assert catalog._txn_markers.status("ghost") == "aborted"
    assert sorted(real.files) == sorted(rep.files)
