"""Delta change-feed reconstruction (`read_delta_changes`): inserts
from dataChange adds, deletes from dataChange removes re-read as of the
pre-commit snapshot, OPTIMIZE reorganizations silent, vacuum holes
loud."""

import pytest

from deltacat_spark.sources.deltalake import (
    optimize_delta,
    read_delta_changes,
    vacuum_delta,
    write_delta,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_changes_inserts_deletes_and_optimize_silence(spark, tmp_path):
    root = str(tmp_path / "d")
    write_delta(
        _batch(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        root,
        partition_by=["cat"],
    )  # v0
    write_delta(_batch(spark, [(3, "a", 3.0)]), root)  # v1
    v_opt = optimize_delta(spark, root)  # v2: dataChange=false
    assert v_opt == 2
    write_delta(
        _batch(spark, [(9, "a", 9.0)]), root, mode="overwrite"
    )  # v3: removes compacted files + adds

    all_changes = read_delta_changes(spark, root, 0)
    got = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in all_changes.collect()
    )
    assert got == [
        (0, "insert", 1),
        (0, "insert", 2),
        (1, "insert", 3),
        # v2 OPTIMIZE: nothing — a reorganization is not a change
        (3, "delete", 1),
        (3, "delete", 2),
        (3, "delete", 3),
        (3, "insert", 9),
    ]
    # partition column reconstructed on both insert and delete rows
    cats = {(r.id, r.cat) for r in all_changes.collect()}
    assert (1, "a") in cats and (2, "b") in cats

    # version windows are inclusive on both ends
    w = read_delta_changes(spark, root, 1, 1)
    assert [(r._change_type, r.id) for r in w.collect()] == [("insert", 3)]


def test_changes_after_vacuum_raise(spark, tmp_path):
    root = str(tmp_path / "d")
    write_delta(_batch(spark, [(1, "a", 1.0)]), root)  # v0
    write_delta(
        _batch(spark, [(2, "a", 2.0)]), root, mode="overwrite"
    )  # v1: removes v0's file
    write_delta(_batch(spark, [(3, "a", 3.0)]), root)  # v2
    vacuum_delta(root, keep_versions=1)  # v0's (dead) file is gone
    # v0's inserts AND v1's deletes both need the vacuumed file
    with pytest.raises(ValueError, match="vacuum"):
        read_delta_changes(spark, root, 0)
    with pytest.raises(ValueError, match="vacuum"):
        read_delta_changes(spark, root, 1, 1)
    # windows past the hole still read
    ok = read_delta_changes(spark, root, 2, 2)
    assert [(r._change_type, r.id) for r in ok.collect()] == [
        ("insert", 3)
    ]
