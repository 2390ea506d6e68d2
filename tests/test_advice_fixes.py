"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. (high) CoW MERGE/DELETE must not resurrect positionally-deleted rows
   in files that stay live by reference.
2. (med) Concurrent appends that evolve the schema must not auto-rebase
   (the later schema_json would silently drop the other writer's column).
3. (med) vacuum keeps young unreferenced files (in-flight writer grace).
4. (low) read_changes emits the actual deleted rows for pos-delete
   commits, not all-null placeholder rows.
5. (low) DELETE payload sharing no columns with the schema raises
   instead of planning a delete-everything cross anti-join.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from deltacat_spark.plans.expr import col
from deltacat_spark.schema import Field, Schema, SchemaError
from deltacat_spark.storage.commit import Commit, CommitConflictError, CommitLog


def _mk_merge_table(catalog, name="t"):
    catalog.create_table(
        name,
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
    )


def test_cow_merge_keeps_positional_deletes_in_untouched_files(spark, catalog):
    _mk_merge_table(catalog)
    # Two disjoint key-range files via two merges (copy-by-reference
    # keeps the first file untouched during the second).
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"),
        "t", mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(100, 110)], "id long, v long"),
        "t", mode="merge",
    )
    # Positionally delete a row that lives in the LOW-range file.
    assert catalog.delete_where("t", col("id").eq(5)) == 1
    assert sorted(r.id for r in catalog.read_table("t").collect()) == (
        [0, 1, 2, 3, 4, 6, 7, 8, 9] + list(range(100, 110))
    )
    # CoW MERGE touching only the HIGH-range file: the low file stays
    # live by reference — the sidecar must keep applying to it.
    catalog.write_to_table(
        spark.createDataFrame([(105, 9999)], "id long, v long"), "t", mode="merge"
    )
    out = {r.id: r.v for r in catalog.read_table("t").collect()}
    assert 5 not in out, "positionally-deleted row resurrected by CoW merge"
    assert out[105] == 9999
    snap = catalog.snapshot("t")
    assert any(f.delta_type == "POSITIONAL_DELETE" for f in snap.files)


def test_cow_delete_respects_positional_deletes(spark, catalog):
    _mk_merge_table(catalog)
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"),
        "t", mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(100, 110)], "id long, v long"),
        "t", mode="merge",
    )
    catalog.delete_where("t", col("id").eq(3))
    # Equality CoW DELETE against the high range only.
    catalog.write_to_table(
        spark.createDataFrame([(101,)], "id long"), "t", mode="delete"
    )
    ids = sorted(r.id for r in catalog.read_table("t").collect())
    assert 3 not in ids and 101 not in ids
    assert ids == [0, 1, 2, 4, 5, 6, 7, 8, 9] + [100] + list(range(102, 110))


def test_optimize_after_pos_delete_then_merge(spark, catalog):
    """OPTIMIZE folds the surviving sidecar away with the same result."""
    _mk_merge_table(catalog)
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"),
        "t", mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(100, 110)], "id long, v long"),
        "t", mode="merge",
    )
    catalog.delete_where("t", col("id").eq(5))
    catalog.write_to_table(
        spark.createDataFrame([(105, 9999)], "id long, v long"), "t", mode="merge"
    )
    before = {(r.id, r.v) for r in catalog.read_table("t").collect()}
    catalog.optimize_table("t")
    snap = catalog.snapshot("t")
    assert all(f.delta_type is None for f in snap.files)
    after = {(r.id, r.v) for r in catalog.read_table("t").collect()}
    assert before == after


def test_concurrent_schema_evolving_appends_conflict(tmp_path):
    """Writer A (adds col x) and writer B (adds col y) race: B's rebase
    must raise instead of silently dropping A's column on replay."""
    log = CommitLog(str(tmp_path / "tbl"))
    assert log.try_commit(Commit(version=1, operation="CREATE"))
    # Writer A: append WITH schema evolution, lands at version 2.
    assert log.try_commit(
        Commit(version=2, operation="APPEND", delta_type="APPEND",
               schema_json=json.dumps({"cols": ["id", "x"]}))
    )
    # Writer B computed against version 1, also evolving the schema.
    b = Commit(version=2, operation="APPEND", delta_type="APPEND",
               schema_json=json.dumps({"cols": ["id", "y"]}))
    with pytest.raises(CommitConflictError):
        log.commit(b)
    # A plain append (no metadata change) still auto-rebases.
    plain = Commit(version=2, operation="APPEND", delta_type="APPEND")
    assert log.commit(plain).version == 3


def test_schema_evolving_append_behind_plain_append_conflicts(tmp_path):
    """The evolving writer itself must not rebase past anything."""
    log = CommitLog(str(tmp_path / "tbl"))
    assert log.try_commit(Commit(version=1, operation="CREATE"))
    assert log.try_commit(Commit(version=2, operation="APPEND", delta_type="APPEND"))
    evolving = Commit(version=2, operation="APPEND", delta_type="APPEND",
                      schema_json=json.dumps({"cols": ["id", "z"]}))
    with pytest.raises(CommitConflictError):
        log.commit(evolving)


def test_vacuum_grace_period_keeps_young_orphans(spark, catalog):
    df = spark.createDataFrame([(1,)], "id long")
    catalog.write_to_table(df, "t", mode="auto")
    troot = catalog._table_root("t", "default")
    orphan_dir = os.path.join(troot, "data", "orphan")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "stray.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    # Default grace: the young orphan survives (in-flight writer safety).
    assert catalog.vacuum("t") == 0
    assert os.path.exists(orphan)
    # Explicit no-grace: it goes (other write-time orphans may too).
    assert catalog.vacuum("t", min_age_seconds=0) >= 1
    assert not os.path.exists(orphan)


def test_read_changes_pos_delete_emits_real_rows(spark, catalog):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    )
    catalog.write_to_table(df, "t", mode="auto")
    v_before = catalog.snapshot("t").version
    assert catalog.delete_where("t", col("id").ge(7)) == 3
    changes = catalog.read_changes("t", from_version=v_before).collect()
    assert len(changes) == 3
    assert all(r._change_type == "POSITIONAL_DELETE" for r in changes)
    # The actual deleted rows, with real (non-null) values.
    assert sorted((r.id, r.v) for r in changes) == [
        (7, "v7"), (8, "v8"), (9, "v9"),
    ]


def test_delete_with_disjoint_columns_raises(spark, catalog):
    _mk_merge_table(catalog)
    catalog.write_to_table(
        spark.createDataFrame([(1, 1)], "id long, v long"), "t", mode="merge"
    )
    bogus = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(SchemaError):
        catalog.write_to_table(bogus, "t", mode="delete")
    assert catalog.read_table("t").count() == 1
