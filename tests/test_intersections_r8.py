"""Round-8 cross-feature intersection tests: the new SQL maintenance
statements composed with the features they most plausibly collide with.

* shallow CLONE × source RESTORE — the clone pins its snapshot and is
  unaffected by the source rolling back.
* CDC-driven incremental MERGE — `MERGE INTO ... USING (SELECT ... FROM
  table_changes('src', v))`, the classic change-feed pipeline, in one
  statement.
* RESTORE × CHECK constraints — restore rolls back DATA; table
  properties (constraints) stay at head, and the constraint re-applies
  to post-restore writes.
* RESTORE commit × table_changes — a copy-by-reference restore commit
  carries no delta rows (CoW-rewrite CDC semantics, documented), while
  MoR-table changes keep flowing after a restore.
"""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "r8x"))
    c.create_table(
        "src",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    c.sql("INSERT INTO src VALUES (1, 10), (2, 20)")
    return c


def test_shallow_clone_survives_source_restore(cat):
    cat.sql("CREATE TABLE pinned SHALLOW CLONE src")
    v_pin = cat.snapshot("src").version
    cat.sql("INSERT INTO src VALUES (3, 30)")
    cat.sql(f"RESTORE TABLE src TO VERSION AS OF {v_pin}")
    # the clone still reads its pinned state; the source rolled back
    assert {r.id for r in cat.read_table("pinned").collect()} == {1, 2}
    assert {r.id for r in cat.read_table("src").collect()} == {1, 2}
    # and the clone keeps evolving independently after the restore
    cat.sql("INSERT INTO pinned VALUES (9, 90)")
    assert {r.id for r in cat.read_table("pinned").collect()} == {1, 2, 9}


def test_cdc_driven_incremental_merge(cat):
    cat.create_table(
        "dst",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
    )
    cat.sql("INSERT INTO dst SELECT id, v FROM src")
    v0 = cat.snapshot("src").version
    cat.sql("INSERT INTO src VALUES (3, 30)")
    cat.sql("INSERT INTO src VALUES (1, 11)")  # upsert of existing key
    res = cat.sql(
        f"MERGE INTO dst t USING"
        f" (SELECT id, v FROM table_changes('src', {v0})) s"
        f" ON t.id = s.id"
        f" WHEN MATCHED THEN UPDATE SET *"
        f" WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: r.v for r in cat.read_table("dst").collect()}
    assert got == {1: 11, 2: 20, 3: 30}


def test_restore_keeps_constraints_at_head(cat):
    v0 = cat.snapshot("src").version
    cat.sql("ALTER TABLE src ADD CONSTRAINT pos CHECK (v > 0)")
    cat.sql("INSERT INTO src VALUES (5, 50)")
    cat.sql(f"RESTORE TABLE src TO VERSION AS OF {v0}")
    assert {r.id for r in cat.read_table("src").collect()} == {1, 2}
    # RESTORE rolls back data, not table properties: the constraint
    # declared after v0 still guards post-restore writes
    from deltacat_spark.catalog.catalog import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        cat.sql("INSERT INTO src VALUES (6, -1)")


def test_table_changes_across_restore(cat):
    v0 = cat.snapshot("src").version
    cat.sql("INSERT INTO src VALUES (3, 30)")
    cat.sql(f"RESTORE TABLE src TO VERSION AS OF {v0}")
    v_restore = cat.snapshot("src").version
    cat.sql("INSERT INTO src VALUES (4, 40)")
    rows = cat.sql(
        f"SELECT id, _commit_version FROM table_changes('src', {v0})"
        f" ORDER BY _commit_version"
    ).collect()
    # the insert before the restore and the one after both surface
    ids = [r.id for r in rows]
    assert 3 in ids and 4 in ids
    # rows attributed to the restore commit (a MoR-source restore
    # materializes via REPLACE) can only be the restored state {1, 2}
    at_restore = {r.id for r in rows if r._commit_version == v_restore}
    assert at_restore <= {1, 2}
