"""RESTORE: roll back to an earlier snapshot as a new commit."""

from pyspark.sql import functions as F, types as T

from deltacat_spark.schema import Field, Schema


def test_restore_copy_by_reference(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,), (2,)], "id long"), "t", mode="auto"
    )
    v1 = catalog.snapshot("t").version
    catalog.write_to_table(
        spark.createDataFrame([(3,), (4,)], "id long"), "t", mode="append"
    )
    catalog.write_to_table(
        spark.createDataFrame([(5,)], "id long"), "t", mode="append"
    )
    assert catalog.read_table("t").count() == 5

    v1_files = {f.path for f in catalog.snapshot("t", version_as_of=v1).files}
    new_v = catalog.restore_table("t", version=v1)
    # restored state == v1 state, via the ORIGINAL files (no rewrite)
    assert {r.id for r in catalog.read_table("t").collect()} == {1, 2}
    now = catalog.snapshot("t")
    assert now.version == new_v
    assert {f.path for f in now.files} == v1_files
    # history intact: the pre-restore state is still time-travelable
    assert catalog.read_table("t", version_as_of=new_v - 1).count() == 5


def test_restore_materializes_mor_deltas(spark, catalog):
    schema = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
    )
    catalog.create_table("m", schema=schema, properties={"read_optimization": "mor"})
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        "m",
        mode="merge",
    )
    v1 = catalog.snapshot("m").version
    catalog.write_to_table(
        spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
        "m",
        mode="merge",
    )
    assert {r.v for r in catalog.read_table("m").collect()} == {"a", "B2", "c"}
    catalog.restore_table("m", version=v1)
    assert {(r.id, r.v) for r in catalog.read_table("m").collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_restore_then_write_continues_history(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t2", mode="auto"
    )
    v1 = catalog.snapshot("t2").version
    catalog.write_to_table(
        spark.createDataFrame([(2,)], "id long"), "t2", mode="append"
    )
    catalog.restore_table("t2", version=v1)
    catalog.write_to_table(
        spark.createDataFrame([(7,)], "id long"), "t2", mode="append"
    )
    assert {r.id for r in catalog.read_table("t2").collect()} == {1, 7}


def test_history_lists_commits_newest_first(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "h", mode="auto"
    )
    catalog.write_to_table(
        spark.createDataFrame([(2,)], "id long"), "h", mode="append"
    )
    catalog.restore_table("h", version=1)
    hist = catalog.history("h")
    assert [h["version"] for h in hist] == sorted(
        (h["version"] for h in hist), reverse=True
    )
    assert hist[0]["operation"] == "RESTORE"
    ops = {h["operation"] for h in hist}
    assert "APPEND" in ops or "CREATE" in ops
    assert all("records_added" in h for h in hist)
    assert catalog.history("h", limit=2) == hist[:2]


def test_shallow_clone_zero_copy_and_independent(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        "src",
        mode="auto",
    )
    catalog.clone_table("src", "dup")
    assert {r.id for r in catalog.read_table("dup").collect()} == {1, 2}
    # zero-copy: the clone's data dir has no files of its own yet
    dup_data = catalog.fs.join(catalog._table_root("dup", "default"), "data")
    assert not catalog.fs.isdir(dup_data) or not list(
        catalog.fs.walk_files(dup_data)
    )
    # independent evolution: writes to the clone don't touch the source
    catalog.write_to_table(
        spark.createDataFrame([(3, "c")], "id long, s string"), "dup", mode="append"
    )
    assert catalog.read_table("dup").count() == 3
    assert catalog.read_table("src").count() == 2
    # and vice versa
    catalog.write_to_table(
        spark.createDataFrame([(9, "z")], "id long, s string"), "src", mode="append"
    )
    assert catalog.read_table("dup").count() == 3


def test_clone_of_version_pins_history(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "s2", mode="auto"
    )
    v1 = catalog.snapshot("s2").version
    catalog.write_to_table(
        spark.createDataFrame([(2,)], "id long"), "s2", mode="append"
    )
    catalog.clone_table("s2", "s2_at_v1", version=v1)
    assert {r.id for r in catalog.read_table("s2_at_v1").collect()} == {1}


def test_clone_materializes_mor_source(spark, catalog):
    from pyspark.sql import types as T

    schema = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
    )
    catalog.create_table("ms", schema=schema, properties={"read_optimization": "mor"})
    catalog.write_to_table(
        spark.createDataFrame([(1, "a")], "id long, v string"), "ms", mode="merge"
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, "A2"), (2, "b")], "id long, v string"),
        "ms",
        mode="merge",
    )
    catalog.clone_table("ms", "ms_clone")
    assert {(r.id, r.v) for r in catalog.read_table("ms_clone").collect()} == {
        (1, "A2"),
        (2, "b"),
    }


def test_deep_clone_survives_source_drop(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,), (2,)], "id long"), "dsrc", mode="auto"
    )
    catalog.clone_table("dsrc", "dcopy", deep=True)
    # self-contained: dropping (purging) the source leaves the copy whole
    catalog.drop_table("dsrc", purge=True)
    assert {r.id for r in catalog.read_table("dcopy").collect()} == {1, 2}


def test_vacuum_protects_shallow_clone_references(spark, catalog):
    """Source vacuum must keep files a registered shallow clone still
    references; dropping the clone releases the pin and sweeps the
    registration."""
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        "src",
        mode="auto",
    )
    catalog.clone_table("src", "pinned")
    # Source moves on: replace leaves the original files referenced
    # only by an old version.
    catalog.write_to_table(
        spark.createDataFrame([(9, "z")], "id long, s string"),
        "src",
        mode="replace",
    )
    src_root = catalog._table_root("src", "default")
    pinned_files = [
        f.abs_path(catalog._table_root("pinned", "default"))
        for f in catalog.snapshot("pinned").files
    ]
    assert pinned_files and all(catalog.fs.exists(p) for p in pinned_files)
    catalog.vacuum("src", retain_versions=0, min_age_seconds=0)
    # clone pin held: every file the clone references survives (orphaned
    # empty part files may still be swept — that's fine)
    assert all(catalog.fs.exists(p) for p in pinned_files)
    assert {(r.id, r.s) for r in catalog.read_table("pinned").collect()} == {
        (1, "a"),
        (2, "b"),
    }
    # Drop the clone; the next source vacuum reclaims the old files and
    # sweeps the dead registration marker.
    catalog.drop_table("pinned")
    catalog.vacuum("src", retain_versions=0, min_age_seconds=0)
    assert not any(catalog.fs.exists(p) for p in pinned_files)
    clones_dir = catalog.fs.join(
        catalog._table_root("src", "default"), "_dcs_clones"
    )
    assert not any(
        n.endswith(".json") for n in catalog.fs.list_dir(clones_dir)
    )
    # Source itself unaffected.
    assert {r.id for r in catalog.read_table("src").collect()} == {9}


def test_restore_rolls_back_schema_evolution(spark, catalog):
    """RESTORE to a pre-evolution version restores that version's
    SCHEMA too, and time travel shows each version's own schema."""
    catalog.write_to_table(
        spark.createDataFrame([(1, "a")], "id long, s string"), "t2", mode="auto"
    )
    v1 = catalog.snapshot("t2").version
    catalog.write_to_table(
        spark.createDataFrame([(2, "b", 9)], "id long, s string, extra int"),
        "t2",
        mode="append",
    )
    assert "extra" in catalog.read_table("t2").columns
    assert "extra" not in catalog.read_table("t2", version_as_of=v1).columns
    catalog.restore_table("t2", version=v1)
    df = catalog.read_table("t2")
    assert df.columns == ["id", "s"]
    assert [(r.id, r.s) for r in df.collect()] == [(1, "a")]
