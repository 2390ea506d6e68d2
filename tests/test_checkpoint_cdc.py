"""Checkpoint-accelerated snapshots + delta/CDC reads.

Checkpointing: SURVEY §7 hard part 5 (metadata fast at many commits).
read_delta: reference `download_delta` (`storage/main/impl.py:947`).
read_changes: CDC surface from the north star (BASELINE.json).
"""

from pyspark.sql import types as T

from deltacat_spark.schema import Field, Schema
from deltacat_spark.storage.snapshot import Snapshot


def batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id long, v string"
    )


def test_checkpoint_written_and_equivalent(spark, catalog):
    catalog.create_table(
        "t",
        schema=Schema([Field("id", T.LongType()), Field("v", T.StringType())]),
        properties={"checkpoint.interval": 5, "compaction.trigger.deltas": 10**9},
    )
    for i in range(7):
        catalog.write_to_table(batch(spark, i * 10, i * 10 + 3), "t", mode="append")
    snap = catalog.snapshot("t")  # triggers lazy checkpoint
    log = catalog._log("t", "default")
    cps = log.checkpoints()
    assert cps, "expected a checkpoint to be written"
    # checkpoint-accelerated snapshot ≡ full replay
    snap2 = catalog.snapshot("t")
    assert len(snap2.commits) < snap2.version  # tail only
    full = Snapshot.of(log)  # would use checkpoint too; force full:
    assert {f.path for f in snap2.files} == {f.path for f in snap.files}
    assert catalog.read_table("t").count() == 21
    # time travel to before the checkpoint still works (full replay path)
    assert catalog.read_table("t", version_as_of=3).count() == 6
    # schema history preserved through checkpoint
    assert snap2.schema is not None and snap2.schema.names == ["id", "v"]


def test_checkpoint_with_merge_keys_and_updates(spark, catalog):
    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
        ),
        properties={"checkpoint.interval": 3},
    )
    for i in range(5):
        catalog.write_to_table(batch(spark, 0, 4), "m", mode="merge")
    assert catalog._log("m", "default").checkpoints()
    assert catalog.read_table("m").count() == 4


def test_read_delta_single_commit(spark, catalog):
    catalog.write_to_table(batch(spark, 0, 3), "t", mode="auto")
    catalog.write_to_table(batch(spark, 10, 14), "t", mode="append")
    v = catalog.snapshot("t").version
    only = catalog.read_delta("t", v)
    assert sorted(r.id for r in only.collect()) == [10, 11, 12, 13]


def test_read_changes_append_family(spark, catalog):
    catalog.write_to_table(batch(spark, 0, 3), "t", mode="auto")
    v0 = catalog.snapshot("t").version
    catalog.write_to_table(batch(spark, 10, 12), "t", mode="append")
    catalog.write_to_table(batch(spark, 20, 21), "t", mode="add")
    ch = catalog.read_changes("t", from_version=v0)
    rows = ch.collect()
    assert sorted(r.id for r in rows) == [10, 11, 20]
    assert {r._change_type for r in rows} == {"APPEND", "ADD"}
    assert len({r._commit_version for r in rows}) == 2


def test_read_changes_mor_deltas(spark, catalog):
    from deltacat_spark.catalog import Catalog

    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
        ),
        properties={"read_optimization": "none"},
    )
    catalog.write_to_table(batch(spark, 0, 3), "m", mode="merge")
    v0 = catalog.snapshot("m").version
    catalog.write_to_table(batch(spark, 1, 2), "m", mode="merge")
    catalog.write_to_table(
        spark.createDataFrame([(0,)], "id long"), "m", mode="delete"
    )
    ch = catalog.read_changes("m", from_version=v0).collect()
    types = {r._change_type for r in ch}
    assert types == {"UPSERT", "DELETE"}


def test_cdc_sidecars_for_cow_commits(spark, catalog):
    """With cdc.enabled, CoW MERGE/DELETE commits carry row-level change
    files so read_changes is exact despite the rewrite."""
    catalog.create_table(
        "c",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.StringType())]
        ),
        properties={"cdc.enabled": True},
    )
    catalog.write_to_table(batch(spark, 0, 3), "c", mode="merge")
    v0 = catalog.snapshot("c").version
    catalog.write_to_table(batch(spark, 1, 2), "c", mode="merge")  # CoW upsert
    catalog.write_to_table(
        spark.createDataFrame([(0,)], "id long"), "c", mode="delete"
    )
    ch = catalog.read_changes("c", from_version=v0).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append(r.id)
    assert by_type["MERGE"] == [1]      # only the changed row, not the rewrite
    assert by_type["DELETE"] == [0]     # the delete payload
    # live reads unaffected; vacuum keeps the sidecars
    catalog.vacuum("c", min_age_seconds=0)
    assert catalog.read_changes("c", from_version=v0).count() == 2
    assert sorted(r.id for r in catalog.read_table("c").collect()) == [1, 2]
