"""Delta Change Data Feed files (`_change_data/` + `cdc` actions) —
the protocol's "Add CDC File": `update_delta` writes partial-file
rewrites WITH row-level CDC parquet, and `read_delta_changes` serves a
cdc-carrying commit from those files exclusively (never whole-file
diff noise). Reference surface: DatastoreType DELTA_LAKE
(`deltacat/types/media.py:353-420`).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    _commit_actions,
    _stage_files,
    delete_rows_with_dv,
    latest_version,
    read_delta,
    read_delta_changes,
    update_delta,
    write_delta,
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        "id",
        (F.col("id") % 4).cast("string").alias("cat"),
        (F.col("id") * 10).cast("double").alias("val"),
    )
    write_delta(df, root)
    return root


def _rows(spark, root, **kw):
    return {
        r.id: (r.cat, r.val) for r in read_delta(spark, root, **kw).collect()
    }


def test_update_delta_basic(spark, table):
    v = update_delta(
        spark, table, "id % 10 = 3", {"val": "val + 0.5", "cat": "'upd'"}
    )
    assert v == 1
    got = _rows(spark, table)
    for i in range(40):
        if i % 10 == 3:
            assert got[i] == ("upd", i * 10 + 0.5)
        else:
            assert got[i] == (str(i % 4), float(i * 10))
    cdc_dir = os.path.join(table, "_change_data")
    assert os.path.isdir(cdc_dir) and os.listdir(cdc_dir)


def test_update_nothing_matched(spark, table):
    assert update_delta(spark, table, "id > 999", {"val": "0.0"}) is None
    assert latest_version(table) == 0


def test_update_refuses_partition_column_set(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(10).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta(df, root, partition_by=["p"])
    with pytest.raises(ValueError, match="partition columns"):
        update_delta(spark, root, "id = 1", {"p": "'9'"})
    with pytest.raises(ValueError, match="not in table schema"):
        update_delta(spark, root, "id = 1", {"nope": "1"})


def test_update_folds_dv_files(spark, table):
    """UPDATE over a DV-carrying file folds the MoR delete into the
    CoW rewrite: deleted rows stay deleted, the new file has no DV,
    and the feed shows only the updated row."""
    delete_rows_with_dv(spark, table, "id = 2")
    v = update_delta(spark, table, "id = 3", {"val": "-3.0"})
    assert v == 2
    got = _rows(spark, table)
    assert 2 not in got  # DV delete survived the rewrite
    assert got[3] == ("3", -3.0)
    assert len(got) == 39
    snap = DeltaSnapshot(table)
    assert not any(
        f.get("deletionVector") for f in snap.live_files()
    )  # folded away
    feed = read_delta_changes(spark, table, 2, 2).collect()
    assert sorted((r.id, r["_change_type"]) for r in feed) == [
        (3, "update_postimage"),
        (3, "update_preimage"),
    ]


def test_update_dv_deleted_rows_dont_match_predicate(spark, table):
    """A predicate matching ONLY DV-deleted rows updates nothing."""
    delete_rows_with_dv(spark, table, "id = 7")
    assert update_delta(spark, table, "id = 7", {"val": "0.0"}) is None


def test_feed_serves_cdc_exclusively(spark, table):
    """The UPDATE rewrites whole files (carrying unchanged rows); the
    feed must surface ONLY the 4 changed rows as pre/post images."""
    update_delta(spark, table, "id % 10 = 3", {"val": "val + 0.5"})
    feed = read_delta_changes(spark, table, 1, 1).collect()
    by_type: dict = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert set(by_type) == {"update_preimage", "update_postimage"}
    pre = sorted((r.id, r.val) for r in by_type["update_preimage"])
    post = sorted((r.id, r.val) for r in by_type["update_postimage"])
    assert pre == [(i, float(i * 10)) for i in range(40) if i % 10 == 3]
    assert post == [(i, i * 10 + 0.5) for i in range(40) if i % 10 == 3]
    assert all(r["_commit_version"] == 1 for r in feed)


def test_feed_mixed_history(spark, table):
    """append (derived inserts) → UPDATE (cdc) → DV delete (position
    diff) in one feed."""
    write_delta(spark.range(100, 105).select(
        "id",
        F.lit("x").alias("cat"),
        F.lit(0.0).alias("val"),
    ), table)  # v1
    update_delta(spark, table, "id = 100", {"val": "7.0"})  # v2 cdc
    delete_rows_with_dv(spark, table, "id = 101")  # v3
    feed = read_delta_changes(spark, table, 1).collect()
    kinds = sorted(
        (r["_commit_version"], r["_change_type"], r.id) for r in feed
    )
    assert (1, "insert", 100) in kinds and (1, "insert", 104) in kinds
    assert (2, "update_preimage", 100) in kinds
    assert (2, "update_postimage", 100) in kinds
    assert (3, "delete", 101) in kinds
    # no noise: v2 contributed exactly 2 rows
    assert len([k for k in kinds if k[0] == 2]) == 2


def test_cdf_protocol_and_config_stamped(spark, table):
    update_delta(spark, table, "id = 1", {"val": "1.5"})
    snap = DeltaSnapshot(table)
    assert (
        snap.metadata["configuration"]["delta.enableChangeDataFeed"]
        == "true"
    )
    assert snap.protocol["minWriterVersion"] >= 4
    v1_actions = open(
        os.path.join(table, "_delta_log", f"{1:020d}.json")
    ).read()
    # second update must not re-stamp metadata/protocol
    update_delta(spark, table, "id = 2", {"val": "2.5"})
    v2 = open(
        os.path.join(table, "_delta_log", f"{2:020d}.json")
    ).read()
    assert "metaData" in v1_actions and "metaData" not in v2


def test_partitioned_update_reconstructs_partition_cols(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(20).select(
        "id",
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 1.0).alias("val"),
    )
    write_delta(df, root, partition_by=["p"])
    update_delta(spark, root, "id IN (4, 5)", {"val": "-1.0"})
    feed = read_delta_changes(spark, root, 1, 1)
    got = sorted(
        (r.id, r.p, r["_change_type"]) for r in feed.collect()
    )
    assert got == [
        (4, "0", "update_postimage"),
        (4, "0", "update_preimage"),
        (5, "1", "update_postimage"),
        (5, "1", "update_preimage"),
    ]
    # snapshot read unaffected
    got2 = {r.id: r.val for r in read_delta(spark, root).collect()}
    assert got2[4] == -1.0 and got2[5] == -1.0 and got2[6] == 6.0


def test_planted_external_cdc_commit(spark, table):
    """Hand-plant the external delta-spark CDF shape: a commit with
    remove+add (rewrite) AND cdc actions — the feed must read the cdc
    file, not diff the rewrite."""
    snap = DeltaSnapshot(table)
    old = snap.live_files()[0]
    sch = snap.schema
    base = read_delta(spark, table)
    # "rewrite": re-add the same rows as a new file
    new_adds = _stage_files(base, table, [], 5_000_000)
    cdc_rows = spark.createDataFrame(
        [(7, "3", 70.0, "update_preimage"), (7, "3", 77.0, "update_postimage")],
        "id long, cat string, val double, _change_type string",
    )
    cdc_adds = _stage_files(
        cdc_rows, table, [], 5_000_000, prefix="_change_data"
    )
    actions = [
        {"remove": {"path": old["path"], "deletionTimestamp": 1,
                    "dataChange": True}},
    ]
    actions += [{"add": a} for a in new_adds]
    actions += [
        {
            "cdc": {
                "path": a["path"],
                "partitionValues": {},
                "size": a["size"],
                "dataChange": False,
            }
        }
        for a in cdc_adds
    ]
    actions.append({"commitInfo": {"operation": "UPDATE"}})
    _commit_actions(table, 1, actions)
    feed = read_delta_changes(spark, table, 1, 1).collect()
    assert sorted((r.id, r.val, r["_change_type"]) for r in feed) == [
        (7, 70.0, "update_preimage"),
        (7, 77.0, "update_postimage"),
    ]


def test_vacuumed_cdc_file_raises(spark, table):
    update_delta(spark, table, "id = 1", {"val": "1.5"})
    cdc_dir = os.path.join(table, "_change_data")
    for f in os.listdir(cdc_dir):
        os.remove(os.path.join(cdc_dir, f))
    with pytest.raises(ValueError, match="CDC file"):
        read_delta_changes(spark, table, 1, 1).collect()


def test_update_set_evaluates_against_preimage(spark, tmp_path):
    """SQL UPDATE semantics (r14, ADVICE fix): predicate and EVERY SET
    right-hand side are evaluated simultaneously against the pre-image.
    `SET x = x + 1, y = 100 WHERE x = 5` must land (6, 100) — a chained
    evaluation would bump x first, re-evaluate the predicate as 6 = 5,
    and never set y."""
    root = str(tmp_path / "pre")
    df = spark.createDataFrame([(1, 5, 0), (2, 8, 0)], "id int, x int, y int")
    write_delta(df, root)
    v = update_delta(spark, root, "x = 5", {"x": "x + 1", "y": "100"})
    assert v == 1
    got = {r.id: (r.x, r.y) for r in read_delta(spark, root).collect()}
    assert got == {1: (6, 100), 2: (8, 0)}
    feed = read_delta_changes(spark, root, 1, 1).collect()
    post = {(r.id, r.x, r.y) for r in feed if r["_change_type"] == "update_postimage"}
    assert post == {(1, 6, 100)}


def test_update_set_swap_columns(spark, tmp_path):
    """`SET x = y, y = x` swaps — both RHS read the pre-image."""
    root = str(tmp_path / "swap")
    df = spark.createDataFrame([(1, 10, 20), (2, 3, 4)], "id int, x int, y int")
    write_delta(df, root)
    update_delta(spark, root, "id = 1", {"x": "y", "y": "x"})
    got = {r.id: (r.x, r.y) for r in read_delta(spark, root).collect()}
    assert got == {1: (20, 10), 2: (3, 4)}
    feed = read_delta_changes(spark, root, 1, 1).collect()
    post = {(r.id, r.x, r.y) for r in feed if r["_change_type"] == "update_postimage"}
    assert post == {(1, 20, 10)}
