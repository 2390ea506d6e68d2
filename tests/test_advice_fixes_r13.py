"""Round-13 ADVICE fixes.

1. `delete_rows_with_dv` commits at SNAPSHOT version + 1 so the
   hard-link CAS detects commits that landed during its distributed
   scan (previously it re-read latest_version at commit time and would
   silently rebase stale remove/re-add actions over a concurrent
   commit, resurrecting deleted data).
2. Protocol upgrade to writer v7 derives legacy-implied writerFeatures
   from the PRIOR minWriterVersion (a v4 table implies changeDataFeed +
   generatedColumns, not just the v2 pair).
3. Iceberg delete manifests carry a partition_spec_id whose spec
   actually types their partition tuple (registered when absent) —
   external readers resolve the tuple type by spec id
   (spec §Manifests; reference converter commits the same shape,
   `deltacat/compute/converter/converter_session.py`).
4. `write_iceberg` refuses temporal transforms under a non-UTC session
   timezone (the epoch ordinals would be spec-incorrect).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    _implied_writer_features,
    delete_rows_with_dv,
    read_delta,
    write_delta,
)
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    commit_equality_deletes,
    commit_position_deletes,
    read_iceberg,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# 1. DV delete commit version race
# ---------------------------------------------------------------------------


def test_dv_delete_loses_cas_to_concurrent_commit(spark, tmp_path, monkeypatch):
    """A commit landing between the DV scan's snapshot and its commit
    must make the hard-link CAS fail — never a silent rebase."""
    from deltacat_spark.sources import deltadv

    root = str(tmp_path / "t")
    write_delta(spark.range(0, 40).select("id"), root)

    real_write = deltadv.write_dv_file

    def write_and_sneak(path, blobs):
        # a concurrent writer appends while our actions are in flight
        write_delta(spark.range(100, 105).select("id"), root)
        return real_write(path, blobs)

    monkeypatch.setattr(deltadv, "write_dv_file", write_and_sneak)
    with pytest.raises(RuntimeError, match="concurrent Delta commit"):
        delete_rows_with_dv(spark, root, "id < 5")
    # the concurrent append survives untouched
    ids = sorted(r.id for r in read_delta(spark, root).collect())
    assert ids == list(range(40)) + list(range(100, 105))


def test_dv_delete_commits_at_snapshot_version_plus_one(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(0, 40).select("id"), root)  # v0
    write_delta(spark.range(40, 50).select("id"), root)  # v1
    assert delete_rows_with_dv(spark, root, "id IN (3, 44)") == 2


# ---------------------------------------------------------------------------
# 2. legacy-implied writerFeatures
# ---------------------------------------------------------------------------


def test_implied_writer_features_table():
    assert _implied_writer_features(2) == {"appendOnly", "invariants"}
    assert "checkConstraints" in _implied_writer_features(3)
    assert _implied_writer_features(4) >= {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
    }
    assert "columnMapping" in _implied_writer_features(5)
    assert "identityColumns" in _implied_writer_features(6)
    assert "identityColumns" not in _implied_writer_features(5)


def test_dv_upgrade_preserves_v4_implied_features(spark, tmp_path):
    """Upgrading a minWriterVersion=4 table to v7 must list the CDF +
    generated-columns contracts v4 implied."""
    root = str(tmp_path / "t")
    write_delta(spark.range(0, 30).select("id"), root)
    # externally bump the table to legacy writer v4 (reader stays 1)
    log = os.path.join(root, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}
            )
            + "\n"
        )
        f.write(json.dumps({"commitInfo": {"operation": "UPGRADE"}}) + "\n")

    delete_rows_with_dv(spark, root, "id = 7")
    proto = DeltaSnapshot(root).protocol
    assert proto["minWriterVersion"] == 7
    feats = set(proto["writerFeatures"])
    assert {"deletionVectors", "changeDataFeed", "generatedColumns",
            "checkConstraints", "appendOnly", "invariants"} <= feats
    assert "identityColumns" not in feats  # v4 does not imply v6's


# ---------------------------------------------------------------------------
# 3. delete-manifest partition_spec_id
# ---------------------------------------------------------------------------


def _ice_table(spark, tmp_path, partitioned=True):
    root = str(tmp_path / "ice")
    df = spark.range(0, 40).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 4).cast("int").alias("bucket_col"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    write_iceberg(
        df, root, partition_by=["bucket_col"] if partitioned else None
    )
    return root


def _manifest_rows(root):
    tbl = IcebergTable(root)
    meta = tbl.metadata()
    return meta, tbl.manifests(tbl.snapshot(meta))


def test_scoped_equality_delete_registers_matching_spec(spark, tmp_path):
    root = _ice_table(spark, tmp_path, partitioned=True)
    deletes = spark.createDataFrame([(5,), (9,)], "id long")  # both % 4 == 1
    commit_equality_deletes(spark, root, deletes, partition={"bucket_col": 1})

    meta, manifests = _manifest_rows(root)
    dm = [m for m in manifests if m.get("content") == 1]
    assert len(dm) == 1
    spec_id = dm[0]["partition_spec_id"]
    spec = {s["spec-id"]: s for s in meta["partition-specs"]}[spec_id]
    assert [f["name"] for f in spec["fields"]] == ["bucket_col"]
    assert all(f["transform"] == "identity" for f in spec["fields"])
    # default spec untouched; reads still correct
    assert meta["default-spec-id"] == 0
    ids = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert ids == [i for i in range(40) if i not in (5, 9)]


def test_scope_matching_default_spec_reuses_spec_zero(spark, tmp_path):
    """Scope == the table's own identity spec → reuse spec 0, no new
    spec registered (the ADVICE 'reuse spec 0 when the scope matches'
    case)."""
    root = _ice_table(spark, tmp_path, partitioned=True)
    d1 = spark.createDataFrame([(3,)], "id long")
    d2 = spark.createDataFrame([(7,)], "id long")
    commit_equality_deletes(spark, root, d1, partition={"bucket_col": 3})
    commit_equality_deletes(spark, root, d2, partition={"bucket_col": 3})
    meta, manifests = _manifest_rows(root)
    spec_ids = {
        m["partition_spec_id"] for m in manifests if m.get("content") == 1
    }
    assert spec_ids == {0}
    assert len(meta["partition-specs"]) == 1


def test_novel_scope_registers_new_spec_once(spark, tmp_path):
    """Scope on a column OUTSIDE spec 0 → a new identity spec is
    registered on the first commit and reused on the second."""
    root = _ice_table(spark, tmp_path, partitioned=True)
    d1 = spark.createDataFrame([(5,)], "id long")
    d2 = spark.createDataFrame([(9,)], "id long")
    commit_equality_deletes(spark, root, d1, partition={"val": "v5"})
    commit_equality_deletes(spark, root, d2, partition={"val": "v9"})
    meta, manifests = _manifest_rows(root)
    spec_ids = {
        m["partition_spec_id"] for m in manifests if m.get("content") == 1
    }
    assert len(spec_ids) == 1 and 0 not in spec_ids
    assert len(meta["partition-specs"]) == 2  # registered exactly once
    new_spec = {s["spec-id"]: s for s in meta["partition-specs"]}[
        spec_ids.pop()
    ]
    assert [f["name"] for f in new_spec["fields"]] == ["val"]
    # field-ids don't collide with spec 0's
    ids0 = {f["field-id"] for f in meta["partition-specs"][0]["fields"]}
    ids1 = {f["field-id"] for f in new_spec["fields"]}
    assert not (ids0 & ids1)
    assert meta["last-partition-id"] >= max(ids1)
    # scoped deletes applied: id 5 (val v5) and id 9 (val v9) gone
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == [i for i in range(40) if i not in (5, 9)]


def test_unpartitioned_position_delete_on_partitioned_table(spark, tmp_path):
    """Empty partition tuple needs an EMPTY spec; spec 0 has fields."""
    root = _ice_table(spark, tmp_path, partitioned=True)
    from deltacat_spark.sources.iceberg import find_positions_for_predicate

    coords = find_positions_for_predicate(spark, root, "id IN (1, 2)")
    commit_position_deletes(spark, root, coords)
    meta, manifests = _manifest_rows(root)
    dm = [m for m in manifests if m.get("content") == 1][0]
    spec = {s["spec-id"]: s for s in meta["partition-specs"]}[
        dm["partition_spec_id"]
    ]
    assert spec["fields"] == []
    ids = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert ids == [i for i in range(40) if i not in (1, 2)]


def test_unpartitioned_table_delete_keeps_spec_zero(spark, tmp_path):
    root = _ice_table(spark, tmp_path, partitioned=False)
    deletes = spark.createDataFrame([(5,)], "id long")
    commit_equality_deletes(spark, root, deletes)
    meta, manifests = _manifest_rows(root)
    dm = [m for m in manifests if m.get("content") == 1][0]
    assert dm["partition_spec_id"] == 0  # spec 0 is already empty
    assert len(meta["partition-specs"]) == 1


def test_data_manifest_stamps_default_spec_id(spark, tmp_path):
    """After a scoped delete registers spec 1, appends still stamp the
    table's DEFAULT spec id on their data manifests."""
    root = _ice_table(spark, tmp_path, partitioned=True)
    commit_equality_deletes(
        spark,
        root,
        spark.createDataFrame([(3,)], "id long"),
        partition={"bucket_col": 1},
    )
    more = spark.createDataFrame(
        [(100, 0, "x")], "id long, bucket_col int, val string"
    )
    write_iceberg(more, root, mode="append")
    meta, manifests = _manifest_rows(root)
    data_specs = {
        m["partition_spec_id"] for m in manifests if m.get("content", 0) == 0
    }
    assert data_specs == {meta["default-spec-id"]}


def test_iceberg_commit_pins_loaded_version(spark, tmp_path):
    """A commit landing between metadata load and snapshot commit must
    make the metadata CAS lose — same race class as the Delta DV fix
    (re-reading current_version at commit time would silently rebase
    stale manifests over the concurrent commit)."""
    import time as _time

    from deltacat_spark.sources.iceberg import _commit_snapshot

    root = str(tmp_path / "ice")
    write_iceberg(spark.range(10).select("id"), root)
    tbl = IcebergTable(root)
    meta = tbl.metadata()  # pins loaded_version
    # concurrent writer lands
    write_iceberg(spark.range(10, 12).select("id"), root, mode="append")
    with pytest.raises(RuntimeError, match="concurrent Iceberg commit"):
        _commit_snapshot(
            tbl,
            meta,
            tbl.manifests(tbl.snapshot(meta)),
            snapshot_id=123456789,
            seq=meta["last-sequence-number"] + 1,
            now_ms=int(_time.time() * 1000),
            operation="delete",
        )
    # the concurrent append survives untouched
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == list(range(12))


# ---------------------------------------------------------------------------
# 4. UTC assert for temporal transforms
# ---------------------------------------------------------------------------


def test_temporal_transform_refuses_non_utc(spark, tmp_path):
    df = spark.sql(
        "SELECT id, timestamp'2024-03-05 10:00:00' + make_interval(0,0,0,id) AS ts "
        "FROM range(5)"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone"):
            write_iceberg(df, str(tmp_path / "t1"), partition_by=["day(ts)"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # UTC session writes fine
    write_iceberg(df, str(tmp_path / "t2"), partition_by=["day(ts)"])
    assert read_iceberg(spark, str(tmp_path / "t2")).count() == 5


def test_identity_partition_allows_any_timezone(spark, tmp_path):
    df = spark.range(4).select("id", (F.col("id") % 2).alias("p"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        write_iceberg(df, str(tmp_path / "t"), partition_by=["p"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert read_iceberg(spark, str(tmp_path / "t")).count() == 4
