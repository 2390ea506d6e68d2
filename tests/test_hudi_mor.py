"""Hudi MERGE_ON_READ interop (`sources/hudi.py`).

Reference surface: DatastoreType HUDI (`types/media.py:353-420`) — the
reference reads MoR tables through Hudi datasources; this module
implements the table type jar-free: upserts land as log files under
`.deltacommit` actions, snapshot reads merge base+logs per file group
(latest write per record key, `_hoodie_is_deleted` honored),
`compact_hudi` folds logs into new base files under a `commit` stamped
`compacted: true`, and incremental pulls stay exact through it all.
Includes a randomized model check mirroring `test_hudi_model.py`.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.hudi import (
    cluster_hudi,
    compact_hudi,
    completed_instants,
    file_slices,
    instant_kind,
    read_hudi,
    read_hudi_incremental,
    table_properties,
    write_hudi,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, cat string, v double")


@pytest.fixture()
def mor_root(spark, tmp_path):
    root = str(tmp_path / "t")
    rows = [(i, str(i % 2), float(i)) for i in range(20)]
    write_hudi(
        _df(spark, rows),
        root,
        record_key_field="k",
        operation="insert",
        partition_by=["cat"],
        table_type="MERGE_ON_READ",
    )
    return root


def test_mor_upsert_lands_as_log_file(spark, mor_root):
    root = mor_root
    bases_before = {
        s["file_id"]: s["path"] for s in file_slices(root)
    }
    i2 = write_hudi(
        _df(spark, [(0, "0", 1000.0), (1, "1", 1001.0)]),
        root,
        record_key_field="k",
    )
    assert instant_kind(root, i2) == "deltacommit"
    slices = file_slices(root)
    # bases unchanged — the upsert did NOT rewrite any base file
    assert {s["file_id"]: s["path"] for s in slices} == bases_before
    logged = [s for s in slices if s["log_paths"]]
    assert len(logged) == 2  # one log per touched partition's group
    for s in logged:
        assert ".log." in os.path.basename(s["log_paths"][0])
        assert os.path.isfile(os.path.join(root, s["log_paths"][0]))


def test_mor_snapshot_merges_updates_new_keys_and_time_travel(
    spark, mor_root
):
    root = mor_root
    i1 = completed_instants(root)[-1]
    write_hudi(
        _df(spark, [(0, "0", 1000.0), (100, "0", 100.0)]),
        root,
        record_key_field="k",
    )
    got = {
        r.k: r.v for r in read_hudi(spark, root).collect()
    }
    assert got[0] == 1000.0  # updated via log
    assert got[100] == 100.0  # new key via new base group
    assert got[1] == 1.0  # untouched
    assert len(got) == 21
    # time travel to before the upsert
    old = {r.k: r.v for r in read_hudi(spark, root, as_of=i1).collect()}
    assert old[0] == 0.0 and 100 not in old and len(old) == 20


def test_mor_soft_delete_via_hoodie_is_deleted(spark, mor_root):
    root = mor_root
    doomed = spark.createDataFrame(
        [(3, "1", 3.0, True), (4, "0", 2000.0, False)],
        "k long, cat string, v double, _hoodie_is_deleted boolean",
    )
    write_hudi(doomed, root, record_key_field="k")
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert 3 not in got
    assert got[4] == 2000.0
    assert len(got) == 19


def test_mor_incremental_pull_exact_and_compaction_silent(
    spark, mor_root
):
    root = mor_root
    i1 = completed_instants(root)[-1]
    write_hudi(
        _df(spark, [(5, "1", 500.0), (200, "0", 200.0)]),
        root,
        record_key_field="k",
    )
    inc = read_hudi_incremental(spark, root, begin_instant=i1, drop_meta=True)
    assert sorted((r.k, r.v) for r in inc.collect()) == [
        (5, 500.0),
        (200, 200.0),
    ]
    # compaction folds the log; the incremental window must not change
    snap_before = sorted(
        map(tuple, read_hudi(spark, root).collect())
    )
    ci = compact_hudi(spark, root)
    assert ci is not None
    assert instant_kind(root, ci) == "commit"
    inc2 = read_hudi_incremental(
        spark, root, begin_instant=i1, drop_meta=True
    )
    assert sorted((r.k, r.v) for r in inc2.collect()) == [
        (5, 500.0),
        (200, 200.0),
    ]
    # snapshot identical, and the compacted groups carry no logs
    assert sorted(map(tuple, read_hudi(spark, root).collect())) == snap_before
    assert all(not s["log_paths"] for s in file_slices(root))
    # and time travel to before compaction still merges base+logs
    pre = {r.k: r.v for r in read_hudi(spark, root, as_of=ci).collect()}
    assert pre[5] == 500.0


def test_mor_cluster_requires_compaction_first(spark, mor_root):
    root = mor_root
    write_hudi(
        _df(spark, [(7, "1", 700.0)]), root, record_key_field="k"
    )
    with pytest.raises(ValueError, match="compact"):
        cluster_hudi(spark, root)
    compact_hudi(spark, root)
    # after compaction clustering is allowed again
    cluster_hudi(spark, root, min_groups=1)
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got[7] == 700.0 and len(got) == 20


def test_mor_table_type_persisted_and_validated(spark, mor_root):
    assert (
        table_properties(mor_root)["hoodie.table.type"] == "MERGE_ON_READ"
    )
    with pytest.raises(ValueError, match="table_type"):
        write_hudi(
            _df(spark, [(1, "1", 1.0)]),
            mor_root,
            record_key_field="k",
            table_type="COPY_ON_WRITE",
        )


def test_mor_random_ops_match_model(spark, tmp_path):
    """Randomized model check: MoR upsert/insert/delete/compact against
    a plain-dict model; snapshot read matches after every step and
    incremental windows deliver exactly each write's rows."""
    rng = random.Random(911)
    root = str(tmp_path / "t")
    live: dict[int, float] = {}
    written: dict[str, list[tuple[int, float, bool]]] = {}

    rows = [(i, str(i % 3), float(i)) for i in range(15)]
    i0 = write_hudi(
        _df(spark, rows),
        root,
        record_key_field="k",
        operation="insert",
        partition_by=["cat"],
        table_type="MERGE_ON_READ",
    )
    live.update({i: float(v) for i, _, v in rows})
    next_id = 1000

    def check():
        got = {r.k: r.v for r in read_hudi(spark, root).collect()}
        assert got == live

    check()
    for step in range(8):
        op = rng.choice(["upsert", "upsert", "delete", "compact"])
        if op == "upsert":
            updates = rng.sample(sorted(live), k=min(3, len(live)))
            fresh = [next_id + j for j in range(rng.randint(0, 2))]
            next_id += 10
            batch = [
                (k, str(k % 3), float(k) + 0.5 + step) for k in updates
            ] + [(k, str(k % 3), float(k)) for k in fresh]
            inst = write_hudi(
                _df(spark, batch), root, record_key_field="k"
            )
            for k, _, v in batch:
                live[k] = v
            written[inst] = [(k, v, False) for k, _, v in batch]
        elif op == "delete":
            if not live:
                continue
            doomed = rng.sample(sorted(live), k=1)[0]
            batch = spark.createDataFrame(
                [(doomed, str(doomed % 3), 0.0, True)],
                "k long, cat string, v double, _hoodie_is_deleted boolean",
            )
            inst = write_hudi(batch, root, record_key_field="k")
            live.pop(doomed)
            written[inst] = [(doomed, 0.0, True)]
        else:
            compact_hudi(spark, root)
        check()

    # every non-compaction write's incremental window is exactly its rows
    instants = [i0] + sorted(written)
    for a, b in zip(instants, instants[1:]):
        inc = read_hudi_incremental(
            spark, root, begin_instant=a, end_instant=b
        )
        got = sorted(
            (r.k, r.v, bool(r._hoodie_is_deleted)
             if "_hoodie_is_deleted" in inc.columns
             and r._hoodie_is_deleted is not None
             else False)
            for r in inc.collect()
        )
        assert got == sorted(written[b])


def test_mor_log_filenames_unique_per_writing_instant(spark, mor_root):
    """Two sequential upserts to the SAME file group must land as two
    distinct log files whose names carry their own writing instant —
    the property that makes concurrent writers collision-free on disk
    (both compute version=N+1 from the same pre-commit live set; only
    the instant differs)."""
    root = mor_root
    i2 = write_hudi(
        _df(spark, [(0, "0", 10.0)]), root, record_key_field="k"
    )
    i3 = write_hudi(
        _df(spark, [(0, "0", 20.0)]), root, record_key_field="k"
    )
    s = [x for x in file_slices(root) if x["log_paths"]]
    logs = [os.path.basename(p) for x in s for p in x["log_paths"]]
    assert len(logs) == len(set(logs)) == 2
    assert any(i2 in name for name in logs)
    assert any(i3 in name for name in logs)
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got[0] == 20.0
