"""Partition-scoped OPTIMIZE (reference compacts one partition per
session — `compute/compactor_v2/compaction_session.py:68-216`,
`catalog/main/impl.py:986-1091`). The 100 TB scenario: one hot
partition receives upserts; compaction must fold ONLY that partition
and leave every other file live by reference — byte-identical paths in
the log — instead of rewriting the table."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema
from deltacat_spark.storage.commit import DeltaType

MOR = {"read_optimization": "none"}

# Partition column IS a merge key — partition membership is a function
# of the key, the clean scoping case.
SCHEMA_KEYED = Schema(
    [
        Field("cat", T.StringType(), merge_key=True),
        Field("k", T.LongType(), merge_key=True),
        Field("v", T.IntegerType()),
    ]
)

# Partition column is NOT a merge key — upserts may move rows across
# partitions, so out-of-scope pending deltas force a full rewrite.
SCHEMA_NONKEY = Schema(
    [
        Field("k", T.LongType(), merge_key=True),
        Field("cat", T.StringType()),
        Field("v", T.IntegerType()),
    ]
)

ROWS = [("abc"[i % 3], i, i * 10) for i in range(30)]


def _mk(spark, tmp_path, schema, name="t", props=MOR):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        name,
        schema=schema,
        partition_scheme=[PartitionKey("cat")],
        properties=props,
    )
    cols = ", ".join(
        f"{f.name} {'string' if f.name == 'cat' else ('long' if f.name == 'k' else 'int')}"
        for f in schema.fields
    )
    cat.write_to_table(spark.createDataFrame(
        [tuple(getattr_row(r, schema)) for r in ROWS], cols), name, mode="merge")
    return cat


def getattr_row(r, schema):
    by_name = {"cat": r[0], "k": r[1], "v": r[2]}
    return [by_name[f.name] for f in schema.fields]


def _content(cat, name="t"):
    return sorted(
        (r.cat, r.k, r.v) for r in cat.read_table(name).select("cat", "k", "v").collect()
    )


def _paths(cat, name="t", part=None):
    snap = cat.snapshot(name)
    files = snap.prune({"cat": part}, None) if part else snap.files
    return sorted(f.path for f in files)


def _last_metrics(cat, name="t"):
    log = cat._log(name, "default")
    commits = log.replay()
    return commits[-1].metrics or {}


def test_scoped_optimize_keyed_partition(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    # hot partition "a" receives an upsert (pending MoR delta)
    upd = spark.createDataFrame(
        [("a", 0, 999), ("a", 3, 998)], "cat string, k long, v int"
    )
    cat.write_to_table(upd, "t", mode="merge")
    snap = cat.snapshot("t")
    assert any(f.delta_type == DeltaType.UPSERT for f in snap.files)
    before_b = _paths(cat, part="b")
    before_c = _paths(cat, part="c")
    expected = _content(cat)
    pre_version = snap.version

    cat.optimize_table("t", partition_filter={"cat": "a"})

    m = _last_metrics(cat)
    assert m["mode"] == "partition"
    assert m["kept_by_reference"] > 0
    assert "partition_fallback" not in m
    # other partitions: byte-identical — same paths live in the log
    assert _paths(cat, part="b") == before_b
    assert _paths(cat, part="c") == before_c
    # scope fully resolved: no unresolved delta remains IN partition a
    # (b/c keep their initial-load upsert deltas — untouched by design)
    snap2 = cat.snapshot("t")
    a_files = snap2.prune({"cat": "a"}, None)
    assert not any(
        f.delta_type in (DeltaType.UPSERT, DeltaType.DELETE) for f in a_files
    )
    assert _content(cat) == expected
    # time travel still reads the pre-optimize state
    pre = sorted(
        (r.cat, r.k, r.v)
        for r in cat.read_table("t", version_as_of=pre_version)
        .select("cat", "k", "v")
        .collect()
    )
    assert pre == expected  # upsert was already applied pre-optimize


def test_scoped_matches_full_rewrite(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    upd = spark.createDataFrame([("a", 0, 777)], "cat string, k long, v int")
    cat.write_to_table(upd, "t", mode="merge")
    dele = spark.createDataFrame([("a", 6)], "cat string, k long")
    cat.write_to_table(dele, "t", mode="delete")

    cat2 = _mk(spark, tmp_path / "two", SCHEMA_KEYED)
    cat2.write_to_table(upd, "t", mode="merge")
    cat2.write_to_table(dele, "t", mode="delete")

    cat.optimize_table("t", partition_filter={"cat": "a"})
    cat2.optimize_table("t")
    assert _content(cat) == _content(cat2)
    assert _last_metrics(cat)["mode"] == "partition"
    assert _last_metrics(cat2)["mode"] == "full"


def test_fallback_nonkey_partition_with_out_of_scope_delta(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_NONKEY)
    # pending upserts in BOTH a and b; partition col not a merge key
    cat.write_to_table(
        spark.createDataFrame(
            [(0, "a", 111), (1, "b", 222)], "k long, cat string, v int"
        ),
        "t",
        mode="merge",
    )
    expected = _content(cat)
    cat.optimize_table("t", partition_filter={"cat": "a"})
    m = _last_metrics(cat)
    assert m["mode"] == "full"
    assert "not all merge keys" in m["partition_fallback"]
    assert _content(cat) == expected


def test_scoped_nonkey_partition_all_deltas_in_scope(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_NONKEY)
    cat.optimize_table("t")  # fold the initial-load delta everywhere
    # the only pending delta lives in partition a → scoping is safe even
    # though cat is not a merge key
    cat.write_to_table(
        spark.createDataFrame([(0, "a", 111)], "k long, cat string, v int"),
        "t",
        mode="merge",
    )
    before_b = _paths(cat, part="b")
    expected = _content(cat)
    cat.optimize_table("t", partition_filter={"cat": "a"})
    m = _last_metrics(cat)
    assert m["mode"] == "partition"
    assert _paths(cat, part="b") == before_b
    assert _content(cat) == expected


def test_fallback_unscoped_delete_sidecar(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_NONKEY)
    cat.optimize_table("t")  # fold the initial-load delta everywhere
    # equality delete whose payload lacks the partition column → the
    # sidecar lands unpartitioned (no partition values) and may target
    # any partition: scoping must refuse
    cat.write_to_table(
        spark.createDataFrame([(4,)], "k long"), "t", mode="delete"
    )
    expected = _content(cat)
    cat.optimize_table("t", partition_filter={"cat": "a"})
    m = _last_metrics(cat)
    assert m["mode"] == "full"
    assert "without partition values" in m["partition_fallback"]
    assert _content(cat) == expected
    assert 4 not in {k for _, k, _v in _content(cat)}


SCHEMA_PLAIN = Schema(
    [
        Field("cat", T.StringType()),
        Field("k", T.LongType()),
        Field("v", T.IntegerType()),
    ]
)


def test_partition_incremental_binpack(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "t", schema=SCHEMA_PLAIN, partition_scheme=[PartitionKey("cat")]
    )
    # many small appends → small files in every partition
    for i in range(4):
        cat.write_to_table(
            spark.createDataFrame(
                [("abc"[j % 3], i * 10 + j, j) for j in range(6)],
                "cat string, k long, v int",
            ),
            "t",
            mode="append",
        )
    before_b = _paths(cat, part="b")
    n_a_before = len(_paths(cat, part="a"))
    expected = _content(cat)
    cat.optimize_table(
        "t", partition_filter={"cat": "a"}, small_file_records=1000
    )
    m = _last_metrics(cat)
    assert m["mode"] == "partition-incremental"
    assert _paths(cat, part="b") == before_b
    assert len(_paths(cat, part="a")) < n_a_before
    assert _content(cat) == expected


def test_scoped_empty_partition_is_noop(spark, tmp_path):
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    v = cat.snapshot("t").version
    cat.optimize_table("t", partition_filter={"cat": "zzz"})
    assert cat.snapshot("t").version == v  # no commit written


def test_zorder_with_partition_filter_scopes(spark, tmp_path):
    """r7: ZORDER now composes with a partition scope (was rejected);
    an MoR table with only in-scope deltas scopes cleanly."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    before_b = _paths(cat, part="b")
    cat.optimize_table("t", partition_filter={"cat": "a"}, zorder_by=["k"])
    assert _last_metrics(cat)["mode"] == "partition-zorder"
    assert _paths(cat, part="b") == before_b


def test_vacuum_after_scoped_optimize_spares_kept_partitions(spark, tmp_path):
    """Cross-feature: a scoped OPTIMIZE removes partition a's old files
    from the live set; vacuum with no retention must reclaim exactly
    those (once aged) while every kept-by-reference file in b/c stays on
    disk — the log still references them."""
    import os

    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    cat.write_to_table(
        spark.createDataFrame([("a", 0, 999)], "cat string, k long, v int"),
        "t",
        mode="merge",
    )
    troot = cat._table_root("t", "default")
    snap = cat.snapshot("t")
    a_before = {f.path for f in snap.prune({"cat": "a"}, None)}
    b_files = [f.path for f in snap.prune({"cat": "b"}, None)]
    cat.optimize_table("t", partition_filter={"cat": "a"})

    rep = cat.vacuum("t", min_age_seconds=0, retain_versions=0, dry_run=True)
    doomed = set(rep.files)
    assert doomed and doomed <= a_before, (
        "vacuum must only reclaim partition a's superseded files"
    )
    real = cat.vacuum("t", min_age_seconds=0, retain_versions=0)
    assert set(real.files) == doomed
    for p in b_files:
        assert os.path.exists(os.path.join(troot, p)), "kept file deleted!"
    # table still reads correctly after the reclaim
    assert len(_content(cat)) == 30


def test_cdc_skips_scoped_optimize_rewrite(spark, tmp_path):
    """Cross-feature: an OPTIMIZE commit (scoped or not) is a physical
    rewrite, not a logical change — read_changes must emit nothing for
    it."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    v0 = cat.snapshot("t").version
    cat.write_to_table(
        spark.createDataFrame([("a", 0, 999)], "cat string, k long, v int"),
        "t",
        mode="merge",
    )
    v1 = cat.snapshot("t").version
    cat.optimize_table("t", partition_filter={"cat": "a"})
    changes = cat.read_changes("t", from_version=v0).collect()
    assert {r._commit_version for r in changes} == {v1}
    assert all(r._change_type == DeltaType.UPSERT for r in changes)


def test_autocompaction_scopes_to_touched_partition(spark, tmp_path):
    """Reference parity: compaction triggers per WRITE TARGET — appends
    landing only in partition a must auto-compact a alone, leaving b/c
    files untouched by reference."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table(
        "t",
        schema=SCHEMA_PLAIN,
        partition_scheme=[PartitionKey("cat")],
        properties={"compaction.trigger.deltas": 3},
    )
    # seed all three partitions, then compact so the trigger window resets
    cat.write_to_table(
        spark.createDataFrame(
            [("abc"[j % 3], j, j) for j in range(9)],
            "cat string, k long, v int",
        ),
        "t",
        mode="append",
    )
    cat.optimize_table("t")
    before_b = _paths(cat, part="b")
    # hot partition: three appends to a trip the threshold
    for i in range(3):
        cat.write_to_table(
            spark.createDataFrame(
                [("a", 100 + i, i)], "cat string, k long, v int"
            ),
            "t",
            mode="append",
        )
    snap = cat.snapshot("t")
    last = snap.commits[-1]
    assert last.operation == "OPTIMIZE"
    m = last.metrics or {}
    assert m["mode"] == "partition-incremental"
    assert m["partition_filter"] == {"cat": ["a"]}
    assert _paths(cat, part="b") == before_b
    assert cat.read_table("t").count() == 12


def test_shallow_clone_survives_source_scoped_optimize(spark, tmp_path):
    """A shallow clone references the source's files by path; a scoped
    OPTIMIZE on the source must not change what the clone reads, and
    source-side vacuum must keep the clone's pinned files."""
    import os

    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    cat.write_to_table(
        spark.createDataFrame([("a", 0, 999)], "cat string, k long, v int"),
        "t",
        mode="merge",
    )
    cat.clone_table("t", "snap_clone")
    before = sorted(
        (r.cat, r.k, r.v)
        for r in cat.read_table("snap_clone").select("cat", "k", "v").collect()
    )
    cat.optimize_table("t", partition_filter={"cat": "a"})
    cat.vacuum("t", min_age_seconds=0, retain_versions=0)
    after = sorted(
        (r.cat, r.k, r.v)
        for r in cat.read_table("snap_clone").select("cat", "k", "v").collect()
    )
    assert after == before == _content(cat)


def test_restore_across_scoped_optimize(spark, tmp_path):
    """RESTORE to a pre-scoped-optimize version reads the exact old
    state; a subsequent scoped optimize still works."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    pre = cat.snapshot("t").version
    before = _content(cat)
    cat.write_to_table(
        spark.createDataFrame([("a", 0, 999)], "cat string, k long, v int"),
        "t",
        mode="merge",
    )
    cat.optimize_table("t", partition_filter={"cat": "a"})
    cat.restore_table("t", version=pre)
    assert _content(cat) == before
    cat.optimize_table("t", partition_filter={"cat": "b"})
    assert _content(cat) == before


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 19, 41])
def test_random_programs_scoped_equals_full(spark, tmp_path, seed):
    """Property: for random merge/delete programs on a partitioned keyed
    MoR table, scoped-optimize(any partition) and full-optimize produce
    identical table content."""
    import random

    rng = random.Random(seed)
    ops = []
    serial = 0
    for _ in range(6):
        if rng.random() < 0.7:
            rows = []
            for _ in range(rng.randint(1, 4)):
                serial += 1
                rows.append(("abc"[rng.randrange(3)], rng.randrange(12), serial))
            ops.append(("merge", rows, "cat string, k long, v int"))
        else:
            ops.append(
                (
                    "delete",
                    [("abc"[rng.randrange(3)], rng.randrange(12))],
                    "cat string, k long",
                )
            )
    cats = []
    for tag in ("sc", "fu"):
        c = _mk(spark, tmp_path / f"{tag}{seed}", SCHEMA_KEYED)
        for mode, rows, ddl in ops:
            c.write_to_table(spark.createDataFrame(rows, ddl), "t", mode=mode)
        cats.append(c)
    target = "abc"[seed % 3]
    cats[0].optimize_table("t", partition_filter={"cat": target})
    cats[1].optimize_table("t")
    assert _content(cats[0]) == _content(cats[1])
    assert _last_metrics(cats[0])["mode"] == "partition"


def test_partition_filter_requires_partitioned_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t", schema=SCHEMA_PLAIN)
    cat.write_to_table(
        spark.createDataFrame([("a", 1, 1)], "cat string, k long, v int"),
        "t",
        mode="append",
    )
    with pytest.raises(ValueError, match="partitioned"):
        cat.optimize_table("t", partition_filter={"cat": "a"})


def test_optimize_retries_after_commit_conflict(spark, tmp_path, monkeypatch):
    """A concurrent writer landing mid-compaction surfaces as
    CommitConflictError from the commit; optimize_table must recompute
    from the fresh snapshot and succeed."""
    from deltacat_spark.storage.commit import CommitConflictError

    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    real = Catalog._optimize_once
    calls = {"n": 0}

    def flaky(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # concurrent append lands, then the commit slot is taken
            cat.write_to_table(
                spark.createDataFrame(
                    [("b", 500, 1)], "cat string, k long, v int"
                ),
                "t",
                mode="merge",
            )
            raise CommitConflictError("version taken by a concurrent writer")
        return real(self, *a, **kw)

    monkeypatch.setattr(Catalog, "_optimize_once", flaky)
    cat.optimize_table("t")
    assert calls["n"] == 2
    assert (b"", 500, 1) not in _content(cat)  # sanity: content resolved
    assert ("b", 500, 1) in _content(cat)
    snap = cat.snapshot("t")
    assert snap.commits[-1].operation == "OPTIMIZE"


def test_concurrent_disjoint_scoped_optimize_rebases(spark, tmp_path, monkeypatch):
    """Directive r6→r7: two scoped OPTIMIZEs on disjoint partitions must
    both commit with the LOSER rebasing (same actions, bumped version)
    instead of recomputing the whole compaction job."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    # make both partitions hot so each scope has something to fold
    upd = spark.createDataFrame(
        [("a", 0, 999), ("b", 1, 888)], "cat string, k long, v int"
    )
    cat.write_to_table(upd, "t", mode="merge")
    expected = _content(cat)
    stale = cat.snapshot("t")

    # A wins: scoped OPTIMIZE on partition "a"
    cat.optimize_table("t", partition_filter={"cat": "a"})
    v_after_a = cat.snapshot("t").version

    # B computed against the STALE pre-A snapshot → version collision
    orig_snapshot = Catalog.snapshot
    state = {"served_stale": False}

    def stale_once(self, table, namespace="default", *a, **kw):
        if not state["served_stale"] and not a and not kw:
            state["served_stale"] = True
            return stale
        return orig_snapshot(self, table, namespace, *a, **kw)

    monkeypatch.setattr(Catalog, "snapshot", stale_once)
    compute_calls = {"n": 0}
    orig_once = Catalog._optimize_once

    def counting_once(self, *a, **kw):
        compute_calls["n"] += 1
        return orig_once(self, *a, **kw)

    monkeypatch.setattr(Catalog, "_optimize_once", counting_once)
    cat.optimize_table("t", partition_filter={"cat": "b"})
    assert compute_calls["n"] == 1, "disjoint scopes must rebase, not recompute"
    snap = cat.snapshot("t")
    assert snap.version == v_after_a + 1  # rebased past A's commit
    assert _content(cat) == expected
    m = _last_metrics(cat)
    assert m["mode"] == "partition" and m["partition_filter"] == {"cat": "b"}


def test_concurrent_overlapping_scoped_optimize_recomputes(
    spark, tmp_path, monkeypatch
):
    """Same collision but on the SAME partition: the loser must take the
    recompute path (correctness first), and content stays right."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED)
    upd = spark.createDataFrame([("a", 0, 999)], "cat string, k long, v int")
    cat.write_to_table(upd, "t", mode="merge")
    expected = _content(cat)
    stale = cat.snapshot("t")
    cat.optimize_table("t", partition_filter={"cat": "a"})

    orig_snapshot = Catalog.snapshot
    state = {"served_stale": False}

    def stale_once(self, table, namespace="default", *a, **kw):
        if not state["served_stale"] and not a and not kw:
            state["served_stale"] = True
            return stale
        return orig_snapshot(self, table, namespace, *a, **kw)

    monkeypatch.setattr(Catalog, "snapshot", stale_once)
    compute_calls = {"n": 0}
    orig_once = Catalog._optimize_once

    def counting_once(self, *a, **kw):
        compute_calls["n"] += 1
        return orig_once(self, *a, **kw)

    monkeypatch.setattr(Catalog, "_optimize_once", counting_once)
    cat.optimize_table("t", partition_filter={"cat": "a"})
    assert compute_calls["n"] == 2, "overlapping scopes must recompute"
    assert _content(cat) == expected


def test_scope_disjointness_predicate():
    from deltacat_spark.catalog.catalog import _partition_scopes_disjoint as d

    assert d({"cat": "a"}, {"cat": "b"})
    assert d({"cat": ["a", "c"]}, {"cat": ["b"]})
    assert not d({"cat": "a"}, {"cat": ["a", "b"]})
    assert not d({"cat": "a"}, {"region": "x"})  # different columns: unprovable
    assert d({"cat": "a", "day": "1"}, {"cat": "a", "day": "2"})  # one column suffices
    assert not d({}, {"cat": "a"})


def test_partition_scoped_zorder(spark, tmp_path):
    """ZORDER composed with a partition scope: only the scoped
    partition's files are re-laid-out; every other path stays
    byte-identical in the log."""
    cat = _mk(spark, tmp_path, SCHEMA_KEYED, props={})
    # spread partition "a" over several files with two clusterable dims
    extra = spark.createDataFrame(
        [("a", 100 + i, (i * 37) % 50) for i in range(60)],
        "cat string, k long, v int",
    ).repartition(6)
    cat.write_to_table(extra, "t", mode="merge")
    before_b = _paths(cat, part="b")
    before_content = _content(cat)
    cat.optimize_table(
        "t", partition_filter={"cat": "a"}, zorder_by=["k", "v"]
    )
    m = _last_metrics(cat)
    assert m["mode"] == "partition-zorder"
    assert m["zorder_by"] == ["k", "v"]
    assert _paths(cat, part="b") == before_b  # out-of-scope untouched
    assert _content(cat) == before_content
    # z-layout serves BOTH columns: a v-predicate prunes files within
    # the scoped partition even though v is not the leading sort key
    snap = cat.snapshot("t")
    a_files = [
        f
        for f in snap.files
        if f.partition_values and f.partition_values.get("cat") == "a"
    ]
    if len(a_files) > 1:
        kept = snap.prune({"cat": "a"}, [("v", "=", 3)])
        assert len(kept) < len(a_files)
