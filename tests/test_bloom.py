"""Per-file bloom point-lookup skipping (`storage/bloom.py`).

The reference's primary-key index (`utils/primary_key_index.py` — key
digests bucketed so point reads don't touch every file) re-expressed as
per-file bloom sidecars + driver-side prune. Properties under test:

* no false negatives — every written key must probe "maybe present"
  (this is also the Spark-md5/conv vs Python-hashlib cross-side hash
  agreement check; a mismatch would silently skip live data),
* real skipping — a point lookup on a multi-file table scans a strict
  subset of files, and reads stay correct,
* safe degradation — a missing sidecar keeps the file,
* lifecycle — OPTIMIZE output regains blooms; vacuum reclaims sidecars
  with their data files.
"""

import json

import pytest
from pyspark.sql import types as T

from deltacat_spark.plans.expr import col
from deltacat_spark.schema import Field, Schema
from deltacat_spark.storage.bloom import bloom_m, probe, sidecar_relpath


def _val(i: int) -> str:
    # a permutation of the key space: val is NOT correlated with the
    # merge-sort order, so every file's val min/max spans nearly the
    # whole domain and footer stats cannot prune val lookups — exactly
    # the secondary-column case blooms exist for.
    return f"u{(i * 37) % 200:03d}"


def _mk(catalog, spark, n=200, files_hint=8):
    catalog.create_table(
        "pk",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("val", T.StringType()),
            ]
        ),
        properties={
            "bloom_filter_columns": "id,val",
            "max_records_per_file": n // files_hint,
        },
    )
    # even ids only: an odd id inside a file's [min, max] range survives
    # stats skipping but not the bloom.
    df = spark.createDataFrame(
        [(2 * i, _val(i)) for i in range(n)], "id long, val string"
    ).repartition(4)
    catalog.write_to_table(df, "pk", mode="merge")


def test_bloom_m_sizing():
    assert bloom_m(0) == 1 << 10
    assert bloom_m(100) == 1 << 10
    assert bloom_m(1000) == 8192
    assert bloom_m(10**9) == 1 << 23  # capped


def test_no_false_negatives_and_skipping(spark, catalog):
    _mk(catalog, spark)
    snap = catalog.snapshot("pk")
    data_files = [f for f in snap.files if f.bloom_ref]
    assert len(data_files) >= 4, "need a multi-file table to test pruning"
    # every live key must survive its own point-lookup prune (no false
    # negatives anywhere in the hash pipeline), on the sort key AND the
    # unsorted secondary column
    for i in range(0, 200, 17):
        kept = snap.prune(None, [("id", "=", 2 * i)], fs=catalog.fs)
        assert kept, f"bloom false negative for id={2 * i}"
        out = catalog.read_table("pk", predicate=col("id").eq(2 * i))
        assert [r.val for r in out.collect()] == [_val(i)]
        kept_v = snap.prune(None, [("val", "=", _val(i))], fs=catalog.fs)
        assert kept_v, f"bloom false negative for val={_val(i)}"
    # secondary-column lookups: footer stats can't prune (every file's
    # val range spans the domain — asserted) but the bloom can.
    for f in data_files:
        st = (f.stats or {}).get("val") or {}
        assert st.get("min", "u000") <= "u050" <= st.get("max", "u199"), (
            "test premise broken: val ranges no longer overlap"
        )
    kept_counts = [
        len(snap.prune(None, [("val", "=", _val(i))], fs=catalog.fs))
        for i in range(0, 200, 29)
    ]
    assert max(kept_counts) < len(data_files)
    # absent-but-in-range keys (odd ids): stats keep a file, blooms drop
    # it — usually to zero (rare false positives allowed)
    absent = [
        len(snap.prune(None, [("id", "=", k)], fs=catalog.fs))
        for k in range(1, 40, 2)
    ]
    assert sum(absent) <= 4, f"absent-key FPR implausibly high: {absent}"


def test_missing_sidecar_degrades_to_full_scan(spark, catalog):
    _mk(catalog, spark)
    snap = catalog.snapshot("pk")
    troot = snap.table_root
    for f in snap.files:
        if f.bloom_ref:
            catalog.fs.delete(catalog.fs.join(troot, f.bloom_ref))
    snap2 = catalog.snapshot("pk")
    # a secondary-column lookup now keeps every file the FOOTER STATS
    # admit — with sidecars gone, NOTHING may be dropped on bloom
    # evidence (degraded, never wrong). Stats may still legitimately
    # prune a file whose val range misses the probe (the write layout
    # decides that), so assert drop-evidence, not a fixed count.
    kept = snap2.prune(None, [("val", "=", _val(3))], fs=catalog.fs)
    kept_paths = {f.path for f in kept}
    probe_val = _val(3)
    n_data = 0
    for f in snap2.files:
        if not f.bloom_ref:
            continue
        n_data += 1
        st = (f.stats or {}).get("val")
        if f.path in kept_paths:
            continue
        # every dropped file must be PROVEN absent by its stats alone
        assert st and not (st["min"] <= probe_val <= st["max"]), (
            f"{f.path} dropped without stats evidence (bloom sidecar "
            "missing — must degrade to keep)"
        )
    assert len(kept) >= n_data - 2  # layout noise, still ~full scan
    out = catalog.read_table("pk", predicate=col("id").eq(6))
    assert out.count() == 1


def test_sidecar_format_probe_roundtrip(spark, catalog):
    _mk(catalog, spark, n=60, files_hint=3)
    snap = catalog.snapshot("pk")
    f = next(f for f in snap.files if f.bloom_ref)
    sidecar = json.loads(
        catalog.fs.read_text(catalog.fs.join(snap.table_root, f.bloom_ref))
    )
    assert set(sidecar) == {"id", "val"}
    assert sidecar["id"]["k"] == 4
    # the file's own rows all probe positive via the pure-Python side
    rows = (
        spark.read.parquet(f.abs_path(snap.table_root))
        .select("id")
        .collect()
    )
    assert rows
    for r in rows:
        assert probe(sidecar, "id", r.id)


def test_optimize_rewrites_blooms(spark, catalog):
    _mk(catalog, spark)
    catalog.optimize_table("pk")
    snap = catalog.snapshot("pk")
    live = [f for f in snap.files if f.delta_type is None or f.delta_type == "append"]
    assert all(f.bloom_ref for f in snap.files if f.records), (
        "OPTIMIZE output lost bloom sidecars"
    )
    out = catalog.read_table("pk", predicate=col("id").eq(14))
    assert [r.val for r in out.collect()] == [_val(7)]


def test_vacuum_reclaims_sidecars(spark, catalog):
    _mk(catalog, spark)
    snap_before = catalog.snapshot("pk")
    old_refs = [f.bloom_ref for f in snap_before.files if f.bloom_ref]
    catalog.optimize_table("pk")  # supersedes the original files
    report = catalog.vacuum("pk", retain_versions=0, min_age_seconds=0)
    assert int(report) > 0
    troot = snap_before.table_root
    gone = [
        ref
        for ref in old_refs
        if not catalog.fs.exists(catalog.fs.join(troot, ref))
    ]
    assert gone, "vacuum removed data files but left every bloom sidecar"
    # live files keep theirs
    for f in catalog.snapshot("pk").files:
        if f.bloom_ref:
            assert catalog.fs.exists(catalog.fs.join(troot, f.bloom_ref))


def test_sidecar_relpath_flattens():
    assert (
        sidecar_relpath("data/abc/part-0.parquet")
        == "_bloom/data_abc_part-0.parquet.json"
    )


def test_mor_deltas_carry_blooms_and_prune(spark, catalog):
    """Cross-feature: MoR upsert deltas get blooms too (the `_write`
    funnel covers every delta write), so a point lookup prunes base AND
    delta files before the merge-on-read fold."""
    catalog.create_table(
        "pkm",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("val", T.StringType()),
            ]
        ),
        properties={
            "bloom_filter_columns": "id,val",
            "max_records_per_file": 25,
            "read_optimization": "none",  # MoR
        },
    )
    base = spark.createDataFrame(
        [(2 * i, _val(i)) for i in range(100)], "id long, val string"
    )
    catalog.write_to_table(base, "pkm", mode="merge")
    for lo in (0, 50):  # two upsert deltas, unresolved under MoR
        delta = spark.createDataFrame(
            [(2 * i, f"n{i}") for i in range(lo, lo + 25)],
            "id long, val string",
        )
        catalog.write_to_table(delta, "pkm", mode="merge")
    snap = catalog.snapshot("pkm")
    delta_files = [f for f in snap.files if f.delta_type == "UPSERT"]
    assert delta_files and all(f.bloom_ref for f in delta_files)
    # bloom mechanics: a MERGE-KEY point lookup prunes files under MoR
    # (a key never moves between files' key sets), and the fold over
    # the kept subset still resolves the newest version
    kept = snap.prune(None, [("id", "=", 14)], fs=catalog.fs)
    assert len(kept) < len(snap.files)
    out2 = catalog.read_table("pkm", predicate=col("id").eq(14))
    assert [r.val for r in out2.collect()] == ["n7"]
    # non-key predicate + unresolved deltas: skipping is UNSOUND and
    # read_table must not apply it — a val lookup still answers through
    # the full fold
    out = catalog.read_table("pkm", predicate=col("val").eq("n7"))
    assert [(r.id, r.val) for r in out.collect()] == [(14, "n7")]


def test_mor_nonkey_predicate_never_leaks_stale_rows(spark, catalog):
    """Regression (pre-bloom bug): stats/bloom skipping on a NON-key
    column under unresolved MoR deltas pruned the upsert delta that
    rewrote the value while keeping the base file — leaking the stale
    row through the fold. A lookup of the OLD value must return empty."""
    catalog.create_table(
        "pks",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("val", T.StringType()),
            ]
        ),
        properties={
            "bloom_filter_columns": "id,val",
            "max_records_per_file": 10,
            "read_optimization": "none",
        },
    )
    base = spark.createDataFrame(
        [(i, f"old{i}") for i in range(30)], "id long, val string"
    )
    catalog.write_to_table(base, "pks", mode="merge")
    upd = spark.createDataFrame(
        [(i, f"zz{i}") for i in range(30)], "id long, val string"
    )
    catalog.write_to_table(upd, "pks", mode="merge")
    snap = catalog.snapshot("pks")
    assert any(f.delta_type == "UPSERT" for f in snap.files)
    # old values are gone — stats on the delta files ("zz...") exclude
    # "old7", so naive pruning would keep only the base file and answer
    # with the superseded row
    out = catalog.read_table("pks", predicate=col("val").eq("old7"))
    assert out.count() == 0
    out2 = catalog.read_table("pks", predicate=col("val").eq("zz7"))
    assert [(r.id, r.val) for r in out2.collect()] == [(7, "zz7")]
    # after OPTIMIZE (deltas folded) non-key skipping is sound again
    catalog.optimize_table("pks")
    snap2 = catalog.snapshot("pks")
    kept = snap2.prune(None, [("val", "=", "zz7")], fs=catalog.fs)
    assert len(kept) <= len(snap2.files)
    assert catalog.read_table(
        "pks", predicate=col("val").eq("old7")
    ).count() == 0


def test_partition_filter_mor_move_no_stale_rows(spark, catalog):
    """Cross-partition-capable upsert (partition col not a merge key)
    under MoR: a partition_filter read must never surface the
    superseded copy from the old partition. Conservative-extra CURRENT
    rows are allowed (documented contract); stale ones are not."""
    from deltacat_spark.plans.transforms import PartitionKey

    catalog.create_table(
        "pmove",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("part", T.StringType()),
                Field("val", T.StringType()),
            ]
        ),
        partition_scheme=[PartitionKey("part")],
        properties={"read_optimization": "none"},
    )
    base = spark.createDataFrame(
        [(i, "A" if i < 5 else "B", f"v{i}") for i in range(10)],
        "id long, part string, val string",
    )
    catalog.write_to_table(base, "pmove", mode="merge")
    # move id=3 from partition A to B (and change its value)
    mv = spark.createDataFrame(
        [(3, "B", "moved")], "id long, part string, val string"
    )
    catalog.write_to_table(mv, "pmove", mode="merge")
    snap = catalog.snapshot("pmove")
    assert any(f.delta_type == "UPSERT" for f in snap.files)
    rows = {
        r.id: (r.part, r.val)
        for r in catalog.read_table(
            "pmove", partition_filter={"part": "A"}
        ).collect()
    }
    # the old (3, A, v3) row must NOT appear; its current version may
    # (conservative superset), but only with the new values
    assert rows.get(3) in (None, ("B", "moved")), f"stale row leaked: {rows.get(3)}"
    for i in range(5):
        if i != 3:
            assert rows[i] == ("A", f"v{i}")


@pytest.mark.slow
def test_randomized_point_lookups_match_model(spark, catalog):
    """Model-based: a randomized mixed write program on a bloom table,
    then every live and absent key's point lookup must match the dict
    model — across CoW rewrites, MoR deltas, and OPTIMIZE."""
    import random

    rng = random.Random(0xB100)
    for ro in ("max", "none"):
        name = f"rpl_{ro}"
        catalog.create_table(
            name,
            schema=Schema(
                [
                    Field("id", T.LongType(), merge_key=True),
                    Field("val", T.StringType()),
                ]
            ),
            properties={
                "bloom_filter_columns": "id,val",
                "max_records_per_file": 20,
                "read_optimization": ro,
            },
        )
        model: dict[int, str] = {}
        for step in range(6):
            op = rng.choice(["merge", "merge", "delete"])
            ids = rng.sample(range(100), rng.randint(5, 30))
            if op == "merge":
                rows = [(i, f"s{step}_{i}") for i in ids]
                catalog.write_to_table(
                    spark.createDataFrame(rows, "id long, val string"),
                    name,
                    mode="merge",
                )
                model.update({i: v for i, v in rows})
            else:
                present = [i for i in ids if i in model]
                if not present:
                    continue
                catalog.write_to_table(
                    spark.createDataFrame(
                        [(i,) for i in present], "id long"
                    ),
                    name,
                    mode="delete",
                )
                for i in present:
                    model.pop(i)
            if step == 3:
                catalog.optimize_table(name)
        # point lookups on the sort key and the mutable column
        probe_ids = rng.sample(range(120), 25)
        for i in probe_ids:
            got = [
                r.val
                for r in catalog.read_table(
                    name, predicate=col("id").eq(i)
                ).collect()
            ]
            want = [model[i]] if i in model else []
            assert got == want, f"{ro}: id={i} got {got} want {want}"
        # value lookups (non-key): full correctness incl. MoR guard
        vals = rng.sample(sorted(model.items()), min(5, len(model)))
        for i, v in vals:
            got = [
                (r.id, r.val)
                for r in catalog.read_table(
                    name, predicate=col("val").eq(v)
                ).collect()
            ]
            assert got == [(i, v)], f"{ro}: val={v} got {got}"


def test_bloom_ref_survives_checkpoint(spark, catalog):
    """Checkpoint-accelerated snapshots must carry bloom_ref (to_state/
    from_state round-trip) — losing it silently disables skipping."""
    catalog.create_table(
        "pkc",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("val", T.StringType()),
            ]
        ),
        properties={
            "bloom_filter_columns": "id",
            "checkpoint.interval": 3,
            "compaction.trigger.deltas": 10**9,
        },
    )
    for lo in range(0, 80, 20):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 20)], "id long, val string"
        )
        catalog.write_to_table(df, "pkc", mode="merge")
    from deltacat_spark.storage.commit import CommitLog

    log = CommitLog(catalog._table_root("pkc", "default"), fs=catalog.fs)
    snap = catalog.snapshot("pkc")  # checkpoint-accelerated path
    assert log.checkpoints(), "expected a checkpoint after 4 commits"
    with_bloom = [f for f in snap.files if f.bloom_ref]
    assert with_bloom, "bloom_ref lost through checkpoint state"
    kept = snap.prune(None, [("id", "=", 5)], fs=catalog.fs)
    assert 0 < len(kept) < len(with_bloom) + 1


def test_bloom_failure_does_not_fail_commit(spark, catalog, monkeypatch):
    """Blooms are an optimization: if the bloom pass blows up, the write
    must still commit (files just carry no bloom_ref)."""
    import deltacat_spark.storage.bloom as bloom_mod

    def boom(*a, **k):
        raise RuntimeError("injected bloom failure")

    monkeypatch.setattr(bloom_mod, "attach_blooms", boom)
    catalog.create_table(
        "pkf",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("val", T.StringType()),
            ]
        ),
        properties={"bloom_filter_columns": "id"},
    )
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    )
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        catalog.write_to_table(df, "pkf", mode="merge")
    assert any("bloom filter pass failed" in str(x.message) for x in w)
    snap = catalog.snapshot("pkf")
    assert all(f.bloom_ref is None for f in snap.files)
    assert catalog.read_table("pkf", predicate=col("id").eq(4)).count() == 1


def test_typed_literal_normalization(spark, catalog):
    """ADVICE r6: a numerically-equal but differently-typed literal
    (5.0 against a bigint column) must not fail every probe and skip
    files min/max stats would keep."""
    _mk(catalog, spark)
    snap = catalog.snapshot("pk")
    all_files = [f for f in snap.files if f.bloom_ref]
    # float literal against the bigint key: same files as the int probe
    for i in (0, 34, 170):
        kept_int = snap.prune(None, [("id", "=", i)], fs=catalog.fs)
        kept_float = snap.prune(None, [("id", "=", float(i))], fs=catalog.fs)
        assert {f.path for f in kept_float} == {f.path for f in kept_int}
        assert kept_float, f"typed-literal false negative for id={i}.0"
    # string-typed integral literal too
    kept_str = snap.prune(None, [("id", "=", "68")], fs=catalog.fs)
    kept_ref = snap.prune(None, [("id", "=", 68)], fs=catalog.fs)
    assert {f.path for f in kept_str} == {f.path for f in kept_ref}
    # non-integral float: min/max stats prune numerically (valid), but
    # the BLOOM must keep whatever stats kept — any file whose [lo, hi]
    # straddles 68.5 survives (bloom returns "maybe", never a skip)
    kept = snap.prune(None, [("id", "=", 68.5)], fs=catalog.fs)
    stats_kept = {
        f.path
        for f in all_files
        if f.stats
        and f.stats.get("id")
        and f.stats["id"]["min"] <= 68.5 <= f.stats["id"]["max"]
    }
    assert {f.path for f in kept} == stats_kept


def test_probe_candidates_unit():
    from deltacat_spark.storage.bloom import _probe_candidates

    assert _probe_candidates(5, "int") == ["5"]
    assert _probe_candidates(5.0, "int") == ["5"]
    assert _probe_candidates(5.5, "int") is None
    assert _probe_candidates(" 7 ", "int") == ["7"]
    assert _probe_candidates("abc", "int") is None
    assert _probe_candidates(True, "int") is None
    assert _probe_candidates("abc", "str") == ["abc"]
    assert "5" in _probe_candidates(5.0, "str")
    # legacy sidecar (no recorded kind): both forms probed
    assert set(_probe_candidates(5.0, None)) == {"5.0", "5"}
