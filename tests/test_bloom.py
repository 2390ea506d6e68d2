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
    # a secondary-column lookup that blooms would have pruned now keeps
    # every file (stats can't help on val) — degraded, never wrong
    kept = snap2.prune(None, [("val", "=", _val(3))], fs=catalog.fs)
    assert len(kept) == len([f for f in snap2.files if f.bloom_ref])
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
