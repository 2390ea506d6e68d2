"""Pin the `_resolve_mor` base/delta split (r15 optimization): when the
live files are a resolved base plus small deltas, untouched base rows
bypass the fold window via a broadcast anti-join on the delta keys. The
split must be result-identical to the single-window fold — including
under a custom merge_order where an OLD base row beats a NEWER delta
row (the case that would break any plan that takes deltas at face
value)."""

import pytest
from pyspark.sql import types as T

import deltacat_spark.catalog.catalog as cat_mod
from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType(), merge_key=True),
        Field("ts", T.LongType(), merge_order=("desc", "last")),
        Field("val", T.StringType()),
    ]
)


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, ts long, val string")


def _build(spark, root):
    """Resolved base (compaction output) + one small merge delta."""
    c = Catalog(spark, root)
    c.create_table(
        "t", schema=SCHEMA, properties={"read_optimization": "none"}
    )
    c.write_to_table(
        _rows(spark, [(i, 100, f"base{i}") for i in range(50)]),
        "t",
        mode="merge",
    )
    c.optimize_table("t")  # fold -> resolved files (delta_type None)
    # delta: newer arrival, but ids 0..4 carry an OLDER ts than the
    # base (merge_order desc on ts -> base must win for those), ids
    # 5..9 a newer ts (delta wins), id 60 is brand new
    c.write_to_table(
        _rows(
            spark,
            [(i, 50, f"stale{i}") for i in range(5)]
            + [(i, 200, f"fresh{i}") for i in range(5, 10)]
            + [(60, 100, "new60")],
        ),
        "t",
        mode="merge",
    )
    return c


def _snap_kinds(c):
    snap = c.snapshot("t")
    return (
        sum(1 for f in snap.files if f.delta_type is None),
        sum(1 for f in snap.files if f.delta_type == "UPSERT"),
    )


def test_split_fires_and_matches_window_fold(spark, tmp_path, monkeypatch):
    c = _build(spark, str(tmp_path / "cat"))
    n_base, n_delta = _snap_kinds(c)
    assert n_base >= 1 and n_delta >= 1, "fixture must be base+delta"

    def result(ratio):
        monkeypatch.setattr(cat_mod, "_MOR_SPLIT_MIN_RATIO", ratio)
        return {
            r.id: (r.ts, r.val) for r in c.read_table("t").collect()
        }

    split = result(1)  # 50 base rows vs 11 delta rows -> split fires
    window = result(10**9)  # unreachable ratio -> single-window fold
    assert split == window
    # merge_order semantics: old-ts delta rows LOSE to the base
    for i in range(5):
        assert split[i] == (100, f"base{i}")
    for i in range(5, 10):
        assert split[i] == (200, f"fresh{i}")
    assert split[60] == (100, "new60")
    assert len(split) == 51


def test_split_respects_delete_deltas(spark, tmp_path, monkeypatch):
    c = _build(spark, str(tmp_path / "cat"))
    c.write_to_table(
        _rows(spark, [(1, 300, None), (60, 300, None)]).select("id"),
        "t",
        mode="delete",
    )

    def result(ratio):
        monkeypatch.setattr(cat_mod, "_MOR_SPLIT_MIN_RATIO", ratio)
        return {
            r.id: (r.ts, r.val) for r in c.read_table("t").collect()
        }

    split = result(1)
    window = result(10**9)
    assert split == window
    assert 1 not in split and 60 not in split
    assert len(split) == 49


def test_no_resolved_base_falls_back(spark, tmp_path):
    """Delta-only table (no compaction yet): the split cannot prove
    base-key uniqueness and must take the plain window fold."""
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_table(
        "t", schema=SCHEMA, properties={"read_optimization": "none"}
    )
    c.write_to_table(
        _rows(spark, [(1, 100, "a"), (2, 100, "b")]), "t", mode="merge"
    )
    c.write_to_table(_rows(spark, [(2, 200, "B")]), "t", mode="merge")
    m = {r.id: r.val for r in c.read_table("t").collect()}
    assert m == {1: "a", 2: "B"}
