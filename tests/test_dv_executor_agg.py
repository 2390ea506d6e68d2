"""Predicate DV deletes aggregate bitmaps ON EXECUTORS (r15).

The r14 verdict flagged `delete_where_dv` / `delete_rows_with_dv` as the
repo's one 100x-unsafe shape: they collected every matched row position
to the driver. Both now fold per-file positions (plus the file's
existing DV) into serialized roaring64 bitmaps inside applyInPandas
groups, and the driver receives only (path, bitmap_bytes, cardinality)
— O(touched files). These tests pin that contract: the driver-side
commit consumes pre-serialized bitmaps (the position-list encoder is
never called on the predicate path), and results stay identical.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import deltadv, puffin
from deltacat_spark.sources.deltalake import (
    delete_rows_with_dv,
    read_delta,
    write_delta,
)
from deltacat_spark.sources.iceberg import (
    delete_where_dv,
    read_iceberg,
    upgrade_iceberg_v2_to_v3,
    write_iceberg,
)


def test_iceberg_delete_where_dv_driver_sees_bitmaps(spark, monkeypatch):
    root = tempfile.mkdtemp(prefix="ice_dv_exec_")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_iceberg(df.filter("k < 100"), root)
    write_iceberg(df.filter("k >= 100"), root, mode="append")
    upgrade_iceberg_v2_to_v3(root)

    captured: dict = {}
    from deltacat_spark.sources import iceberg as ice_mod

    orig = ice_mod.commit_deletion_vectors

    def spy(root_, positions_by_file=None, bitmaps_by_file=None):
        captured["positions"] = positions_by_file
        captured["bitmaps"] = bitmaps_by_file
        return orig(
            root_,
            positions_by_file=positions_by_file,
            bitmaps_by_file=bitmaps_by_file,
        )

    monkeypatch.setattr(ice_mod, "commit_deletion_vectors", spy)
    # the position-list encoder must never run on the predicate path
    monkeypatch.setattr(
        puffin,
        "dv_blob_encode",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver encoded a position list")
        ),
    )
    assert delete_where_dv(spark, root, "k % 2 = 0") is not None

    assert captured["positions"] is None
    bms = captured["bitmaps"]
    # one entry per touched data file, each a (serialized bitmap,
    # cardinality) pair — never a position list
    from deltacat_spark.sources.iceberg import IcebergTable

    data, _ = IcebergTable(root).live_files()
    assert bms is not None and len(bms) == len(data)
    assert sum(card for _, card in bms.values()) == 100
    for bm, card in bms.values():
        assert isinstance(bm, bytes)
        assert len(deltadv.roaring64_deserialize(bm)) == card

    left = read_iceberg(spark, root).select("k").collect()
    assert sorted(r["k"] for r in left) == [
        i for i in range(200) if i % 2 == 1
    ]


def test_iceberg_delete_where_dv_folds_existing_dv(spark):
    root = tempfile.mkdtemp(prefix="ice_dv_fold_")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_iceberg(df, root)
    upgrade_iceberg_v2_to_v3(root)
    assert delete_where_dv(spark, root, "k < 10") is not None
    assert delete_where_dv(spark, root, "k >= 90") is not None
    left = sorted(
        r["k"] for r in read_iceberg(spark, root).select("k").collect()
    )
    assert left == list(range(10, 90))


def test_delta_delete_rows_with_dv_driver_sees_bitmaps(spark, monkeypatch):
    root = tempfile.mkdtemp(prefix="delta_dv_exec_")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_delta(df.filter("k < 100"), root)
    write_delta(df.filter("k >= 100"), root)
    monkeypatch.setattr(
        deltadv,
        "dv_blob_encode",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver encoded a position list")
        ),
    )
    assert delete_rows_with_dv(spark, root, "k % 2 = 0") is not None
    left = sorted(
        r["k"] for r in read_delta(spark, root).select("k").collect()
    )
    assert left == [i for i in range(200) if i % 2 == 1]
    # second delete folds the existing DV executor-side
    assert delete_rows_with_dv(spark, root, "k < 50") is not None
    left = sorted(
        r["k"] for r in read_delta(spark, root).select("k").collect()
    )
    assert left == [i for i in range(50, 200) if i % 2 == 1]


def test_delta_fully_deleted_file_is_removed(spark):
    root = tempfile.mkdtemp(prefix="delta_dv_full_")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_delta(df.filter("k < 50"), root)
    write_delta(df.filter("k >= 50"), root)
    # every row of the first file matches -> plain remove, no DV
    assert delete_rows_with_dv(spark, root, "k < 50") is not None
    left = sorted(
        r["k"] for r in read_delta(spark, root).select("k").collect()
    )
    assert left == list(range(50, 100))
    dv_files = [
        f
        for f in os.listdir(root)
        if f.startswith("deletion_vector_")
    ]
    assert dv_files == []
