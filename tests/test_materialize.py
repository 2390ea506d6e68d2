"""Incremental materialized-view maintenance
(`catalog/materialize.py:refresh_incremental`): O(new-data) refreshes,
atomic watermark, rebuild fallback on non-append source commits."""

from pyspark.sql import functions as F

from deltacat_spark.catalog.materialize import MV_SRC_VERSION, refresh_incremental
from deltacat_spark.schema import Field, Schema
from pyspark.sql import types as T


def _transform(df):
    return df.filter(F.col("v") % 2 == 0).withColumn("vv", F.col("v") * 10)


def _rows(spark, lo, hi):
    return spark.createDataFrame([(i, i) for i in range(lo, hi)], "id long, v long")


def _expected(catalog):
    return sorted(
        (r.id, r.v, r.vv)
        for r in _transform(catalog.read_table("src")).collect()
    )


def test_bootstrap_then_incremental(spark, catalog):
    catalog.write_to_table(_rows(spark, 0, 10), "src", mode="auto")
    info = refresh_incremental(catalog, "src", "dst", _transform)
    assert info["mode"] == "full"
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)

    # append-only delta → incremental refresh, only new rows transformed
    catalog.write_to_table(_rows(spark, 10, 20), "src", mode="append")
    catalog.write_to_table(_rows(spark, 20, 25), "src", mode="append")
    info = refresh_incremental(catalog, "src", "dst", _transform)
    assert info["mode"] == "incremental" and info["since"] == info["src_version"] - 2
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)

    # no new commits → noop
    assert refresh_incremental(catalog, "src", "dst", _transform)["mode"] == "noop"


def test_watermark_rides_the_data_commit(spark, catalog):
    catalog.write_to_table(_rows(spark, 0, 5), "src", mode="auto")
    refresh_incremental(catalog, "src", "dst", _transform)
    catalog.write_to_table(_rows(spark, 5, 8), "src", mode="append")
    refresh_incremental(catalog, "src", "dst", _transform)
    snap = catalog.snapshot("dst")
    assert snap.properties[MV_SRC_VERSION] == str(catalog.snapshot("src").version)
    # the incremental commit carries BOTH rows and the watermark
    last = list(catalog._log("dst", "default").replay())[-1]
    assert last.operation == "ADD" and last.properties[MV_SRC_VERSION]
    assert last.adds


def test_merge_in_window_forces_rebuild(spark, catalog):
    keyed = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
    )
    catalog.create_table("src", schema=keyed)
    catalog.write_to_table(_rows(spark, 0, 10), "src", mode="merge")
    refresh_incremental(catalog, "src", "dst", _transform)
    # update rows 0-4 (merge → CDC delete+insert in the window)
    catalog.write_to_table(
        spark.createDataFrame([(i, i + 100) for i in range(5)], "id long, v long"),
        "src",
        mode="merge",
    )
    info = refresh_incremental(catalog, "src", "dst", _transform)
    assert info["mode"] == "full"
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)


def test_stream_refresh_incremental(spark, catalog, tmp_path):
    from deltacat_spark.catalog.materialize import stream_refresh_incremental

    ckpt = str(tmp_path / "mv_ckpt")
    catalog.write_to_table(_rows(spark, 0, 10), "src", mode="auto")
    q = stream_refresh_incremental(catalog, "src", "dst", _transform, ckpt)
    q.awaitTermination(120)
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)

    # more appends → next availableNow run picks up only the delta
    catalog.write_to_table(_rows(spark, 10, 18), "src", mode="append")
    q = stream_refresh_incremental(catalog, "src", "dst", _transform, ckpt)
    q.awaitTermination(120)
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)

    # replay with a FRESH checkpoint (worst-case at-least-once): the
    # watermark guard skips the already-applied range — no duplicates
    q = stream_refresh_incremental(
        catalog, "src", "dst", _transform, str(tmp_path / "mv_ckpt2")
    )
    q.awaitTermination(120)
    assert sorted((r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()) == _expected(catalog)


def test_restore_in_window_forces_rebuild(spark, catalog):
    """RESTORE rolls rows back without emitting CDC deletes — the
    soundness gate must treat it like MERGE/DELETE and rebuild, never
    incrementally append over a rolled-back window."""
    catalog.create_table(
        "src", schema=Schema([Field("id", T.LongType()), Field("v", T.LongType())])
    )
    catalog.write_to_table(_rows(spark, 0, 10), "src", mode="append")
    v1 = catalog.snapshot("src").version
    refresh_incremental(catalog, "src", "dst", _transform)
    catalog.write_to_table(_rows(spark, 10, 20), "src", mode="append")
    catalog.restore_table("src", version=v1)
    info = refresh_incremental(catalog, "src", "dst", _transform)
    assert info["mode"] == "full"
    assert sorted(
        (r.id, r.v, r.vv) for r in catalog.read_table("dst").collect()
    ) == _expected(catalog)
