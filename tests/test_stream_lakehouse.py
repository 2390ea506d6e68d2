"""Streaming sources over the jar-free lakehouse formats
(`streaming/lakehouse_source.py`): Hudi incremental timeline and Delta
append log as Structured Streaming micro-batch sources — exactly-once
delivery across triggers via Spark's offset checkpoint, commit stamps,
and correct behavior under CoW rewrites / remove actions."""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import write_delta
from deltacat_spark.sources.hudi import write_hudi
from deltacat_spark.sources.iceberg import write_iceberg
from deltacat_spark.streaming import (
    stream_read_delta,
    stream_read_hudi,
    stream_read_iceberg,
)


def _run_to(stream_df, path, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_hudi_stream_exactly_once_across_rewrites(spark, tmp_path):
    root = str(tmp_path / "h")
    write_hudi(
        _batch(spark, [(i, str(i % 2), float(i)) for i in range(8)]),
        root, record_key_field="id", operation="insert",
        partition_by=["cat"],
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    got = spark.read.parquet(sink)
    assert sorted(r.id for r in got.collect()) == list(range(8))
    instants = {r._commit_instant for r in got.collect()}
    assert len(instants) == 1

    # upsert: updates 2 keys (CoW rewrite carries the other rows of
    # those slices!) + inserts 1 new key — the next trigger must
    # deliver EXACTLY those 3 rows, no carried-over replays
    write_hudi(
        _batch(spark, [(0, "0", 99.0), (3, "1", 98.0), (50, "0", 1.0)]),
        root, record_key_field="id",
    )
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 11  # 8 + 3, nothing replayed
    by_id_v = sorted((r.id, r.v) for r in rows)
    assert (0, 0.0) in by_id_v and (0, 99.0) in by_id_v  # old + update
    assert (50, 1.0) in by_id_v
    # the update rows carry the SECOND instant's stamp
    second = [r for r in rows if r.id == 50][0]._commit_instant
    assert {r._commit_instant for r in rows if r.v in (99.0, 98.0)} == {
        second
    }


def test_hudi_stream_from_instant_skips_history(spark, tmp_path):
    root = str(tmp_path / "h")
    i1 = write_hudi(
        _batch(spark, [(1, "0", 1.0)]), root, record_key_field="id",
        operation="insert",
    )
    write_hudi(_batch(spark, [(2, "0", 2.0)]), root, record_key_field="id")
    sink, ckpt = str(tmp_path / "s2"), str(tmp_path / "c2")
    _run_to(stream_read_hudi(spark, root, from_instant=i1), sink, ckpt)
    got = spark.read.parquet(sink).collect()
    assert [r.id for r in got] == [2]


def test_hudi_stream_multi_instant_single_trigger(spark, tmp_path):
    """Three commits land BETWEEN triggers: one availableNow batch
    spans all three offsets, each row stamped with its own instant."""
    root = str(tmp_path / "h")
    i1 = write_hudi(
        _batch(spark, [(1, "0", 1.0)]), root, record_key_field="id",
        operation="insert",
    )
    i2 = write_hudi(
        _batch(spark, [(2, "0", 2.0)]), root, record_key_field="id"
    )
    i3 = write_hudi(
        _batch(spark, [(1, "0", 10.0), (3, "0", 3.0)]),
        root, record_key_field="id",
    )
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    got = sorted((r.id, r.v, r._commit_instant) for r in rows)
    assert got == [
        (1, 1.0, i1), (1, 10.0, i3), (2, 2.0, i2), (3, 3.0, i3)
    ]


def test_delta_stream_appends_and_partition_reconstruction(spark, tmp_path):
    root = str(tmp_path / "d")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("string").alias("cat")
    )
    write_delta(df, root, partition_by=["cat"])
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_to(stream_read_delta(spark, root), sink, ckpt)
    got = spark.read.parquet(sink)
    assert sorted(r.id for r in got.collect()) == list(range(20))
    # hive-staged partition column reconstructed in the stream
    assert {r.cat for r in got.collect()} == {"0", "1"}
    assert {r._commit_version for r in got.collect()} == {0}

    write_delta(
        spark.range(20, 25).select("id", F.lit("9").alias("cat")), root
    )
    _run_to(stream_read_delta(spark, root), sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.id for r in rows) == list(range(25))
    assert max(r._commit_version for r in rows) == 1


def test_iceberg_stream_appends_with_partition_reconstruction(
    spark, tmp_path
):
    root = str(tmp_path / "i")
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 2).cast("string").alias("cat")
    )
    write_iceberg(df, root, partition_by=["cat"])
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_to(stream_read_iceberg(spark, root), sink, ckpt)
    got = spark.read.parquet(sink)
    assert sorted(r.id for r in got.collect()) == list(range(12))
    assert {r.cat for r in got.collect()} == {"0", "1"}
    first_sid = {r._commit_snapshot_id for r in got.collect()}
    assert len(first_sid) == 1

    # a second append streams exactly its own rows on the next trigger
    write_iceberg(
        spark.range(12, 15).select("id", F.lit("9").alias("cat")),
        root, mode="append",
    )
    _run_to(stream_read_iceberg(spark, root), sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.id for r in rows) == list(range(15))
    assert len({r._commit_snapshot_id for r in rows}) == 2

    # a position-delete snapshot is NOT an append: fail, then skip
    from deltacat_spark.sources.iceberg import (
        convert_equality_deletes_to_position,
    )

    convert_equality_deletes_to_position(spark, root, "id = 3")
    with pytest.raises(Exception, match="append stream|non_append"):
        _run_to(stream_read_iceberg(spark, root), sink, ckpt)
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    _run_to(
        stream_read_iceberg(spark, root, on_non_append="skip"),
        sink2, ckpt2,
    )
    got2 = spark.read.parquet(sink2).collect()
    assert sorted(r.id for r in got2) == list(range(15))


def test_delta_stream_fails_or_skips_on_remove(spark, tmp_path):
    root = str(tmp_path / "d")
    df = spark.range(0, 5).select("id", F.lit("a").alias("cat"))
    write_delta(df, root)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    _run_to(stream_read_delta(spark, root), sink, ckpt)
    # overwrite = remove actions in version 1
    write_delta(
        spark.range(100, 103).select("id", F.lit("b").alias("cat")),
        root, mode="overwrite",
    )
    with pytest.raises(Exception, match="remove|append stream"):
        _run_to(stream_read_delta(spark, root), sink, ckpt)
    # skip policy: the overwrite version's adds still stream (documented
    # adds-as-appends semantics), nothing crashes, offset advances
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    _run_to(
        stream_read_delta(spark, root, on_remove="skip"), sink2, ckpt2
    )
    got = spark.read.parquet(sink2).collect()
    assert sorted(r.id for r in got) == [0, 1, 2, 3, 4]


def test_hudi_mor_stream_deltacommits_and_compaction_silent(
    spark, tmp_path
):
    """MoR tables stream through the same source: deltacommit log rows
    deliver exactly-once, and a compaction (commit stamped
    compacted:true) delivers NOTHING — its rows' origin files already
    streamed."""
    from deltacat_spark.sources.hudi import compact_hudi

    root = str(tmp_path / "m")
    write_hudi(
        _batch(spark, [(i, str(i % 2), float(i)) for i in range(6)]),
        root, record_key_field="id", operation="insert",
        partition_by=["cat"], table_type="MERGE_ON_READ",
    )
    sink, ckpt = str(tmp_path / "msink"), str(tmp_path / "mckpt")
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    assert sorted(
        r.id for r in spark.read.parquet(sink).collect()
    ) == list(range(6))

    # upsert lands as LOG files + one new base group
    write_hudi(
        _batch(spark, [(0, "0", 99.0), (100, "0", 1.0)]),
        root, record_key_field="id",
    )
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 8  # 6 + 2, exactly-once
    assert sorted((r.id, r.v) for r in rows if r.id in (0, 100))[1:] == [
        (0, 99.0), (100, 1.0)
    ]

    # compaction folds the logs; the stream must stay silent
    assert compact_hudi(spark, root) is not None
    _run_to(stream_read_hudi(spark, root), sink, ckpt)
    assert len(spark.read.parquet(sink).collect()) == 8
