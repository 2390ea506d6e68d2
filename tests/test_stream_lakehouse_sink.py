"""Streaming SINKS into the jar-free Delta/Hudi/Iceberg tables
(`streaming/api.py:make_*_stream_sink`): one commit per micro-batch,
exactly-once under foreachBatch replays via the Delta SetTransaction
action, the Hudi extraMetadata checkpoint, and the Iceberg snapshot
summary stamp."""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    latest_txn_version,
    read_delta,
    write_checkpoint,
    write_delta,
)
from deltacat_spark.sources.hudi import latest_extra_meta, read_hudi
from deltacat_spark.streaming.api import (
    make_delta_stream_sink,
    make_hudi_stream_sink,
    stream_write_delta,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_delta_txn_action_roundtrip_and_checkpoint(spark, tmp_path):
    root = str(tmp_path / "d")
    write_delta(_batch(spark, [(1, "a", 1.0)]), root, txn=("app", 3))
    assert latest_txn_version(root, "app") == 3
    assert latest_txn_version(root, "other") is None
    # higher version wins; stale stamp never regresses the state
    write_delta(_batch(spark, [(2, "a", 2.0)]), root, txn=("app", 7))
    write_delta(_batch(spark, [(3, "a", 3.0)]), root)
    assert latest_txn_version(root, "app") == 7
    # txn state must survive a checkpoint-based replay (spec: checkpoint
    # carries the latest txn per appId)
    v = DeltaSnapshot(root).version
    write_checkpoint(root, v)
    snap = DeltaSnapshot(root)  # replays from the checkpoint
    assert snap._usable_checkpoint(snap.version) == v
    assert snap.txns == {"app": 7}


def test_delta_sink_skips_replayed_batch(spark, tmp_path):
    root = str(tmp_path / "d")
    sink = make_delta_stream_sink(root, partition_by=["cat"])
    sink(_batch(spark, [(1, "a", 1.0), (2, "b", 2.0)]), 0)
    sink(_batch(spark, [(3, "a", 3.0)]), 1)
    # crash-replay of batch 1 — must be a no-op, not a duplicate append
    sink(_batch(spark, [(3, "a", 3.0)]), 1)
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    # distinct app ids do not share dedup state
    other = make_delta_stream_sink(root, app_id="second-stream")
    other(_batch(spark, [(4, "b", 4.0)]), 1)
    assert read_delta(spark, root).count() == 4


def test_delta_sink_end_to_end_stream(spark, tmp_path):
    src, root = str(tmp_path / "src"), str(tmp_path / "d")
    ckpt = str(tmp_path / "ckpt")
    df = _batch(spark, [(i, str(i % 2), float(i)) for i in range(10)])
    df.write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema).parquet(src)
    )
    q = stream_write_delta(
        stream, root, checkpoint_dir=ckpt, partition_by=["cat"]
    )
    q.awaitTermination(120)
    got = read_delta(spark, root)
    assert sorted(r.id for r in got.collect()) == list(range(10))
    assert latest_txn_version(root, f"delta-sink:d") == 0
    # second run over the same source: no new files, no duplicates
    q2 = stream_write_delta(stream, root, checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert read_delta(spark, root).count() == 10


def test_hudi_sink_upserts_and_skips_replays(spark, tmp_path):
    root = str(tmp_path / "h")
    sink = make_hudi_stream_sink(root, "id", partition_by=["cat"])
    sink(_batch(spark, [(1, "a", 1.0), (2, "b", 2.0)]), 0)
    # batch 1 UPDATES key 1 (streaming upsert) and adds key 3
    sink(_batch(spark, [(1, "a", 10.0), (3, "b", 3.0)]), 1)
    sink(_batch(spark, [(1, "a", 10.0), (3, "b", 3.0)]), 1)  # replay
    got = read_hudi(spark, root, drop_meta=True)
    assert sorted((r.id, r.v) for r in got.collect()) == [
        (1, 10.0),
        (2, 2.0),
        (3, 3.0),
    ]
    assert latest_extra_meta(root, "deltacat.streaming.hudi-sink:h") == "1"


def test_hudi_sink_empty_batch_is_noop(spark, tmp_path):
    root = str(tmp_path / "h")
    sink = make_hudi_stream_sink(root, "id")
    sink(_batch(spark, [(1, "a", 1.0)]), 0)
    sink(_batch(spark, []).filter(F.lit(False)), 1)
    assert read_hudi(spark, root, drop_meta=True).count() == 1
    # the empty batch left no checkpoint advance — batch 1 may still land
    assert latest_extra_meta(root, "deltacat.streaming.hudi-sink:h") == "0"


def test_iceberg_sink_appends_and_skips_replays(spark, tmp_path):
    from deltacat_spark.sources.iceberg import (
        latest_summary_value,
        read_iceberg,
    )
    from deltacat_spark.streaming.api import make_iceberg_stream_sink

    root = str(tmp_path / "i")
    sink = make_iceberg_stream_sink(root, partition_by=["cat"])
    sink(_batch(spark, [(1, "a", 1.0), (2, "b", 2.0)]), 0)
    sink(_batch(spark, [(3, "a", 3.0)]), 1)
    sink(_batch(spark, [(3, "a", 3.0)]), 1)  # crash replay — no dupes
    got = read_iceberg(spark, root)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    assert latest_summary_value(root, "deltacat.streaming.iceberg-sink:i") == "1"
    # a maintenance replace between batches must not hide the stamp
    from deltacat_spark.sources.iceberg import rewrite_data_files

    rewrite_data_files(spark, root)
    sink(_batch(spark, [(3, "a", 3.0)]), 1)  # still recognized
    assert read_iceberg(spark, root).count() == 3
    sink(_batch(spark, [(4, "b", 4.0)]), 2)
    assert read_iceberg(spark, root).count() == 4


def test_iceberg_sink_end_to_end_stream(spark, tmp_path):
    from deltacat_spark.sources.iceberg import read_iceberg
    from deltacat_spark.streaming.api import stream_write_iceberg

    src, root = str(tmp_path / "src"), str(tmp_path / "i")
    ckpt = str(tmp_path / "ckpt")
    df = _batch(spark, [(i, str(i % 2), float(i)) for i in range(6)])
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = stream_write_iceberg(stream, root, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert read_iceberg(spark, root).count() == 6
    # restart over the same source: offsets already consumed, no dupes
    q2 = stream_write_iceberg(stream, root, checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert read_iceberg(spark, root).count() == 6
