"""Streaming change-feed source (`stream_read_changes`): commits land
while the stream runs; the sink receives each commit's change rows
exactly once, stamped `_commit_version`/`_change_type`; offsets resume
from Spark's checkpoint; unresolved multi-table transactions gate the
feed instead of being skipped."""

from pyspark.sql import functions as F

from deltacat_spark.streaming import stream_read_changes


def _collect_to(stream_df, path, ckpt):
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_changes_arrive_exactly_once_with_stamps(spark, catalog, tmp_path):
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        "t",
        mode="auto",
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = _collect_to(stream_read_changes(catalog, "t"), sink, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert sorted(r.id for r in got.collect()) == [1, 2]
    assert {r._change_type for r in got.collect()} == {"APPEND"}
    # New commits land while the stream is "running" (next trigger):
    catalog.write_to_table(
        spark.createDataFrame([(3, "c")], "id long, v string"), "t", mode="append"
    )
    catalog.write_to_table(
        spark.createDataFrame([(4, "d")], "id long, v string"), "t", mode="append"
    )
    q = _collect_to(stream_read_changes(catalog, "t"), sink, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    # Exactly once: ids 1..4 each exactly one row, no replays.
    assert sorted(r.id for r in rows) == [1, 2, 3, 4]
    by_id = {r.id: r for r in rows}
    assert by_id[3]._change_type == "APPEND"
    assert by_id[3]._commit_version < by_id[4]._commit_version
    # Commit-version stamps are the actual log versions.
    assert by_id[1]._commit_version < by_id[3]._commit_version


def test_changes_stream_gates_on_pending_txn(spark, catalog, tmp_path):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    # In-flight multi-table txn commit: the feed must HOLD, not skip.
    catalog._txn_markers.begin("ab" * 16)
    catalog._txn_ctx = "ab" * 16
    try:
        catalog.write_to_table(
            spark.createDataFrame([(2,)], "id long"), "t", mode="append"
        )
    finally:
        catalog._txn_ctx = None
    # A later commit AFTER the pending one:
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = _collect_to(stream_read_changes(catalog, "t"), sink, ckpt)
    q.awaitTermination(120)
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [1]
    # Txn resolves → the held commit flows on the next trigger, in order.
    catalog._txn_markers.finalize("ab" * 16)
    q = _collect_to(stream_read_changes(catalog, "t"), sink, ckpt)
    q.awaitTermination(120)
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [1, 2]


def test_changes_stream_schema_includes_stamps(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1, 2.5)], "id long, x double"), "t", mode="auto"
    )
    df = stream_read_changes(catalog, "t")
    assert df.isStreaming
    assert df.columns == [
        "id",
        "x",
        "_commit_version",
        "_change_type",
        "_change_cols",
    ]
