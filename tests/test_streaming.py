"""Streaming surface tests: micro-batch sink into the table format,
window aggregations on streams matching their batch equivalents
(SURVEY §2.6 — the new capability beyond the reference)."""

import datetime

from pyspark.sql import functions as F

from deltacat_spark.streaming import stream_write_to_table, tumbling_window_agg


def _write_source(spark, path, n=50):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=7 * i), float(i)) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, value double")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return df


def test_stream_sink_commits_batches(spark, catalog, tmp_path):
    src = str(tmp_path / "src")
    batch_df = _write_source(spark, src)
    stream = (
        spark.readStream.schema("id long, ts timestamp, value double")
        .parquet(src)
    )
    q = stream_write_to_table(
        stream,
        catalog,
        "events_sink",
        mode="add",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = catalog.read_table("events_sink")
    assert out.count() == 50
    assert sorted(r.id for r in out.collect()) == list(range(50))
    # ADD commits recorded through the normal log
    snap = catalog.snapshot("events_sink")
    assert snap.commits[-1].operation == "ADD"


def test_streaming_window_agg_matches_batch(spark, catalog, tmp_path):
    src = str(tmp_path / "src2")
    batch_df = _write_source(spark, src)
    stream = (
        spark.readStream.schema("id long, ts timestamp, value double")
        .parquet(src)
    )
    windowed = tumbling_window_agg(
        stream,
        "ts",
        "1 hour",
        [],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        watermark_delay="10 minutes",
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"].start, r.n, float(r.total))
        for r in spark.sql("select * from win_out").collect()
    }
    expect = {
        (r["window"].start, r.n, float(r.total))
        for r in tumbling_window_agg(
            batch_df, "ts", "1 hour", [], [
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
            ]
        ).collect()
    }
    assert got == expect


def test_sink_batch_replay_is_idempotent(spark, catalog):
    """foreachBatch is at-least-once: a replayed batch_id must not
    double-append (exactly-once via the atomic (app, batch_id) stamp)."""
    from deltacat_spark.streaming.api import make_stream_sink

    sink = make_stream_sink(catalog, "eo", mode="add")
    batch = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, value double")
    sink(batch, 0)
    sink(batch, 0)  # crash-replay of the same batch
    assert catalog.read_table("eo").count() == 2
    sink(batch, 1)  # a NEW batch with identical rows must append
    assert catalog.read_table("eo").count() == 4
    # late replay of an OLD batch after newer ones committed: skipped
    sink(batch, 0)
    assert catalog.read_table("eo").count() == 4
