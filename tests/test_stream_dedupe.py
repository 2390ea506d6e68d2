"""Streaming key-dedupe with watermark-bounded state."""

from pyspark.sql import functions as F

from deltacat_spark.streaming.api import dedupe_stream


def test_dedupe_stream_batch_mode(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "id long, v string"
    )
    out = dedupe_stream(df, ["id", "v"])
    assert out.count() == 2


def test_dedupe_stream_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files with overlapping keys inside the watermark window
    spark.createDataFrame(
        [(1, "2026-01-01 00:00:01"), (2, "2026-01-01 00:00:02")],
        "id long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
        "ts_s"
    ).write.parquet(src)
    spark.createDataFrame(
        [(1, "2026-01-01 00:00:03"), (3, "2026-01-01 00:00:04")],
        "id long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
        "ts_s"
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = dedupe_stream(
        stream, ["id"], event_time="ts", watermark_delay="10 minutes"
    )
    sink = str(tmp_path / "sink")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(sink).collect())
    # id=1 arrived twice within the watermark window -> one survivor
    assert got == [1, 2, 3]
