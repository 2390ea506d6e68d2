"""Watermarked stream-stream join (SURVEY §2.6 depth): views joined to
purchases by user within a bounded event-time interval — the streaming
attribution join. Asserted against the identical batch join, which is
the correctness oracle Structured Streaming guarantees for inner joins
with watermark + time-bound (late rows beyond the watermark excluded,
none here)."""

import datetime

from pyspark.sql import functions as F


def _sources(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    views = [
        (u, base + datetime.timedelta(minutes=m), f"v{u}-{m}")
        for u in range(5)
        for m in range(0, 60, 7)
    ]
    buys = [
        (u, base + datetime.timedelta(minutes=m + 3), float(u * 100 + m))
        for u in range(5)
        for m in range(0, 60, 13)
    ]
    vdf = spark.createDataFrame(views, "user_id long, vts timestamp, page string")
    bdf = spark.createDataFrame(buys, "user_id long, bts timestamp, amount double")
    vpath, bpath = str(tmp_path / "views"), str(tmp_path / "buys")
    vdf.coalesce(2).write.mode("overwrite").parquet(vpath)
    bdf.coalesce(2).write.mode("overwrite").parquet(bpath)
    return vdf, bdf, vpath, bpath


def _join(views, buys):
    # purchase attributed to a view by the same user within [0, 10min]
    return views.join(
        buys,
        (views.user_id == buys.user_id)
        & (buys.bts >= views.vts)
        & (buys.bts <= views.vts + F.expr("INTERVAL 10 MINUTES")),
    ).select(views.user_id, "page", "vts", "bts", "amount")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    vdf, bdf, vpath, bpath = _sources(spark, tmp_path)
    want = {tuple(r) for r in _join(vdf, bdf).collect()}
    assert want  # non-degenerate fixture

    sv = (
        spark.readStream.schema("user_id long, vts timestamp, page string")
        .parquet(vpath)
        .withWatermark("vts", "30 minutes")
    )
    sb = (
        spark.readStream.schema("user_id long, bts timestamp, amount double")
        .parquet(bpath)
        .withWatermark("bts", "30 minutes")
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        _join(sv, sb)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == want
