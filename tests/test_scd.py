"""SCD2 invariants the oracle can't provide: closed intervals telescope
(Σ state durations ≡ Σ per-user (last−first) timestamp span) and the
census partitions users (state counts at T sum to exactly the users
whose first event is ≤ T)."""

from pyspark.sql import functions as F

from deltacat_spark.workloads.base import load
from deltacat_spark.workloads.scd import (
    _DAY_US,
    scd2_state_census,
    scd2_state_durations,
)

SF = "/root/testdata/sf0.001"


def test_durations_telescope(spark):
    got = sum(
        r["total_us"] for r in scd2_state_durations(spark, SF).collect()
    )
    spans = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg((F.max("ts_us") - F.min("ts_us")).alias("span"))
        .agg(F.sum("span").alias("s"))
        .collect()[0]["s"]
    )
    assert got == spans


def test_streaming_scd2_matches_batch(spark, tmp_path):
    """The stateful streaming interval-izer emits exactly the batch
    build's CLOSED intervals when chunks arrive in event-time order —
    state (the open interval) survives across micro-batches."""
    from deltacat_spark.streaming.stateful import scd2_stream_intervals
    from deltacat_spark.workloads.scd import _OPEN_END, _intervals

    rows = [
        # (user_id, state, ts_us) — two users, interleaved
        (1, "a", 100), (2, "x", 150), (1, "b", 200), (1, "a", 300),
        (2, "x", 350), (1, "c", 400), (2, "y", 450),
    ]
    early = [r for r in rows if r[2] <= 250]
    late = [r for r in rows if r[2] > 250]
    src = str(tmp_path / "src")
    schema = "user_id long, state string, ts_us long"
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch_df = spark.createDataFrame(rows, schema).select(
        "user_id",
        "state",
        "ts_us",
        F.monotonically_increasing_id().alias("event_id"),
    )
    # batch _intervals expects (user_id, event_type/state alias, ts_us)
    want = {
        (r["user_id"], r["state"], r["from_us"], r["to_us"])
        for r in _intervals(
            batch_df.withColumnRenamed("state", "event_type")
        ).collect()
        if r["to_us"] != _OPEN_END
    }

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        scd2_stream_intervals(stream)
        .writeStream.format("memory")
        .queryName("scd_iv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["state"], r["from_us"], r["to_us"])
        for r in spark.sql("SELECT * FROM scd_iv").collect()
    }
    assert got == want
    # intervals that close ACROSS the chunk boundary must be present
    assert (1, "b", 200, 300) in got


def test_census_partitions_users(spark):
    e = load(spark, SF, "events").select("user_id", "ts_us").collect()
    first = {}
    for r in e:
        u, t = r["user_id"], r["ts_us"]
        if u not in first or t < first[u]:
            first[u] = t
    day0 = min(first.values()) // _DAY_US
    rows = scd2_state_census(spark, SF).collect()
    assert rows
    by_day: dict[int, int] = {}
    for r in rows:
        by_day[r["day_idx"]] = by_day.get(r["day_idx"], 0) + r["n_users"]
    for day_idx, total in by_day.items():
        t = (day0 + day_idx) * _DAY_US
        want = sum(1 for v in first.values() if v <= t)
        assert total == want, (day_idx, total, want)
