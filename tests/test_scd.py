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
