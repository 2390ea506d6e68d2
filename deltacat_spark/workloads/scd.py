"""Slowly-changing-dimension (SCD type 2) shapes over the event log —
the lakehouse pattern behind every point-in-time-correct feature store:
interval-ize a change log into effective ranges, then answer
"what was the state at time T" questions from the ranges.

`scd2_state_durations` builds the SCD2 interval table (per user, each
event's type is the user's state from its timestamp until the next
event — one lead() window keyed by user) and aggregates total state
residence time. `scd2_state_census` answers the point-in-time question
at 28 day boundaries: how many users were in each state at T — a
containment join of the intervals against a 28-row broadcast time
dimension (each user's timeline is partitioned by construction, so
at most one interval matches per user per T; the join output is
bounded by |users|·|probes|, never intervals²).

At 100 TB: the interval build is one window per user partition (the
change log is already user-keyed); censuses broadcast the tiny probe
dimension so the fact side never shuffles — the same discipline as
`range_join_price_bands`. Everything stays in integer epoch
microseconds.

Reference parity: deltacat has no SCD operators; this extends the
event-analytics family (SURVEY.md §2 addendum) alongside
`asof_join_purchase_signup` / `event_transitions`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from deltacat_spark.workloads.base import cnt, cnt_sql, load

_DAY_US = 86_400 * 1_000_000
_N_PROBES = 28
_OPEN_END = 4_102_444_800_000_000  # 2100-01-01 in epoch µs: "current"


def _intervals(e: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("from_us"),
        F.coalesce(
            F.lead("ts_us").over(w), F.lit(_OPEN_END)
        ).alias("to_us"),
    )


_INTERVALS_SQL = f"""
  SELECT user_id, event_type AS state, ts_us AS from_us,
         COALESCE(lead(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id),
                  {_OPEN_END}) AS to_us
  FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        FROM events)
"""


def scd2_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total residence time per state over the SCD2 intervals (closed
    intervals only — the open 'current' tail has no defined duration):
    (state, n_intervals, n_users, total_us)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_us"
    )
    iv = _intervals(e).filter(F.col("to_us") != _OPEN_END)
    return (
        iv.groupBy("state")
        .agg(
            cnt("n_intervals"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("to_us") - F.col("from_us")).alias("total_us"),
        )
        .orderBy("state")
    )


DURATIONS_SQL = f"""
WITH iv AS ({_INTERVALS_SQL})
SELECT state, {cnt_sql('n_intervals')},
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(to_us - from_us) AS BIGINT) AS total_us
FROM iv WHERE to_us <> {_OPEN_END}
GROUP BY state ORDER BY state
"""


def scd2_state_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state census: users per state at each of the first
    `_N_PROBES` day boundaries after the log's first event —
    (day_idx, state, n_users). The probe dimension broadcasts; interval
    containment (`from ≤ T < to`) matches at most one interval per
    user per probe."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_us"
    )
    iv = _intervals(e)
    base = e.agg(
        F.expr(f"min(ts_us) div {_DAY_US}").alias("day0")
    )
    probes = base.select(
        F.explode(F.sequence(F.lit(1), F.lit(_N_PROBES))).alias("day_idx"),
        "day0",
    ).select(
        "day_idx",
        ((F.col("day0") + F.col("day_idx")) * _DAY_US).alias("t_us"),
    )
    j = iv.join(
        F.broadcast(probes),
        (F.col("from_us") <= F.col("t_us"))
        & (F.col("t_us") < F.col("to_us")),
    )
    return (
        j.groupBy("day_idx", "state")
        .agg(cnt("n_users"))
        .orderBy("day_idx", "state")
    )


CENSUS_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
base AS (
  SELECT MIN(epoch_us(ts)) // {_DAY_US} AS day0 FROM events),
probes AS (
  SELECT CAST(u.k AS INT) AS day_idx,
         (base.day0 + u.k) * {_DAY_US} AS t_us
  FROM base, unnest(range(1, {_N_PROBES + 1})) AS u(k))
SELECT p.day_idx, iv.state, {cnt_sql('n_users')}
FROM iv JOIN probes p
  ON iv.from_us <= p.t_us AND p.t_us < iv.to_us
GROUP BY p.day_idx, iv.state
ORDER BY p.day_idx, iv.state
"""


QUERIES = {
    "scd2_state_durations": (scd2_state_durations, DURATIONS_SQL),
    "scd2_state_census": (scd2_state_census, CENSUS_SQL),
}
