"""Data-profiling / pipeline-diagnostics operators.

The audits a 100 TB ingest runs before committing to a layout:
* ``skew_profile_orders`` — hot-key fan-out report for a join column
  (the input to choosing salting / AQE skew thresholds).
* ``completeness_profile`` — per-column null/blank counts over
  lineitem (data-quality gate).
* ``events_daily_anomalies`` — global daily volumes flagged by exact
  integer z-score (|z| ≥ 2) against the corpus mean/std.

All are one or two hash aggregations; moments are computed as integer
sums so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import cnt, cnt_sql, load

# --- hot-key skew profile ----------------------------------------------------
_TOPN = 20


def skew_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N hottest o_custkey values with absolute count and permille
    share (integer, exact) — the fan-out diagnostic consulted before
    keying a shuffle on the column. One aggregation + one broadcast
    scalar; never a full sort (top-N via ordered limit)."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(cnt("n_orders"))
    total = o.agg(cnt("t")).select("t")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "n_orders",
            F.expr("n_orders * 1000 div t").alias("share_permille"),
        )
        .orderBy(F.desc("n_orders"), "o_custkey")
        .limit(_TOPN)
    )


SKEW_PROFILE_SQL = f"""
WITH counts AS (
  SELECT o_custkey, {cnt_sql('n_orders')} FROM orders GROUP BY o_custkey),
total AS (SELECT {cnt_sql('t')} FROM orders)
SELECT o_custkey, n_orders,
       CAST(n_orders * 1000 // t AS BIGINT) AS share_permille
FROM counts CROSS JOIN total
ORDER BY n_orders DESC, o_custkey
LIMIT {_TOPN}
"""


# --- completeness profile ----------------------------------------------------
_PROFILE_COLS = ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"]


def completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column row/null counts over lineitem in ONE pass (no
    per-column jobs): conditional aggregates unpivoted to one row per
    column via an inline array — the completeness gate of an ingest."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [cnt("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    one = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"), F.col(f"null_{c}").alias("n_null")
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select("n_rows", F.explode(pairs).alias("p"))
        .select(
            F.col("p.col_name").alias("col_name"),
            F.col("n_rows"),
            F.col("p.n_null").cast("long").alias("n_null"),
        )
        .orderBy("col_name")
    )


_COMPLETENESS_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, {cnt_sql('n_rows')},"
    f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null"
    f" FROM lineitem"
    for c in _PROFILE_COLS
)
COMPLETENESS_SQL = f"""
SELECT * FROM ({_COMPLETENESS_UNION}) ORDER BY col_name
"""


# --- daily volume anomalies --------------------------------------------------
_DAY_US = 86_400 * 1_000_000
_EVENTS_US = "(SELECT epoch_us(ts) AS ts_us FROM events)"


def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose global event volume is ≥2 standard deviations from
    the mean — the volume-anomaly monitor over an ingest stream. The
    z-test is evaluated as an EXACT integer inequality
    ((x·n − s)² ≥ 4·(ss·n − s²), the z≥2 test cross-multiplied by n²)
    so both engines agree bit-for-bit; s=Σx, ss=Σx²."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(F.expr(f"ts_us div {_DAY_US}").alias("day"))
        .groupBy("day")
        .agg(cnt("n_events"))
    )
    stats = daily.agg(
        cnt("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    x, n, s, ss = (F.col(c) for c in ("n_events", "n_days", "s", "ss"))
    lhs = (x * n - s) * (x * n - s)
    rhs = F.lit(4) * (ss * n - s * s)
    return (
        daily.crossJoin(F.broadcast(stats))
        .filter(lhs >= rhs)
        .select("day", "n_events")
        .orderBy("day")
    )


ANOMALY_SQL = f"""
WITH daily AS (
  SELECT ts_us // {_DAY_US} AS day, {cnt_sql('n_events')}
  FROM {_EVENTS_US} GROUP BY ts_us // {_DAY_US}),
stats AS (
  SELECT {cnt_sql('n_days')}, CAST(SUM(n_events) AS BIGINT) AS s,
         CAST(SUM(n_events * n_events) AS BIGINT) AS ss
  FROM daily)
SELECT day, n_events
FROM daily CROSS JOIN stats
WHERE (n_events * n_days - s) * (n_events * n_days - s)
      >= 4 * (ss * n_days - s * s)
ORDER BY day
"""


_BACKTEST_DAYS = 14
_SEASON = 7


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality backtest of the weekly seasonal-naive model
    (ŷ(d) = y(d−7)) over each event_type's daily-volume series, last 14
    days: (event_type, n_days, mae_milli) with MAE in exact integer
    milli-events (Σ|y−ŷ|·1000 // n). The monitoring-pipeline shape: one
    day-keyed aggregate (series is days×types-sized — tiny forever), a
    self-join shifted by the season, and a bounded-window error
    aggregate. At 100 TB only the first aggregation sees raw events and
    it map-side combines to the series size."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.expr(f"ts_us div {_DAY_US}").alias("day"))
        .groupBy("event_type", "day")
        .agg(cnt("n"))
        .localCheckpoint(eager=False)  # two consumers: actuals + lags
    )
    max_day = daily.agg(F.max("day").alias("max_day"))
    lag = daily.select(
        "event_type",
        (F.col("day") + _SEASON).alias("day"),
        F.col("n").alias("n_lag"),
    )
    err = (
        daily.crossJoin(F.broadcast(max_day))
        .filter(F.col("day") > F.col("max_day") - _BACKTEST_DAYS)
        .join(lag, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.abs(
                F.col("n") - F.coalesce(F.col("n_lag"), F.lit(0))
            ).alias("ae"),
        )
    )
    return (
        err.groupBy("event_type")
        .agg(
            cnt("n_days"),
            # integer division on both sides (Spark `div` truncates,
            # DuckDB `//` floors — equal for non-negative sums)
            F.expr("(sum(ae) * 1000) div count(*)")
            .cast("long")
            .alias("mae_milli"),
        )
        .orderBy("event_type")
    )


BACKTEST_SQL = f"""
WITH daily AS (
  SELECT event_type, ts_us // {_DAY_US} AS day, {cnt_sql('n')}
  FROM (SELECT event_type, epoch_us(ts) AS ts_us FROM events)
  GROUP BY 1, 2),
mx AS (SELECT MAX(day) AS max_day FROM daily),
err AS (
  SELECT d.event_type, abs(d.n - COALESCE(l.n, 0)) AS ae
  FROM daily d CROSS JOIN mx
  LEFT JOIN daily l
    ON l.event_type = d.event_type AND l.day = d.day - {_SEASON}
  WHERE d.day > mx.max_day - {_BACKTEST_DAYS})
SELECT event_type, {cnt_sql('n_days')},
       CAST(SUM(ae) * 1000 // COUNT(*) AS BIGINT) AS mae_milli
FROM err GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "skew_profile_orders": (skew_profile_orders, SKEW_PROFILE_SQL),
    "seasonal_naive_backtest": (seasonal_naive_backtest, BACKTEST_SQL),
    "completeness_profile": (completeness_profile, COMPLETENESS_SQL),
    "events_daily_anomalies": (events_daily_anomalies, ANOMALY_SQL),
}
