"""Event-behavior analytics over the CHRONO events table: transition
matrices, ordered funnels, and weekly retention cohorts — the product-
analytics queries an event-time lakehouse (reference CHRONO writes,
`catalog/main/impl.py:603-624`) exists to serve. Exact DuckDB oracles;
all keys are integers (epoch-microsecond / integer-div week buckets), so
no float crosses an engine boundary.

Scale shape: transitions are one user-partitioned window pass; the
funnel is three same-keyed aggregations (stage filters cut each round's
input, and user_id partitioning is reused); retention is two integer
aggregations. Nothing is wider than a user_id shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from deltacat_spark.workloads.base import EVENTS_US, cnt, cnt_sql, load

_WEEK_US = 7 * 86_400 * 1_000_000


# --- transition matrix ------------------------------------------------------
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of consecutive (event_type → next event_type) pairs per
    user timeline (the Markov/Sankey input). One window pass ordered by
    (ts_us, event_id) — the event_id tiebreak makes simultaneous events
    deterministic on any engine."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(cnt("n"))
        .orderBy("event_type", "next_type")
    )


TRANSITIONS_SQL = f"""
SELECT event_type, next_type, {cnt_sql('n')} FROM (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS next_type
  FROM {EVENTS_US}) t
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type ORDER BY event_type, next_type
"""


# --- ordered funnel ---------------------------------------------------------
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: users with a view, then a click AFTER
    their first view, then a purchase AFTER that first qualifying click.
    Each stage is a min-aggregate keyed on user_id joined to the next
    stage's filtered events — the stage predicate shrinks every round's
    input, and all three shuffles share the user_id key."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_v"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_c"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_p"))
    )
    return (
        v.agg(cnt("n_view"))
        .crossJoin(F.broadcast(c.agg(cnt("n_click_after"))))
        .crossJoin(F.broadcast(p.agg(cnt("n_purchase_after"))))
    )


FUNNEL_SQL = f"""
WITH ev AS (SELECT * FROM {EVENTS_US}),
v AS (SELECT user_id, MIN(ts_us) AS t_v FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(ts_us) AS t_c FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts_us > t_v GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(ts_us) AS t_p FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts_us > t_c GROUP BY ev.user_id)
SELECT (SELECT {cnt_sql('x')} FROM v) AS n_view,
       (SELECT {cnt_sql('x')} FROM c) AS n_click_after,
       (SELECT {cnt_sql('x')} FROM p) AS n_purchase_after
"""


# --- weekly retention cohorts -----------------------------------------------
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-activity week
    (integer-div epoch weeks — exact on every engine), counted per
    (cohort_week, weeks_since) they were active. Two integer
    aggregations; the distinct (user, week) set is the only wide state."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "user_id", F.expr(f"ts_us div {_WEEK_US}").alias("wk")
    ).distinct()
    cohort = base.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        base.join(cohort, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since")
        )
        .agg(cnt("n_users"))
        .orderBy("cohort_wk", "weeks_since")
    )


RETENTION_SQL = f"""
WITH base AS (
  SELECT DISTINCT user_id, ts_us // {_WEEK_US} AS wk FROM {EVENTS_US}),
cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM base GROUP BY user_id)
SELECT cohort_wk, wk - cohort_wk AS weeks_since, {cnt_sql('n_users')}
FROM base JOIN cohort USING (user_id)
GROUP BY cohort_wk, wk - cohort_wk
ORDER BY cohort_wk, weeks_since
"""


# --- time-series gap-fill ---------------------------------------------------
_HOUR_US = 3_600 * 1_000_000


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts with missing hours ZERO-FILLED over the full
    [min, max] hour grid — the resample step before any time-series
    model. The grid generates from ONE scalar row (sequence + explode,
    driver never materializes it) and left-joins the hourly aggregate;
    hour buckets are integer-div epoch hours, so the grid keys are exact
    on every engine. Grid size = hours in range (bounded by wall time,
    not data volume), the hourly agg is map-side combinable."""
    e = load(spark, sf_dir, "events")
    hours = e.select(F.expr(f"ts_us div {_HOUR_US}").alias("h"))
    hourly = hours.groupBy("h").agg(cnt("n_events"))
    bounds = hours.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h")
    )
    return (
        grid.join(hourly, "h", "left")
        .select(
            F.col("h").alias("hour_bucket"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("hour_bucket")
    )


GAPFILL_SQL = f"""
WITH hours AS (SELECT ts_us // {_HOUR_US} AS h FROM {EVENTS_US}),
hourly AS (SELECT h, {cnt_sql('n_events')} FROM hours GROUP BY h),
grid AS (
  SELECT unnest(generate_series((SELECT MIN(h) FROM hours),
                                (SELECT MAX(h) FROM hours))) AS h)
SELECT grid.h AS hour_bucket,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events
FROM grid LEFT JOIN hourly ON grid.h = hourly.h
ORDER BY hour_bucket
"""


# --- RFM segmentation -------------------------------------------------------
_DAY_US = 86_400 * 1_000_000


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary segmentation of purchasers — the
    marketing-analytics cube over the events stream. All three axes
    derive from exact integers (epoch-us recency vs the GLOBAL max
    event time, purchase counts, 1e-4-scaled value sums) bucketed by
    fixed thresholds, so segment membership is engine-exact. One
    user-keyed aggregation + a broadcast scalar; the segment rollup is
    tiny."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = e.groupBy("user_id").agg(
        F.max("ts_us").alias("last_us"),
        cnt("freq"),
        F.sum(F.floor(F.col("value") * 10_000 + F.lit(0.5)).cast("long")).alias(
            "mon_scaled"
        ),
    )
    gmax = e.agg(F.max("ts_us").alias("gmax"))
    days = (F.col("gmax") - F.col("last_us")) / F.lit(_DAY_US)
    r_b = (
        F.when(days <= 3, "r0_3d").when(days <= 10, "r1_10d").otherwise("r2_older")
    )
    f_b = (
        F.when(F.col("freq") >= 20, "f0_20plus")
        .when(F.col("freq") >= 10, "f1_10_19")
        .otherwise("f2_low")
    )
    m_b = (
        F.when(F.col("mon_scaled") >= 10_000 * 1_000, "m0_1kplus")
        .when(F.col("mon_scaled") >= 10_000 * 300, "m1_300plus")
        .otherwise("m2_low")
    )
    return (
        per_user.crossJoin(F.broadcast(gmax))
        .select(r_b.alias("r"), f_b.alias("f"), m_b.alias("m"))
        .groupBy("r", "f", "m")
        .agg(cnt("n_users"))
        .orderBy("r", "f", "m")
    )


RFM_SQL = f"""
WITH p AS (SELECT * FROM {EVENTS_US} WHERE event_type = 'purchase'),
per_user AS (
  SELECT user_id, MAX(ts_us) AS last_us, {cnt_sql('freq')},
         CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           AS mon_scaled
  FROM p GROUP BY user_id),
gmax AS (SELECT MAX(ts_us) AS gmax FROM p)
SELECT
  CASE WHEN (gmax - last_us) / {_DAY_US} <= 3 THEN 'r0_3d'
       WHEN (gmax - last_us) / {_DAY_US} <= 10 THEN 'r1_10d'
       ELSE 'r2_older' END AS r,
  CASE WHEN freq >= 20 THEN 'f0_20plus'
       WHEN freq >= 10 THEN 'f1_10_19'
       ELSE 'f2_low' END AS f,
  CASE WHEN mon_scaled >= {10_000 * 1_000} THEN 'm0_1kplus'
       WHEN mon_scaled >= {10_000 * 300} THEN 'm1_300plus'
       ELSE 'm2_low' END AS m,
  {cnt_sql('n_users')}
FROM per_user, gmax
GROUP BY 1, 2, 3 ORDER BY r, f, m
"""


QUERIES = {
    "event_transitions": (event_transitions, TRANSITIONS_SQL),
    "funnel_view_click_purchase": (funnel_view_click_purchase, FUNNEL_SQL),
    "weekly_retention": (weekly_retention, RETENTION_SQL),
    "events_hourly_gapfill": (events_hourly_gapfill, GAPFILL_SQL),
    "rfm_segments": (rfm_segments, RFM_SQL),
}
