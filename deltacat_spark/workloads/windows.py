"""Event-time windowing + temporal-join inventory over `events`.

The streaming-adjacent surface (SURVEY §2.6): tumbling/sliding/session
windows via Spark's native window operators (`F.window`,
`F.session_window` — the same plans Structured Streaming runs with a
watermark), an as-of join, a range join, and embedding-cosine near-dup.
Oracles express the identical semantics in portable epoch-microsecond
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from deltacat_spark.localdf import local_df

from deltacat_spark.streaming.api import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from deltacat_spark.workloads.base import (
    EVENTS_US,
    cnt,
    cnt_sql,
    dsum,
    dsum_sql,
    load,
)

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000
GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # timestamp_micros → TIMESTAMP; with session tz UTC the window
    # arithmetic below round-trips exactly through unix micros.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return e.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


# --- tumbling window --------------------------------------------------------
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_with_ts(spark, sf_dir)
    out = tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [cnt("n_events"), dsum("value", "total_value")],
    )
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "total_value",
    )


TUMBLING_SQL = f"""
SELECT (ts_us // {HOUR_US}) * {HOUR_US} AS window_start_us, event_type,
       {cnt_sql('n_events')}, {dsum_sql('value', 'total_value')}
FROM {EVENTS_US}
GROUP BY 1, 2
"""


# --- sliding window ---------------------------------------------------------
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_with_ts(spark, sf_dir)
    out = sliding_window_agg(
        e,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [cnt("n_events"), dsum("value", "total_value")],
    )
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "n_events",
        "total_value",
    )


SLIDING_SQL = f"""
WITH starts AS (
  SELECT ts_us, value,
         unnest([(ts_us // {HALF_HOUR_US}) * {HALF_HOUR_US},
                 (ts_us // {HALF_HOUR_US}) * {HALF_HOUR_US} - {HALF_HOUR_US}])
           AS window_start_us
  FROM {EVENTS_US})
SELECT window_start_us, {cnt_sql('n_events')}, {dsum_sql('value', 'total_value')}
FROM starts
WHERE ts_us >= window_start_us AND ts_us < window_start_us + {HOUR_US}
GROUP BY 1
"""


# --- session window ---------------------------------------------------------
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_with_ts(spark, sf_dir)
    out = session_window_agg(
        e,
        "ts",
        "30 minutes",
        ["user_id"],
        [cnt("n_events"), dsum("value", "total_value")],
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
        "total_value",
    )


SESSION_SQL = f"""
WITH marked AS (
  SELECT user_id, ts_us, value,
         CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   >= {GAP_US} OR
                   lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM {EVENTS_US}),
sessions AS (
  SELECT user_id, ts_us, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id, min(ts_us) AS session_start_us,
       max(ts_us) + {GAP_US} AS session_end_us,
       {cnt_sql('n_events')}, {dsum_sql('value', 'total_value')}
FROM sessions GROUP BY user_id, session_id
"""


# --- as-of join -------------------------------------------------------------
def asof_join_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent in both the reference and vanilla Spark —
    SURVEY §2.3 'absent' list): each purchase matched to the user's most
    recent signup at-or-before its event time, as a running conditional
    MAX over an event-time window (no join, no shuffle beyond the
    per-user window)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_us").asc(),
            # signup at the same instant counts as "at or before"
            F.when(F.col("event_type") == "signup", 0).otherwise(1).asc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts_us"))
    out = e.withColumn("last_signup_us", F.max(sig_ts).over(w))
    return (
        out.filter(F.col("event_type") == "purchase")
        .filter(F.col("last_signup_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "last_signup_us",
            (F.col("ts_us") - F.col("last_signup_us")).alias("since_signup_us"),
        )
    )


ASOF_SQL = f"""
WITH both_types AS (
  SELECT * FROM {EVENTS_US} WHERE event_type IN ('purchase', 'signup')),
run AS (
  SELECT event_id, user_id, ts_us, event_type,
         max(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (
           PARTITION BY user_id
           ORDER BY ts_us ASC,
                    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END ASC,
                    event_id ASC
           ROWS UNBOUNDED PRECEDING) AS last_signup_us
  FROM both_types)
SELECT event_id, user_id, ts_us, last_signup_us,
       ts_us - last_signup_us AS since_signup_us
FROM run
WHERE event_type = 'purchase' AND last_signup_us IS NOT NULL
"""


# --- range join -------------------------------------------------------------
_BANDS = [
    ("budget", 900.0, 930.0),
    ("mid", 930.0, 960.0),
    ("premium", 960.0, 985.0),
    ("lux", 985.0, 1000.1),
]


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join — broadcast the tiny band dimension so the
    fact side never shuffles."""
    p = load(spark, sf_dir, "part")
    bands = local_df(spark, _BANDS, "band string, lo double, hi double")
    j = p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    )
    return j.groupBy("band").agg(
        cnt("n_parts"), dsum("p_retailprice", "total_price")
    )


_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)
RANGE_JOIN_SQL = f"""
SELECT band, {cnt_sql('n_parts')}, {dsum_sql('p_retailprice', 'total_price')}
FROM part
JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --- embedding-cosine near-dup ----------------------------------------------
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, generated the
    100 TB way: banded sign-LSH bucket equi-join candidates + exact
    cosine verify (`operators.similarity.cosine_dedup_pairs`) — never an
    all-pairs BroadcastNestedLoopJoin. The DuckDB oracle stays the
    brute-force form, so the driver's hash-match doubles as a recall
    check of the bucketed path ((16 bands × 2 planes) ⇒ per-pair miss
    probability ~1.6e-4 at cosine exactly 0.45; verified 0 misses at
    sf0.001/0.01/0.1)."""
    from deltacat_spark.operators.similarity import cosine_dedup_pairs

    e = load(spark, sf_dir, "embeddings", spread=True).filter(F.col("vec_id") < 500)
    return cosine_dedup_pairs(
        e, threshold=0.45, n_bands=16, band_planes=2
    )


EMB_DEDUP_SQL = """
WITH v AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings WHERE vec_id < 500)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (a.nrm * b.nrm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                    p -> p[1]::DOUBLE * p[2]::DOUBLE))
            / (a.nrm * b.nrm), 6) >= 0.45
"""


def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup clusters: bucketed-cosine near-dup pairs →
    connected components, each vector labeled with its cluster
    representative (min vec_id reachable through the ≥-threshold
    graph) — the SemDeDup-style keep-one-per-cluster pipeline, with
    pair generation on the sign-LSH scale path (never all-pairs)."""
    from deltacat_spark.operators.dedupe import connected_components
    from deltacat_spark.operators.similarity import cosine_dedup_pairs

    e = load(spark, sf_dir, "embeddings", spread=True).filter(F.col("vec_id") < 500)
    pairs = cosine_dedup_pairs(e, threshold=0.45, n_bands=16, band_planes=2)
    return connected_components(pairs, a_col="id_a", b_col="id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


EMB_CLUSTERS_SQL = """
WITH RECURSIVE v AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings WHERE vec_id < 500),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                      p -> p[1]::DOUBLE * p[2]::DOUBLE))
              / (a.nrm * b.nrm), 6) >= 0.45),
edges AS (
  SELECT id_a AS u, id_b AS w FROM pairs
  UNION
  SELECT id_b AS u, id_a AS w FROM pairs),
walk(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u)
SELECT u AS vec_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM walk GROUP BY u
"""


QUERIES = {
    "tumbling_window_events": (tumbling_window_events, TUMBLING_SQL),
    "sliding_window_events": (sliding_window_events, SLIDING_SQL),
    "session_window_events": (session_window_events, SESSION_SQL),
    "asof_join_purchase_signup": (asof_join_purchase_signup, ASOF_SQL),
    "range_join_price_bands": (range_join_price_bands, RANGE_JOIN_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, EMB_DEDUP_SQL),
    "embedding_dedup_clusters": (embedding_dedup_clusters, EMB_CLUSTERS_SQL),
}
