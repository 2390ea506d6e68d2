"""Round-5 corpus/time-series operators.

* ``dup_ngram_fraction`` — cross-document duplicated-8-gram fraction per
  doc (the RefinedWeb/Gopher-style "fraction of chars in duplicated
  n-grams" filter, shingle-level): one explode + one shingle-df
  aggregation + one per-doc rollup; never doc×doc.
* ``events_sessionize`` — batch gap-based sessionization (30-min gap)
  with per-session stats; the batch twin of the streaming
  ``session_window_events``.
* ``events_rolling_daily`` — per-user daily totals + 7-row rolling sums
  (scaled-long arithmetic, order-independent).
* ``embedding_class_centroids`` — per-label per-dimension centroid (the
  class-center step of semantic dedup / nearest-class-mean
  classification), expressed as one posexplode + integer-exact mean.
* ``doc_length_deciles`` — ntile decile profile of document lengths.

All scale notes: each query is a constant number of hash aggregations /
window functions over key-partitioned shuffles — no driver-side data
paths, no UDFs, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from deltacat_spark.workloads.base import (
    EVENTS_US,
    SUM_SCALE,
    cnt,
    cnt_sql,
    dsum,
    dsum_sql,
    load,
)

# --- duplicated-ngram fraction ---------------------------------------------
_NG = 8  # shingle width (tokens)
_DUP_KEEP_MAX = 0.3


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: how much of it is 8-gram-identical to OTHER docs.

    distinct shingles per doc → document frequency per shingle → the
    fraction of a doc's distinct shingles that occur in ≥2 docs, plus
    the curation keep flag. The shingle-df aggregation is the only wide
    stage and is keyed by shingle hash — at 100 TB it shuffles tokens
    once, identically to the inverted-index build."""
    d = load(spark, sf_dir, "documents", spread=True)
    tk = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(tk) - F.lit(_NG - 1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, _NG)),
        )
    )
    # Only shingle EQUALITY matters downstream — hash the 8-gram strings
    # to 64-bit ints inside the explode projection, so both wide stages
    # (the df aggregation and the join back) move 8-byte keys instead of
    # ~50-byte strings (collision odds ~n²/2^64 are noise next to the
    # shingle model; same rewrite as the dedup family's int64 keys).
    hashed = F.array_distinct(
        F.transform(shingles, lambda s: F.xxhash64(s))
    )
    ds = d.select("doc_id", F.explode(hashed).alias("h"))
    # join back only the df>=2 TAIL (typically a small fraction of the
    # vocabulary): docs count their total shingles in the same keyed
    # aggregation, so non-dup shingles never carry a df column around.
    dup_h = (
        ds.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        ds.join(dup_h, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("is_dup").alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias("dup_frac"),
            (
                F.round(F.col("n_dup") / F.col("n_shingles"), 6)
                <= F.lit(_DUP_KEEP_MAX)
            ).alias("keep"),
        )
    )


DUP_NGRAM_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
s AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(1, len(tk) - {_NG - 1})),
    i -> array_to_string(tk[i:i+{_NG - 1}], ' ')))) AS sh
  FROM t),
dfc AS (SELECT sh, count(*) AS df FROM s GROUP BY sh),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM s JOIN dfc USING (sh) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_dup,
  ROUND(CAST(n_dup AS DOUBLE) / n_shingles, 6) AS dup_frac,
  ROUND(CAST(n_dup AS DOUBLE) / n_shingles, 6) <= {_DUP_KEEP_MAX} AS keep
FROM agg
"""


# --- batch sessionization ---------------------------------------------------
_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: a new session starts when a user is idle for
    more than 30 minutes. Per-session row: ordinal, size, duration.
    One window pass partitioned by user + one aggregation — both keyed
    by user_id, so the shuffle is a single user-hash exchange."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > F.lit(_GAP_US), 1
        )
        .otherwise(0)
        .alias("new_sess"),
    ).withColumn(
        "sess",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("user_id", "sess")
        .agg(
            cnt("n_events"),
            ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_sec"),
        )
        .select("user_id", F.col("sess").alias("session_seq"), "n_events", "duration_sec")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts_us, event_id,
    CASE WHEN ts_us - LAG(ts_us) OVER w > {_GAP_US} THEN 1 ELSE 0 END
      AS new_sess
  FROM {EVENTS_US}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
sess AS (
  SELECT user_id, ts_us,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM flagged)
SELECT user_id, CAST(sess AS BIGINT) AS session_seq, {cnt_sql('n_events')},
  CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS duration_sec
FROM sess GROUP BY user_id, sess
"""


# --- rolling daily totals ---------------------------------------------------
_DAY_US = 86_400 * 1_000_000


def events_rolling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value totals + 7-row rolling sum/count — the
    feature-engineering resample before any behavioral model. Daily
    totals use the scaled-long trick so both engines agree bit-for-bit;
    the rolling frame is ROWS-based over present days (deterministic
    under the (user, day) total order)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.expr(f"ts_us div {_DAY_US}").alias("day"),
            F.col("value"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum(F.floor(F.col("value") * SUM_SCALE + F.lit(0.5)).cast("long")).alias(
                "sval"
            )
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        F.round(F.col("sval") / F.lit(float(SUM_SCALE)), 2).alias("day_value"),
        F.round(F.sum("sval").over(w) / F.lit(float(SUM_SCALE)), 2).alias(
            "roll7_value"
        ),
        F.count(F.lit(1)).over(w).alias("roll7_days"),
    )


ROLLING_SQL = f"""
WITH daily AS (
  SELECT user_id, ts_us // {_DAY_US} AS day,
    SUM(CAST(FLOOR(value * {SUM_SCALE} + 0.5) AS BIGINT)) AS sval
  FROM {EVENTS_US} GROUP BY user_id, ts_us // {_DAY_US})
SELECT user_id, day,
  ROUND(sval / CAST({SUM_SCALE} AS DOUBLE), 2) AS day_value,
  ROUND(SUM(sval) OVER w / CAST({SUM_SCALE} AS DOUBLE), 2) AS roll7_value,
  CAST(COUNT(*) OVER w AS BIGINT) AS roll7_days
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --- per-class embedding centroids ------------------------------------------
def embedding_class_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (label, dimension) centroid coordinate — the class-center
    computation behind nearest-class-mean classifiers and semantic-dedup
    cluster seeding. posexplode keeps it one narrow explode + one
    (label, dim)-keyed aggregation; float→scaled-long keeps the mean
    order-independent."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("x").cast("double") * SUM_SCALE + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sx"),
        )
        .select(
            "label",
            (F.col("dim") + 1).alias("dim"),  # 1-based, matches DuckDB
            "n",
            F.round(F.col("sx") / F.lit(float(SUM_SCALE)) / F.col("n"), 6).alias(
                "centroid"
            ),
        )
    )


CENTROID_SQL = f"""
WITH ex AS (
  SELECT label, u.dim AS dim, u.x AS x
  FROM embeddings,
    LATERAL (SELECT unnest(embedding) AS x,
                    generate_subscripts(embedding, 1) AS dim) u)
SELECT label, CAST(dim AS INT) AS dim, {cnt_sql('n')},
  ROUND(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * {SUM_SCALE} + 0.5) AS BIGINT))
        / CAST({SUM_SCALE} AS DOUBLE) / COUNT(*), 6) AS centroid
FROM ex GROUP BY label, dim
"""


# --- length deciles ---------------------------------------------------------
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profile of document lengths (ntile over a total order):
    per decile, doc count and length min/max/total — the shape audit
    before choosing packing window sizes."""
    d = load(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        d.select("doc_id", "n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            cnt("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("decile")
    )


DECILES_SQL = """
WITH t AS (
  SELECT doc_id, n_chars,
    ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM t GROUP BY decile ORDER BY decile
"""


QUERIES = {
    "dup_ngram_fraction": (dup_ngram_fraction, DUP_NGRAM_SQL),
    "events_sessionize": (events_sessionize, SESSIONIZE_SQL),
    "events_rolling_daily": (events_rolling_daily, ROLLING_SQL),
    "embedding_class_centroids": (embedding_class_centroids, CENTROID_SQL),
    "doc_length_deciles": (doc_length_deciles, DECILES_SQL),
}


# --- collocations (PMI ratio) ------------------------------------------------
_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


def term_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-bigram collocations by pointwise-mutual-information
    RATIO — ``P(ab) / (P(a)·P(b)) = c_ab·T² / (B·c_a·c_b)`` — over the
    corpus. The ratio is monotone in PMI, and as a quotient of exact
    small integers it is bit-identical on both engines (no ``ln``,
    whose last-ulp libm differences could flip a rounded value).
    Two token-keyed aggregations + one broadcastable unigram join;
    min-count 5 bounds the candidate set before the join."""
    d = load(spark, sf_dir, "documents", spread=True)
    tk = F.split(F.col("text"), " ")
    toks = d.select(F.explode(tk).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("t"))
    bigrams = d.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.lit(1), F.size(tk) - F.lit(1))
                ),
                lambda i: F.struct(
                    F.element_at(tk, i).alias("a"),
                    F.element_at(tk, i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    big = (
        bigrams.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    btot = bigrams.agg(F.count(F.lit(1)).alias("bt"))
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    return (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                (F.col("c_ab") * F.col("t") * F.col("t"))
                / (F.col("bt") * F.col("c_a") * F.col("c_b")),
                6,
            ).alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), "a", "b")
        .limit(_PMI_TOPK)
    )


COLLOCATIONS_SQL = f"""
WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
toks AS (SELECT unnest(tk) AS w FROM t),
uni AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM toks),
bigrams AS (
  SELECT tk[i] AS a, tk[i+1] AS b
  FROM t, LATERAL unnest(generate_series(1, greatest(1, len(tk) - 1))) u(i)),
big AS (
  SELECT a, b, count(*) AS c_ab FROM bigrams GROUP BY a, b
  HAVING count(*) >= {_PMI_MIN_COUNT}),
btot AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bigrams)
SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
  ROUND((c_ab * tt * tt) / (bt * ua.c * ub.c), 6) AS pmi_ratio
FROM big
JOIN uni ua ON big.a = ua.w
JOIN uni ub ON big.b = ub.w
CROSS JOIN tot CROSS JOIN btot
ORDER BY pmi_ratio DESC, a, b
LIMIT {_PMI_TOPK}
"""

QUERIES["term_collocations"] = (term_collocations, COLLOCATIONS_SQL)


# --- boilerplate segment dedup ----------------------------------------------
# RefinedWeb-style LINE-level dedup re-expressed for a corpus without
# newlines: a "line" is a fixed-width token segment (W tokens, stride W).
# A segment text seen in >= _BOILER_DF distinct documents is boilerplate
# (navigation chrome / repeated headers in real crawls). One
# segment-keyed wide aggregation — identical scale shape to the
# inverted-index build; never doc x doc.
_SEG_W = 4
_BOILER_DF = 3


def dedup_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate profile: total W-token segments, segment
    instances whose text appears in >= 3 distinct docs, and the exact
    permille. Segments are built array-native (sequence + slice +
    array_join — no explode until segments exist, no UDF)."""
    d = load(spark, sf_dir, "documents", spread=True)
    segs = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, (size(t) - 1) div {_SEG_W}),"
                f" i -> array_join(slice(t, i * {_SEG_W} + 1, {_SEG_W}), ' '))"
            ).alias("seg_arr"),
        )
        .select("doc_id", F.explode("seg_arr").alias("seg_text"))
    )
    # Join only the FLAGGED subset back (segments with df >= threshold),
    # not the full distinct-segment table: at 100 TB the latter is
    # corpus-sized, the former is just the boilerplate tail.
    boiler = (
        segs.groupBy("seg_text")
        .agg(F.countDistinct("doc_id").alias("seg_df"))
        .filter(F.col("seg_df") >= _BOILER_DF)
        .select("seg_text", F.lit(1).alias("is_boiler"))
    )
    flagged = segs.join(boiler, "seg_text", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(
                F.when(F.col("is_boiler") == 1, F.lit(1)).otherwise(0)
            ).cast("long").alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_boilerplate",
            F.expr("n_boilerplate * 1000 div n_segments").alias(
                "boiler_permille"
            ),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
segs AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i * {_SEG_W} + 1, i * {_SEG_W} + {_SEG_W}), ' ') AS seg_text
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, (len(t) - 1) // {_SEG_W})) AS i) g),
dfc AS (
  SELECT seg_text, count(DISTINCT doc_id) AS seg_df FROM segs GROUP BY seg_text)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN d.seg_df >= {_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate,
       CAST(SUM(CASE WHEN d.seg_df >= {_BOILER_DF} THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS boiler_permille
FROM segs s LEFT JOIN dfc d USING (seg_text)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""

QUERIES["dedup_boilerplate_segments"] = (
    dedup_boilerplate_segments,
    BOILERPLATE_SQL,
)
