"""Round-6 curation operators: semi-structured extraction, C4-style
segment dedup, global budget selection, corpus comparison.

* ``json_props_rollup`` — semi-structured JSON parsing on the events
  ``props`` column (`get_json_object`, JVM-side — the "extract a field
  out of a JSON payload" step every event pipeline starts with).
* ``segment_dedup_keep_first`` — C4/CCNet-style *global first-occurrence*
  segment dedup: every repeated W-token segment is kept only at its first
  (doc_id, seg_idx) occurrence corpus-wide; each doc reports how much of
  it survived plus an md5 of the reassembled kept text. Unlike
  ``dedup_boilerplate_segments`` (which only *flags* df>=3 segments),
  this actually selects the surviving instances.
* ``token_budget_select`` — "take the best docs until the token budget
  is spent" (quality-ranked corpus trimming). The naive form is a global
  ORDER BY + running sum = one single-partition window over the corpus.
  The scalable form used here: aggregate tokens per *score value* (the
  score-level table is vocabulary-sized, not corpus-sized), compute the
  prefix sum over that tiny table, then resolve only the boundary score
  group with a score-keyed window. One key-hash shuffle + one broadcast.
* ``source_keyness`` — distinctive terms per source (corpus drift /
  comparison): over-representation ratio of each token in one source vs
  the rest, integer permille arithmetic (no libm log — same rationale as
  `term_collocations`), top-10 per source.

Reference parity: the reference has no corpus-curation layer; these are
the training-data operators the task brief requires as first-class.
Scale notes per docstring; none of them is ever doc x doc, and every
wide stage is keyed by token/segment/score — the shapes that survive a
1000-executor 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from deltacat_spark.workloads.base import EVENTS_US, load

QUERIES: dict = {}


# --- JSON props rollup -------------------------------------------------------


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` payload and roll up the extracted integer
    per event_type. `get_json_object` runs inside codegen (JVM, no UDF);
    the rollup is one event_type-keyed hash aggregation with map-side
    combine — the minimal shape for "parse + aggregate" at any scale."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.countDistinct("k").alias("k_distinct"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


JSON_PROPS_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM {EVENTS_US})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM e GROUP BY event_type ORDER BY event_type
"""

QUERIES["json_props_rollup"] = (json_props_rollup, JSON_PROPS_SQL)


# --- C4-style keep-first segment dedup --------------------------------------
# Same segment construction as dedup_boilerplate_segments (4-token
# non-overlapping windows, array-native, no UDF).
_SEG_W = 4


def segment_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global first-occurrence segment dedup with doc reassembly.

    A segment instance survives iff its (doc_id, seg_idx) is the minimum
    over all occurrences of that segment text corpus-wide. The argmin is
    a `min(struct(doc_id, seg_idx))` hash aggregation (map-side combine,
    no per-key sort window) + an equi-join back — both keyed by segment
    text, the inverted-index shuffle shape. Reassembly is a per-doc
    collect of the kept segments in position order, fingerprinted with
    md5 so the output stays scalar (driver hash-compare contract)."""
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
        .select(
            "doc_id", F.posexplode("seg_arr").alias("seg_idx", "seg_text")
        )
    )
    firsts = segs.groupBy("seg_text").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("m")
    )
    flagged = segs.join(firsts, "seg_text").select(
        "doc_id",
        "seg_idx",
        "seg_text",
        (
            (F.col("doc_id") == F.col("m.doc_id"))
            & (F.col("seg_idx") == F.col("m.seg_idx"))
        ).alias("kept"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(CASE WHEN kept"
                        " THEN struct(seg_idx, seg_text) END)),"
                        " s -> s.seg_text)"
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            F.expr("n_kept * 1000 div n_segments").alias("kept_permille"),
            "kept_md5",
        )
        .orderBy("doc_id")
    )


SEGMENT_KEEP_FIRST_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(
           list_slice(t, i * {_SEG_W} + 1, i * {_SEG_W} + {_SEG_W}), ' ')
           AS seg_text
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, (len(t) - 1) // {_SEG_W})) AS i) g),
flagged AS (
  SELECT doc_id, seg_idx, seg_text,
         row_number() OVER (PARTITION BY seg_text
                            ORDER BY doc_id, seg_idx) = 1 AS kept
  FROM segs)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1000 // COUNT(*)
            AS BIGINT) AS kept_permille,
       md5(COALESCE(string_agg(seg_text, ' ' ORDER BY seg_idx)
                    FILTER (WHERE kept), '')) AS kept_md5
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["segment_dedup_keep_first"] = (
    segment_dedup_keep_first,
    SEGMENT_KEEP_FIRST_SQL,
)


# --- global token-budget selection ------------------------------------------
_BUDGET_NUM, _BUDGET_DEN = 2, 5  # keep the best 40% of total tokens


def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the highest-quality docs (n_chars desc, doc_id tiebreak)
    until 40% of the corpus token count is spent.

    Scale shape: the oracle's global running sum would be one
    single-partition window over every doc. Here the only global-order
    structure is the *score-level* prefix table (one row per distinct
    n_chars — thousands of rows, windowed on the driver-adjacent tiny
    exchange and broadcast back), and the corpus-sized work is a single
    n_chars-keyed shuffle for the within-score cumulative sum. keep =
    cum_before_score + within_score_cum <= budget reproduces the global
    cumulative order exactly.

    Skew bound: the within-score window keys on n_chars, so a
    degenerate corpus where most docs share ONE score value turns that
    key hot (the window degrades toward the single-partition shape the
    rewrite avoids). Real length distributions spread across thousands
    of values; for a discrete score with few levels, pre-bucket the
    tiebreak column into the key instead."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    budget = t.agg(
        F.expr(
            f"sum(toks) * {_BUDGET_NUM} div {_BUDGET_DEN}"
        ).alias("budget")
    )
    score_lvl = t.groupBy("n_chars").agg(F.sum("toks").alias("gt"))
    w_lvl = (
        Window.orderBy(F.desc("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = score_lvl.select(
        "n_chars",
        F.coalesce(F.sum("gt").over(w_lvl), F.lit(0)).alias("cum_before"),
    )
    w_in = (
        Window.partitionBy("n_chars")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.withColumn("gcum", F.sum("toks").over(w_in))
        .join(F.broadcast(cum_before), "n_chars")
        .crossJoin(F.broadcast(budget))
        .select(
            "doc_id",
            "toks",
            ((F.col("cum_before") + F.col("gcum")) <= F.col("budget")).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )


TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
b AS (SELECT CAST(SUM(toks) * {_BUDGET_NUM} // {_BUDGET_DEN} AS BIGINT)
        AS budget FROM t),
c AS (
  SELECT doc_id, toks,
         SUM(toks) OVER (ORDER BY n_chars DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id, toks, (cum <= budget) AS keep
FROM c, b ORDER BY doc_id
"""

QUERIES["token_budget_select"] = (token_budget_select, TOKEN_BUDGET_SQL)


# --- per-source keyness (corpus comparison) ---------------------------------
_KEY_MIN_COUNT = 5
_KEY_TOP = 10


def source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most over-represented tokens per source vs the rest of the
    corpus. Keyness is the integer permille ratio
    ``a*B*1000 div ((b+1)*A)`` (a/b = token count in/out of the source,
    A/B = total tokens in/out; +1 Laplace smoothing) — all-integer, so
    both engines agree bit-for-bit (no libm log, same design as
    `term_collocations`). Everything after the one token-keyed explode
    aggregation is vocabulary-sized; the per-source top-k window runs
    over (source, token) count rows, not the corpus. At extreme corpus
    sizes (a*B near 2^63) switch the ratio to DECIMAL — noted, not
    needed below ~1e14 tokens."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("a"))
    totals = st.groupBy("source").agg(F.sum("a").alias("A_tot"))
    gtok = st.groupBy("token").agg(F.sum("a").alias("g"))
    gtotal = totals.agg(F.sum("A_tot").alias("G_tot"))
    scored = (
        st.filter(F.col("a") >= _KEY_MIN_COUNT)
        .join(F.broadcast(totals), "source")
        .join(gtok, "token")
        .crossJoin(F.broadcast(gtotal))
        .select(
            "source",
            "token",
            "a",
            (F.col("g") - F.col("a")).alias("b"),
            F.expr(
                "a * (G_tot - A_tot) * 1000 div ((g - a + 1) * A_tot)"
            ).alias("keyness"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("keyness"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KEY_TOP)
        .select("source", "rank", "token", "a", "b", "keyness")
        .orderBy("source", "rank")
    )


SOURCE_KEYNESS_SQL = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS a
  FROM tok WHERE token <> '' GROUP BY source, token),
totals AS (SELECT source, SUM(a) AS A_tot FROM st GROUP BY source),
gtok AS (SELECT token, SUM(a) AS g FROM st GROUP BY token),
gt AS (SELECT SUM(A_tot) AS G_tot FROM totals),
scored AS (
  SELECT s.source, s.token, s.a, CAST(k.g - s.a AS BIGINT) AS b,
         CAST(s.a * (gt.G_tot - t.A_tot) * 1000
              // ((k.g - s.a + 1) * t.A_tot) AS BIGINT) AS keyness
  FROM st s
  JOIN totals t USING (source)
  JOIN gtok k USING (token)
  CROSS JOIN gt
  WHERE s.a >= {_KEY_MIN_COUNT}),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
                       ORDER BY keyness DESC, token) AS INT) AS rank
  FROM scored)
SELECT source, rank, token, a, b, keyness
FROM ranked WHERE rank <= {_KEY_TOP} ORDER BY source, rank
"""

QUERIES["source_keyness"] = (source_keyness, SOURCE_KEYNESS_SQL)
