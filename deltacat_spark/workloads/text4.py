"""Round-7 curation operators: Gopher-style rule filtering and
DSIR-style hashed importance weighting.

Both are standard large-corpus curation stages (Rae et al. 2021 "Gopher"
quality heuristics; Xie et al. 2023 "DSIR" importance resampling) that
the reference has no analogue for — part of the repo's first-class
LLM-pipeline surface. Both are single-pass, built-in-function plans:
nothing shuffles wider than (doc_id, bucket), and the only broadcast
structures are vocabulary-bucket-sized (≤4096 rows), independent of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import load, md5_prefix_int, md5_prefix_int_sql


# --- Gopher-style quality rules ---------------------------------------------
# Thresholds follow the published heuristics where the synthetic corpus
# can express them (word-count window, mean-word-length window,
# stopword presence); the stopword list is the corpus's actual closed
# class ({'the','a'} — same set `text_quality` uses).
_MIN_WORDS, _MAX_WORDS = 30, 100_000
_MIN_MWL, _MAX_MWL = 3_000, 10_000  # permille


def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule evaluation: integer-permille metrics +
    one boolean per rule + the conjunction. All metrics are integers
    (permille via integer division) so the result hashes identically on
    any engine — no float ratios cross the comparison boundary."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    out = d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_alpha_chars"),
        F.size(F.filter(words, lambda w: w.isin("the", "a"))).alias("n_stop"),
    ).select(
        "doc_id",
        "n_words",
        F.expr("1000 * n_alpha_chars div n_words").alias("mwl_permille"),
        F.expr("1000 * n_stop div n_words").alias("stop_permille"),
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS).alias("r_word_count"),
        F.expr(
            f"1000 * n_alpha_chars div n_words BETWEEN {_MIN_MWL} AND {_MAX_MWL}"
        ).alias("r_mean_word_len"),
        (F.col("n_stop") >= 1).alias("r_stopwords"),
    )
    return out.withColumn(
        "gopher_pass",
        F.col("r_word_count") & F.col("r_mean_word_len") & F.col("r_stopwords"),
    )


GOPHER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha_chars,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
  FROM documents)
SELECT doc_id, n_words,
       1000 * n_alpha_chars // n_words AS mwl_permille,
       1000 * n_stop // n_words AS stop_permille,
       n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS} AS r_word_count,
       1000 * n_alpha_chars // n_words
         BETWEEN {_MIN_MWL} AND {_MAX_MWL} AS r_mean_word_len,
       n_stop >= 1 AS r_stopwords,
       (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS})
         AND (1000 * n_alpha_chars // n_words
              BETWEEN {_MIN_MWL} AND {_MAX_MWL})
         AND n_stop >= 1 AS gopher_pass
FROM m
"""


# --- DSIR-style hashed importance weights -----------------------------------
_DSIR_BUCKETS = 4096


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weight of every document toward a TARGET domain
    (here: the ``lang = 'en'`` slice), DSIR-style: unigram features
    hashed into {_DSIR_BUCKETS} buckets, per-bucket add-one-smoothed
    log-probability ratio ln(p_target/p_raw), per-doc score = Σ over
    tokens of the bucket ratio.

    Engine-exact via the `lm_quality_score` discipline: the double ln
    is evaluated ONCE PER BUCKET and floored to a 1e-6-scaled BIGINT,
    so the corpus-sized reduction is an exact integer dot product. Plan:
    one token explode → (doc_id, bucket) count aggregate (map-side
    combinable) joined against a broadcast {_DSIR_BUCKETS}-row ratio
    table — at 100 TB the broadcast stays 4096 rows."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).withColumn("bucket", md5_prefix_int(F.col("term")) % _DSIR_BUCKETS)
    tf = toks.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    raw = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("t_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_tgt"),
    )
    ratios = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1).cast("double")
                        / (F.col("t_tgt") + F.lit(_DSIR_BUCKETS)).cast("double")
                    )
                    - F.log(
                        (F.col("c_raw") + 1).cast("double")
                        / (F.col("t_raw") + F.lit(_DSIR_BUCKETS)).cast("double")
                    )
                )
                * F.lit(1_000_000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("slr"),
        )
    )
    return (
        tf.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("slr")).cast("long").alias("dsir_micro"),
        )
    )


DSIR_SQL = f"""
WITH toks0 AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents),
toks AS (
  SELECT doc_id, lang,
         {md5_prefix_int_sql("term")} % {_DSIR_BUCKETS} AS bucket
  FROM toks0),
tf AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2),
raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_raw FROM toks GROUP BY 1),
tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_tgt
        FROM toks WHERE lang = 'en' GROUP BY 1),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t_raw,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_tgt
  FROM toks),
ratios AS (
  SELECT r.bucket,
         CAST(FLOOR(
           (ln(CAST(coalesce(g.c_tgt, 0) + 1 AS DOUBLE)
               / CAST(t.t_tgt + {_DSIR_BUCKETS} AS DOUBLE))
            - ln(CAST(r.c_raw + 1 AS DOUBLE)
                 / CAST(t.t_raw + {_DSIR_BUCKETS} AS DOUBLE)))
           * 1000000 + 0.5) AS BIGINT) AS slr
  FROM raw r LEFT JOIN tgt g ON r.bucket = g.bucket, totals t)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * slr) AS BIGINT) AS dsir_micro
FROM tf JOIN ratios USING (bucket)
GROUP BY doc_id
"""


# --- BPE merge step ----------------------------------------------------------
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE tokenizer-training merge step: corpus-wide adjacent
    character-pair frequencies, top-20 merge candidates.

    The scalable formulation (what real BPE trainers do at corpus
    scale): aggregate the corpus to the WORD-FREQUENCY table first —
    one map-side-combinable shuffle, output is vocabulary-sized — then
    expand character pairs over the vocab weighted by word count. The
    pair expansion therefore touches |vocab| rows, not |corpus| tokens,
    and every later merge iteration would reuse the same vocab table.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("w")).filter(
        F.col("w") != ""
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1),"
                       " i -> substring(w, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )
    return pairs.orderBy(F.desc("n"), "pair").limit(20)


BPE_PAIR_SQL = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM words WHERE w <> '' GROUP BY w),
pairs AS (
  SELECT substr(w, i, 2) AS pair, cnt
  FROM wc, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 1)) AS i) u
  WHERE len(w) >= 2)
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
"""


# --- vocabulary coverage / OOV rate -----------------------------------------
_VOCAB_TOP = 1000


def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-1000 vocabulary — the coverage report run before freezing a
    tokenizer or choosing a vocab size.

    Scale shape: the vocab build is one map-side-combinable token
    shuffle whose OUTPUT is vocabulary-sized; the top-1000 cut
    broadcasts; the per-doc pass is then one doc-keyed aggregation with
    a broadcast hash join — no corpus-sized wide stage carries strings
    twice. Deterministic: ties at the vocab boundary break on the word
    itself."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        wc.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "w")),
        )
        .filter(F.col("rn") <= _VOCAB_TOP)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("in_vocab")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("CAST((n_oov * 1000) DIV n_tokens AS BIGINT)").alias(
                "oov_permille"
            ),
        )
        .orderBy("doc_id")
    )


OOV_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
t AS (SELECT doc_id, w FROM toks WHERE w <> ''),
wc AS (SELECT w, count(*) AS cnt FROM t GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM wc)
  WHERE rn <= {_VOCAB_TOP})
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) - count(v.w) AS BIGINT) AS n_oov,
       CAST(((count(*) - count(v.w)) * 1000) // count(*) AS BIGINT)
         AS oov_permille
FROM t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


QUERIES = {
    "gopher_quality_rules": (gopher_quality_rules, GOPHER_SQL),
    "dsir_importance": (dsir_importance, DSIR_SQL),
    "bpe_pair_counts": (bpe_pair_counts, BPE_PAIR_SQL),
    "oov_rate": (oov_rate, OOV_SQL),
}
